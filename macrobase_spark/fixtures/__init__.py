from macrobase_spark.fixtures.transcripts import synth_transcripts  # noqa: F401
from macrobase_spark.fixtures.sample import synth_sample  # noqa: F401
