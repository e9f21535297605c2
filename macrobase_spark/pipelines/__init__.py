from macrobase_spark.pipelines.dedup import (  # noqa: F401
    dedup_exact,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_64,
    ngram_jaccard_pairs,
)
from macrobase_spark.pipelines.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
)
from macrobase_spark.pipelines.dedup import embedding_cosine_pairs  # noqa: F401
from macrobase_spark.pipelines.similarity import (  # noqa: F401
    ivf_build,
    ivf_query,
    ivf_topk,
    lsh_build,
    lsh_query,
)
from macrobase_spark.pipelines.runner import run_pipeline  # noqa: F401
from macrobase_spark.pipelines.decontam import (  # noqa: F401
    find_contamination, drop_contaminated)
from macrobase_spark.pipelines.sample import (  # noqa: F401
    deterministic_sample, sample_mixture, sample_n_per_domain,
    seeded_shuffle, split_train_eval)
from macrobase_spark.pipelines.pack import (  # noqa: F401
    chunk_documents, pack_sequences)
from macrobase_spark.pipelines.profile import corpus_report  # noqa: F401
