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
