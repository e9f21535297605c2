from macrobase_spark.index.codec import (  # noqa: F401
    delta_varint_encode,
    delta_varint_decode,
    varint_encode,
    varint_decode,
)
from macrobase_spark.index.build import (build_index, delete_docs,  # noqa: F401
                                         merge_indexes, read_index,
                                         suggest_stopwords)
from macrobase_spark.index.bm25 import (bm25_topk, bm25_oracle,  # noqa: F401
                                        bm25_facets, bm25_explain,
                                        more_like_this, bm25_topk_sharded,
                                        bm25_phrase_topk,
                                        bm25_phrase_topk_batch,
                                        bm25_count, bm25_match_ids,
                                        hybrid_topk,
                                        bm25_facets_sharded)
from macrobase_spark.index.snippets import highlight_topk, index_stats  # noqa: F401
from macrobase_spark.index.suggest import spellcheck, suggest_terms  # noqa: F401
from macrobase_spark.index.rank_eval import rank_eval  # noqa: F401
