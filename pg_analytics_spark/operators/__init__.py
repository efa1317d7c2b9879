"""DataFrame-level operators for large-scale training-data pipelines.

Additive scope beyond the reference (which executes only SQL relational
operators via DuckDB): deduplication families, embedding similarity
search, multimodal column plumbing.  Every operator is DataFrame-in /
DataFrame-out and designed for the 1000-executor case — equi-join LSH
candidates instead of cross products, broadcast for small query sides,
no driver-side loops.
"""

from pg_analytics_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from pg_analytics_spark.operators.similarity import (
    brute_force_topk,
    lsh_ann_topk,
)

__all__ = [
    "brute_force_topk",
    "embedding_neardup_pairs",
    "exact_dedup",
    "lsh_ann_topk",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
]
