"""Column-level function library for the LLM-data-pipeline operators.

All functions return pyspark Column expressions built from JVM-side
built-ins (whole-stage-codegen friendly; no Python UDFs in the hot
path).  The reference has no user-function surface at all
(SURVEY §2.2 'absent' note) — this package is additive scope.
"""

from pg_analytics_spark.functions.hashing import (
    band_hashes,
    minhash_signature,
    simhash64,
)
from pg_analytics_spark.functions.text import (
    char_shingles,
    fingerprint,
    lang_scores,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from pg_analytics_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "band_hashes",
    "char_shingles",
    "cosine_similarity",
    "dot_product",
    "fingerprint",
    "l2_norm",
    "lang_scores",
    "minhash_signature",
    "punct_ratio",
    "quality_score",
    "simhash64",
    "stopword_ratio",
    "token_count",
    "tokens",
]
