"""Reusable column-expression builders (the engine's function library).

Cross-engine-deterministic primitives shared by the operator modules:
md5-prefix hashing, cosine similarity, shingling. Each has a DuckDB
twin documented at its definition site so oracle SQL stays in sync.
"""

from flink_stream_spark.operators.text import _tok_hash_spark as tok_hash
from flink_stream_spark.operators.text import tok_hash_duck
from flink_stream_spark.operators.dedup import (
    _cosine_expr as cosine,
    _shingles_spark as shingles,
    shingled_docs,
    minhash_wide,
    minhash_signature_arrays,
    lsh_candidate_pairs,
)
from flink_stream_spark.operators.similarity import lsh_bucket

__all__ = [
    "tok_hash",
    "tok_hash_duck",
    "cosine",
    "shingles",
    "shingled_docs",
    "minhash_wide",
    "minhash_signature_arrays",
    "lsh_candidate_pairs",
    "lsh_bucket",
]
