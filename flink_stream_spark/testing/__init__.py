from flink_stream_spark.testing.oracle import compare_query, run_duckdb, canonical_hash

__all__ = ["compare_query", "run_duckdb", "canonical_hash"]
