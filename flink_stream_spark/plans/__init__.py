from flink_stream_spark.plans.scale import bucketize_table, salted_join, explain_str, with_global_rank

__all__ = ["bucketize_table", "salted_join", "explain_str", "with_global_rank"]
