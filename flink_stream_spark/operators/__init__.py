"""Operator library: each module contributes a registry of named
queries with (Spark builder, DuckDB oracle SQL) pairs — the §2C
contract of SURVEY.md."""

from flink_stream_spark.operators.registry import QuerySpec, REGISTRY, register

__all__ = ["QuerySpec", "REGISTRY", "register"]
