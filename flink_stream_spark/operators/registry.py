"""Global query registry.

Every implemented operator registers a named query: a Spark builder
``(spark, sf_dir) -> DataFrame`` plus the equivalent ANSI SQL the
DuckDB oracle runs over the same parquet tables. ``oracle=None``
marks genuinely non-SQL-expressible operators (driver records a
weaker rows-only check).

Determinism contract (SURVEY §2C): aliased output columns matching
between both sides, exact arithmetic (decimal) under unordered
partial aggregation, timestamps rendered at ms precision or coarser.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    group: str = ""
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, group: str = "", doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        prev = REGISTRY.get(name)
        # refuse silent shadowing: a second module registering the same
        # name would invisibly replace the first query everywhere (the
        # driver gate, bench, docs). Re-registering the SAME function
        # (module re-executed under a different import path) is fine —
        # identified by source file + qualname, NOT __module__, which
        # differs across import paths for the same file.
        if prev is not None and (
            prev.build.__code__.co_filename != fn.__code__.co_filename
            or prev.build.__qualname__ != fn.__qualname__
        ):
            raise ValueError(
                f"query name {name!r} already registered by "
                f"{prev.build.__module__}.{prev.build.__qualname__}; "
                f"refusing to overwrite with {fn.__module__}.{fn.__qualname__}"
            )
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, group=group, doc=doc)
        return fn

    return deco
