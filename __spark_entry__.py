"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``flink_stream_spark``: the operator registry
(flink_stream_spark.operators.registry) holds every implemented query
from SURVEY.md §2C with its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_stream_spark.operators import REGISTRY

# importing these modules populates REGISTRY
import flink_stream_spark.operators.relational  # noqa: F401

try:  # optional modules land incrementally; keep the contract importable
    import flink_stream_spark.operators.dedup  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.text  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.similarity  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.cdc  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.events  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.multimodal  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.misc  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.udfs  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.tpch_extra  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.tpch_more  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.pipeline  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.sampling  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.text_rank  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.quality  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.events_analytics  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.corpus_ops  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.graph  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.formats  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.warc  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.html_extract  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.pdf  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.zip_archive  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.tar_webdataset  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.avro_ocf  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.url_canon  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.xml_dump  # noqa: F401
except ImportError:
    pass
try:
    import flink_stream_spark.operators.blocklist  # noqa: F401
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = REGISTRY["q1_pricing_summary"]
    return spec.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
