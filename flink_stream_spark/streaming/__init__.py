from flink_stream_spark.streaming.ingest import (
    raw_json_transform,
    start_raw_json_ingest,
)
from flink_stream_spark.streaming.cdc_pipeline import start_cdc_pipeline

__all__ = ["raw_json_transform", "start_raw_json_ingest", "start_cdc_pipeline"]
