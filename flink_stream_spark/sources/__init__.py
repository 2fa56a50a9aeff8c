from flink_stream_spark.sources.connectors import (
    read_batch,
    open_stream,
    kafka_available,
    avro_available,
)

__all__ = ["read_batch", "open_stream", "kafka_available", "avro_available"]
