from flink_stream_spark.cdc.envelope import (
    debezium_envelope_schema,
    parse_envelopes,
    last_per_key,
    OP_COL,
)

__all__ = ["debezium_envelope_schema", "parse_envelopes", "last_per_key", "OP_COL"]
