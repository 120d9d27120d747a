from horizon_etl_spark.cdc.schema import (
    CHANGE_FEED_SCHEMA,
    PAYLOAD_FIELDS,
    SOURCE_WHITELIST,
    TARGET_SCHEMA,
)

__all__ = [
    "CHANGE_FEED_SCHEMA",
    "PAYLOAD_FIELDS",
    "SOURCE_WHITELIST",
    "TARGET_SCHEMA",
]
