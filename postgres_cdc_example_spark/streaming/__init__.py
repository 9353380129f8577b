from postgres_cdc_example_spark.streaming.monitor import (
    ProgressListener,
    replication_lag_seconds,
    sync_check,
)
from postgres_cdc_example_spark.streaming.pipeline import CdcPipeline
from postgres_cdc_example_spark.streaming.state import VersionedStateStore

__all__ = [
    "CdcPipeline",
    "ProgressListener",
    "VersionedStateStore",
    "replication_lag_seconds",
    "sync_check",
]
