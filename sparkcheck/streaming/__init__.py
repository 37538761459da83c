from sparkcheck.streaming.stateful import streaming_dedup
from sparkcheck.streaming.incremental import (
    monitor_drift_stream,
    streaming_rule_counts,
    subscribe_changes,
    validate_stream,
)

__all__ = ["monitor_drift_stream", "streaming_rule_counts", "subscribe_changes", "validate_stream",
           "streaming_dedup"]
