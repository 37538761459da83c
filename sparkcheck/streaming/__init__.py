from sparkcheck.streaming.stateful import streaming_dedup
from sparkcheck.streaming.incremental import (
    streaming_rule_counts,
    subscribe_changes,
    validate_stream,
)

__all__ = ["streaming_rule_counts", "subscribe_changes", "validate_stream",
           "streaming_dedup"]
