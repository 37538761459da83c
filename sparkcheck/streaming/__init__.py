from sparkcheck.streaming.stateful import streaming_dedup
from sparkcheck.streaming.incremental import (
    streaming_rule_counts,
    validate_stream,
)

__all__ = ["streaming_rule_counts", "validate_stream", "streaming_dedup"]
