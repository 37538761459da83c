from sparkcheck.run.scheduler import CircularDependencyError, topo_sort
from sparkcheck.run.engine import (
    RuleOutcome,
    ValidationEngine,
    ValidationReport,
)
from sparkcheck.run.checkpoint import (
    CheckpointStore,
    GroupResult,
    checkpointed_validate,
    merge_group_outcomes,
)

__all__ = [
    "topo_sort",
    "CircularDependencyError",
    "ValidationEngine",
    "ValidationReport",
    "RuleOutcome",
    "CheckpointStore",
    "GroupResult",
    "checkpointed_validate",
    "merge_group_outcomes",
]
