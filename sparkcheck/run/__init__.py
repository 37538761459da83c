from sparkcheck.run.scheduler import CircularDependencyError, topo_sort
from sparkcheck.run.engine import (
    RuleOutcome,
    ValidationEngine,
    ValidationReport,
    split_rules,
)
from sparkcheck.run.retry import run_with_timeout, with_retry
from sparkcheck.run.analyze import (
    Insight,
    analyze_report,
    degrading_rules,
    explain_str,
    failure_patterns,
    flaky_rules,
    plan_smells,
    slow_rules,
)
from sparkcheck.run.orchestrate import OrchestrationResult, run_rulesets
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
    "split_rules",
    "CheckpointStore",
    "GroupResult",
    "checkpointed_validate",
    "OrchestrationResult",
    "run_rulesets",
    "merge_group_outcomes",
    "with_retry",
    "run_with_timeout",
    "Insight",
    "analyze_report",
    "degrading_rules",
    "explain_str",
    "failure_patterns",
    "flaky_rules",
    "plan_smells",
    "slow_rules",
]
