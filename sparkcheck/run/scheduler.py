"""Driver-side rule-dependency scheduler.

The one piece of the reference's orchestration worth keeping as-is
conceptually: dependency-graph construction + topological sort with
cycle detection (business_rules/engine.py:699-747) and circular-
dependency validation (config_loader.py:355-380). Everything else the
reference schedules (thread pools, batching, retries) is superseded by
Spark's own job scheduling — rules over one table are FUSED into one
aggregate pass anyway (sparkcheck.compile.fused_agg), so the scheduler
only orders cross-rule dependencies and applies severity gating.
"""

from __future__ import annotations

from typing import Sequence

from sparkcheck.rules.models import Rule


class CircularDependencyError(ValueError):
    pass


def topo_sort(rules: Sequence[Rule]) -> list[Rule]:
    """Kahn's algorithm over depends_on edges; deterministic (name-sorted)
    within each level. Unknown dependencies are ignored (the reference
    logs and continues). Raises CircularDependencyError on a cycle."""
    by_name = {r.name: r for r in rules}
    indeg = {r.name: 0 for r in rules}
    dependents: dict[str, list[str]] = {r.name: [] for r in rules}
    for r in rules:
        for dep in r.depends_on:
            if dep in by_name:
                indeg[r.name] += 1
                dependents[dep].append(r.name)

    ready = sorted(n for n, d in indeg.items() if d == 0)
    out: list[Rule] = []
    while ready:
        n = ready.pop(0)
        out.append(by_name[n])
        newly = []
        for m in dependents[n]:
            indeg[m] -= 1
            if indeg[m] == 0:
                newly.append(m)
        ready = sorted(ready + newly)
    if len(out) != len(rules):
        stuck = sorted(set(by_name) - {r.name for r in out})
        raise CircularDependencyError(f"circular rule dependencies among: {stuck}")
    return out
