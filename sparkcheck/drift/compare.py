"""Baseline-profile comparison (drift detection).

Reference semantics (profiler/analyzer.py:370-443 + models.py:188-210):
- schema drift: added / removed columns (set algebra on column names)
- row-count delta
- per-column: Δ null% and Δ unique% — flagged when the absolute delta
  exceeds 5 percentage points (analyzer.py:406-427)
- stability score: fraction of unchanged columns

Extended (north star): when both profiles carry a histogram for a
column, PSI is computed from the stored bin counts; KS from the binned
CDFs. All driver-side arithmetic over two small TableProfile objects —
the heavy lifting already happened in the two profile passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from sparkcheck.drift.stats import ks_from_binned, psi_from_counts
from sparkcheck.profile.models import TableProfile

DELTA_THRESHOLD_PCT = 5.0  # percentage points, analyzer.py:406-427
PSI_THRESHOLD = 0.25       # major-shift rule of thumb


@dataclass
class ProfileDelta:
    table: str
    baseline_rows: int
    current_rows: int
    row_count_delta: int
    added_columns: list[str] = field(default_factory=list)
    removed_columns: list[str] = field(default_factory=list)
    column_changes: dict[str, dict[str, Any]] = field(default_factory=dict)
    drifted_columns: list[str] = field(default_factory=list)
    stability_score: float = 1.0

    @property
    def has_drift(self) -> bool:
        return bool(self.drifted_columns or self.added_columns or self.removed_columns)


def compare_profiles(baseline: TableProfile, current: TableProfile) -> ProfileDelta:
    base_cols = set(baseline.columns)
    cur_cols = set(current.columns)
    delta = ProfileDelta(
        table=current.table,
        baseline_rows=baseline.total_rows,
        current_rows=current.total_rows,
        row_count_delta=current.total_rows - baseline.total_rows,
        added_columns=sorted(cur_cols - base_cols),
        removed_columns=sorted(base_cols - cur_cols),
    )

    common = sorted(base_cols & cur_cols)
    for c in common:
        b, n = baseline.columns[c], current.columns[c]
        changes: dict[str, Any] = {}
        d_null = n.null_percentage - b.null_percentage
        if abs(d_null) > DELTA_THRESHOLD_PCT:
            changes["null_pct_delta"] = d_null
        d_uniq = n.unique_percentage - b.unique_percentage
        if abs(d_uniq) > DELTA_THRESHOLD_PCT:
            changes["unique_pct_delta"] = d_uniq
        edges_align = (
            b.histogram_lo is not None
            and b.histogram_lo == n.histogram_lo
            and b.histogram_hi == n.histogram_hi
        )
        # PSI/KS only over ALIGNED bins — profile the current table with
        # histogram_bounds from the baseline (cli.py does) or the
        # comparison is positional noise.
        if (b.histogram and n.histogram and edges_align
                and len(b.histogram) == len(n.histogram)):
            be = [h["count"] for h in b.histogram]
            ne = [h["count"] for h in n.histogram]
            try:
                changes["psi"] = psi_from_counts(be, ne)
                changes["ks"] = ks_from_binned(be, ne)
                if changes["psi"] <= PSI_THRESHOLD:
                    changes.pop("psi_flag", None)
                else:
                    changes["psi_flag"] = True
            except ValueError:
                pass
        if changes:
            delta.column_changes[c] = changes
        flagged = {"null_pct_delta", "unique_pct_delta", "psi_flag"}
        if flagged & set(changes):
            delta.drifted_columns.append(c)

    if common:
        delta.stability_score = 1.0 - len(delta.drifted_columns) / len(common)
    return delta
