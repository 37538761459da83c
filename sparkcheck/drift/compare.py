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

from sparkcheck.drift.stats import (
    chi2_from_counts,
    chi2_pvalue,
    ks_from_binned,
    psi_from_counts,
)
from sparkcheck.profile.models import TableProfile

DELTA_THRESHOLD_PCT = 5.0  # percentage points, analyzer.py:406-427
PSI_THRESHOLD = 0.25       # major-shift rule of thumb


def pooled_category_counts(
    baseline_counts: dict[str, float],
    current_counts: dict[str, float],
    baseline_total: float,
    current_total: float,
) -> tuple[list[str], list[float], list[float]]:
    """THE pooled category set for two-profile categorical comparison —
    single definition shared by the chi-square statistic below and the
    comparison page's charts (io/html_report.py), so the visual and the
    verdict cannot diverge.

    Categories = the INTERSECTION of the two top-k sets (a category in
    only one side's top-k has an UNKNOWN — not zero — count on the
    other side; scoring it against 0 fabricates drift from rank churn at
    the top-k boundary), ordered by pooled count descending. Each side's
    residual mass (total non-null minus its counted intersection mass,
    which includes every one-sided top-k member) is appended as a final
    '<other>' bucket when nonzero. Returns (labels, baseline_counts,
    current_counts) aligned by position."""
    cats = sorted(
        set(baseline_counts) & set(current_counts),
        key=lambda v: (-(baseline_counts[v] + current_counts[v]), v),
    )
    e = [float(baseline_counts[v]) for v in cats]
    a = [float(current_counts[v]) for v in cats]
    rest_e = max(float(baseline_total) - sum(e), 0.0)
    rest_a = max(float(current_total) - sum(a), 0.0)
    labels = list(cats)
    if rest_e or rest_a:
        labels.append("<other>")
        e.append(rest_e)
        a.append(rest_a)
    return labels, e, a


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
        # categorical drift: chi-square over the two profiles' stored
        # top-k value counts, with each side's residual (total non-null
        # minus its counted top-k mass) pooled into an '<other>' bucket
        # so the test covers the full distribution, not just the head.
        # Driver-side only; the scan work already happened in the two
        # profile passes.
        if b.top_values and n.top_values:
            bc = {str(t["value"]): float(t["count"]) for t in b.top_values}
            nc = {str(t["value"]): float(t["count"]) for t in n.top_values}
            # intersection + <other> residual semantics: see
            # pooled_category_counts (shared with the comparison charts)
            _, e, a = pooled_category_counts(
                bc, nc, float(b.non_null_count), float(n.non_null_count)
            )
            try:
                stat, dof = chi2_from_counts(e, a)
                p = chi2_pvalue(stat, dof)
                n_total = sum(e) + sum(a)
                # Cramér's V (2-sample form): significance alone is a
                # trap at profile scale — on 10^8 rows a 0.1% category
                # shift is p≈0 but operationally nothing; require a
                # real effect size before flagging.
                v = (stat / n_total) ** 0.5 if n_total > 0 else 0.0
                changes["chi2"] = round(stat, 4)
                changes["chi2_p"] = round(p, 6)
                changes["cramers_v"] = round(v, 4)
                if p < 0.01 and v > 0.1:
                    changes["chi2_flag"] = True
            except ValueError:
                pass
        if changes:
            delta.column_changes[c] = changes
        flagged = {"null_pct_delta", "unique_pct_delta", "psi_flag", "chi2_flag"}
        if flagged & set(changes):
            delta.drifted_columns.append(c)

    if common:
        delta.stability_score = 1.0 - len(delta.drifted_columns) / len(common)
    return delta
