"""Distribution-drift statistics: PSI and KS over fixed bins.

The reference has NO KS/PSI implementation (verified — no scipy.stats in
sqltest/); its drift detection is Δ-threshold profile comparison
(profiler/analyzer.py:370-443). The north star requires KS/PSI, so they
are additive, built on the reference's own primitives: the equi-width
histogram (db/base.py:467-531 semantics) and quantile sketches.

Scale design: both statistics reduce a 10^12-row column to ONE pass that
computes per-bin counts for the two slices simultaneously (a groupBy on
(slice, bucket) — bounded output: 2 × bins rows), then O(bins) driver
arithmetic. Never a sort, never a full-data collect. The same math is
expressible as pure SQL (see __spark_entry__ oracles) so it is
DuckDB-checkable.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Laplace-style floor for empty bins so PSI's log stays finite — the
# standard practice; applied identically in the SQL oracle.
EPS = 1e-6


def histogram_fractions(
    df: DataFrame,
    column: str,
    slice_col: Column,
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Per-(slice, bucket) row fractions over FIXED [lo, hi) bins with the
    reference's last-bin clamp. ``slice_col`` is any expression labeling
    the two (or more) populations — e.g. baseline vs current, or a
    year(ts) slice. One scan, one small shuffle (≤ slices × bins rows)."""
    col = F.col(column).cast("double")
    width = (hi - lo) / float(bins)
    bucket = F.least(F.floor((col - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)).cast("int")
    counts = (
        df.where(col.isNotNull())
        .select(slice_col.alias("slice"), bucket.alias("bucket"))
        .groupBy("slice", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # per-slice totals via a window over the tiny (slices × bins) frame —
    # a join against a re-aggregation would rescan the input table
    from pyspark.sql import Window

    w = Window.partitionBy("slice")
    return counts.select(
        "slice", "bucket", (F.col("n") / F.sum("n").over(w)).alias("frac")
    )


def psi_from_counts(expected: Sequence[float], actual: Sequence[float]) -> float:
    """PSI = Σ (aᵢ − eᵢ)·ln(aᵢ/eᵢ) over aligned bin fractions.
    Inputs are raw counts or fractions; normalized here. Empty bins are
    floored at EPS. Rule of thumb: <0.1 stable, 0.1-0.25 moderate, >0.25
    major shift."""
    te, ta = sum(expected), sum(actual)
    if te <= 0 or ta <= 0:
        raise ValueError("empty distribution")
    out = 0.0
    for e, a in zip(expected, actual):
        pe = max(e / te, EPS)
        pa = max(a / ta, EPS)
        out += (pa - pe) * math.log(pa / pe)
    return out


def ks_from_binned(expected: Sequence[float], actual: Sequence[float]) -> float:
    """KS statistic from aligned bin counts: max |CDF_e − CDF_a|.
    Binned approximation (exact KS needs the full sort — O(n log n)
    shuffle at 10^12 rows; the binned version is the scale path and its
    error is bounded by the bin width)."""
    te, ta = sum(expected), sum(actual)
    if te <= 0 or ta <= 0:
        raise ValueError("empty distribution")
    ce = ca = 0.0
    best = 0.0
    for e, a in zip(expected, actual):
        ce += e / te
        ca += a / ta
        best = max(best, abs(ce - ca))
    return best


def ks_from_quantiles(
    q_baseline: Sequence[float], q_current: Sequence[float]
) -> float:
    """KS statistic from two EQUAL-LENGTH quantile vectors (e.g. 101
    percentiles from percentile_approx) — the sketch-native drift path
    when no shared histogram edges exist (histograms need a fixed [lo,hi]
    from the baseline; quantile vectors are edge-free).

    D = max_x |F_b(x) − F_c(x)| evaluated at the union of both engines'
    quantile points by inverse lookup: F(v) for a vector of m quantiles
    is approximated as rank/(m−1) of the last quantile ≤ v. Error is
    bounded by the quantile grid spacing (1/(m−1)) plus sketch error."""
    import bisect

    qb, qc = sorted(q_baseline), sorted(q_current)
    if len(qb) < 2 or len(qc) < 2:
        raise ValueError("need at least 2 quantiles per side")

    def cdf(q: list[float], v: float) -> float:
        # fraction of the distribution ≤ v according to the quantile grid
        return min(bisect.bisect_right(q, v) / (len(q) - 1), 1.0)

    best = 0.0
    for v in qb + qc:
        best = max(best, abs(cdf(qb, v) - cdf(qc, v)))
    return min(best, 1.0)


def _aligned_counts(
    df: DataFrame, column: str, slice_col: Column, bins: int, lo: float, hi: float
) -> tuple[list[float], list[float]]:
    """Collect per-bin counts for exactly two slice labels (sorted order)."""
    col = F.col(column).cast("double")
    width = (hi - lo) / float(bins)
    bucket = F.least(F.floor((col - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)).cast("int")
    rows = (
        df.where(col.isNotNull())
        .select(slice_col.alias("slice"), bucket.alias("bucket"))
        .groupBy("slice", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    labels = sorted({r["slice"] for r in rows})
    if len(labels) != 2:
        raise ValueError(f"expected exactly 2 slices, got {labels}")
    out = {lab: [0.0] * bins for lab in labels}
    for r in rows:
        if 0 <= r["bucket"] < bins:
            out[r["slice"]][r["bucket"]] = float(r["n"])
    return out[labels[0]], out[labels[1]]


def psi(
    df: DataFrame, column: str, slice_col: Column, bins: int, lo: float, hi: float
) -> float:
    """PSI between the two populations labeled by slice_col, one pass."""
    e, a = _aligned_counts(df, column, slice_col, bins, lo, hi)
    return psi_from_counts(e, a)


def ks_statistic(
    df: DataFrame, column: str, slice_col: Column, bins: int, lo: float, hi: float
) -> float:
    """Binned KS statistic between the two populations, one pass."""
    e, a = _aligned_counts(df, column, slice_col, bins, lo, hi)
    return ks_from_binned(e, a)


# ---------------------------------------------------------------------------
# Chi-square categorical drift

def chi2_from_counts(
    expected: Sequence[float], actual: Sequence[float]
) -> tuple[float, int]:
    """Pearson chi-square homogeneity statistic between two categorical
    count vectors (aligned categories), plus degrees of freedom.

    Standard two-sample form: for each category with pooled total
    c_i = e_i + a_i, the expected split is proportional to the slice
    sizes; empty pooled categories contribute nothing (and drop from
    the dof). Pure driver arithmetic over ≤ |categories| values."""
    n_e, n_a = float(sum(expected)), float(sum(actual))
    if n_e <= 0 or n_a <= 0:
        raise ValueError("both slices need rows for chi-square drift")
    total = n_e + n_a
    stat, used = 0.0, 0
    for e, a in zip(expected, actual):
        pooled = e + a
        if pooled <= 0:
            continue
        used += 1
        exp_e = pooled * n_e / total
        exp_a = pooled * n_a / total
        stat += (e - exp_e) ** 2 / exp_e + (a - exp_a) ** 2 / exp_a
    return stat, max(used - 1, 0)


def chi2_pvalue(stat: float, dof: int) -> float:
    """Upper-tail chi-square p-value via the regularized incomplete
    gamma Q(dof/2, stat/2) — series/continued-fraction evaluation
    (Numerical Recipes 6.2 construction from the published formulas),
    so no scipy dependency. Accurate to ~1e-10 for dof ≤ 10^4."""
    if dof <= 0:
        return 1.0
    x, s = stat / 2.0, dof / 2.0
    if x <= 0:
        return 1.0
    if x < s + 1.0:  # series for P(s, x), return 1 - P
        term = 1.0 / s
        total = term
        k = s
        for _ in range(10_000):
            k += 1.0
            term *= x / k
            total += term
            if abs(term) < abs(total) * 1e-14:
                break
        p = total * math.exp(-x + s * math.log(x) - math.lgamma(s))
        return max(0.0, min(1.0, 1.0 - p))
    # continued fraction for Q(s, x) (Lentz's method)
    tiny = 1e-300
    b = x + 1.0 - s
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 10_000):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    q = h * math.exp(-x + s * math.log(x) - math.lgamma(s))
    return max(0.0, min(1.0, q))


def chi2_drift(
    df: DataFrame,
    column: str,
    slice_col: Column,
    max_categories: int = 10_000,
    alpha: float = 0.01,
) -> dict:
    """Categorical drift between two populations of ``column`` labeled
    by ``slice_col``: paired per-category counts computed in ONE
    aggregation, capped IN THE PLAN — the top ``max_categories``
    categories by pooled count come back via TakeOrdered and the long
    tail is aggregated into an '<other>' bucket executor-side, so a
    10^12-row id-like column ships at most max_categories + 1 rows to
    the driver. Chi-square + p-value are then O(categories) driver math.

    Rows with a NULL slice label or NULL category are excluded (the
    slice expression must label exactly two populations).

    Returns {statistic, dof, p_value, drifted, n_categories}."""
    labeled = (
        df.where(F.col(column).isNotNull())
        .select(slice_col.cast("string").alias("slice"), F.col(column).cast("string").alias("v"))
        .where(F.col("slice").isNotNull())
    )
    labels = [r["slice"] for r in labeled.select("slice").distinct().limit(3).collect()]
    if len(labels) != 2:
        raise ValueError(f"expected exactly 2 slice labels, got {sorted(labels)}")
    lo, hi = sorted(labels)
    paired = labeled.groupBy("v").agg(
        F.sum((F.col("slice") == lo).cast("long")).alias("e"),
        F.sum((F.col("slice") == hi).cast("long")).alias("a"),
    )
    top = paired.orderBy(F.desc(F.col("e") + F.col("a")), F.asc("v")).limit(max_categories)
    rows = top.collect()
    counts: dict[str, list[float]] = {
        r["v"]: [float(r["e"]), float(r["a"])] for r in rows
    }
    if len(rows) == max_categories:  # a tail may exist — aggregate it remotely
        rest = (
            paired.join(top.select("v"), "v", "left_anti")
            .agg(
                F.coalesce(F.sum("e"), F.lit(0)).alias("e"),
                F.coalesce(F.sum("a"), F.lit(0)).alias("a"),
            )
            .collect()[0]
        )
        if rest["e"] or rest["a"]:
            counts["<other>"] = [float(rest["e"]), float(rest["a"])]
    cats = sorted(counts, key=lambda v: (-sum(counts[v]), v))
    e = [counts[v][0] for v in cats]
    a = [counts[v][1] for v in cats]
    stat, dof = chi2_from_counts(e, a)
    p = chi2_pvalue(stat, dof)
    return {
        "statistic": round(stat, 6),
        "dof": dof,
        "p_value": round(p, 6),
        "drifted": p < alpha,
        "n_categories": len(cats),
    }
