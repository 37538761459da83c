"""Profile merging — incremental profiling of a growing corpus.

The reference merges chunk results in-driver
(field_validator/__init__.py:276-298, profiler streaming accumulation).
The Spark analog: profile each NEW partition batch as it lands (cheap,
pruned scan) and MERGE into the running corpus profile, instead of
re-profiling 10^12 rows per cycle.

Mergeability is explicit, not assumed:
- counts / null counts / min / max / mean (weighted) / variance
  (pooled via sufficient statistics) / histograms (same edges) /
  top-values (count-sum approximation) merge exactly or near-exactly;
- distinct_count and quartiles DO NOT merge from finished numbers —
  they need the underlying sketches (HLL registers / GK summaries),
  which finished profiles don't carry — so the merged profile sets them
  to None rather than inventing a wrong value. A production deployment
  that needs mergeable ndv keeps the HLL sketch column per batch
  (Spark's hll_sketch_agg/hll_union in 3.5+).
"""

from __future__ import annotations

from sparkcheck.profile.models import ColumnStatistics, TableProfile


def _merge_col(a: ColumnStatistics, b: ColumnStatistics) -> ColumnStatistics:
    n_a, n_b = a.non_null_count, b.non_null_count
    n = n_a + n_b

    mean = None
    if a.mean is not None and b.mean is not None and n:
        mean = (a.mean * n_a + b.mean * n_b) / n

    stddev = None
    if (a.stddev is not None and b.stddev is not None and mean is not None
            and n_a >= 2 and n_b >= 2):
        # pooled sample variance via sufficient statistics
        m2 = (a.stddev ** 2) * (n_a - 1) + (b.stddev ** 2) * (n_b - 1)
        m2 += n_a * (a.mean - mean) ** 2 + n_b * (b.mean - mean) ** 2
        stddev = (m2 / (n - 1)) ** 0.5 if n > 1 else None

    def _mn(x, y):
        if x is None:
            return y
        if y is None:
            return x
        return min(x, y)

    def _mx(x, y):
        if x is None:
            return y
        if y is None:
            return x
        return max(x, y)

    hist = []
    lo = hi = None
    if (a.histogram and b.histogram and a.histogram_lo == b.histogram_lo
            and a.histogram_hi == b.histogram_hi
            and len(a.histogram) == len(b.histogram)):
        hist = [
            {"bucket": ha["bucket"], "count": ha["count"] + hb["count"]}
            for ha, hb in zip(a.histogram, b.histogram)
        ]
        lo, hi = a.histogram_lo, a.histogram_hi

    tv: dict = {}
    for rec in [*a.top_values, *b.top_values]:
        tv[rec["value"]] = tv.get(rec["value"], 0) + rec["count"]
    top_values = [
        {"value": v, "count": c}
        for v, c in sorted(tv.items(), key=lambda kv: (-kv[1], str(kv[0])))[:10]
    ]

    return ColumnStatistics(
        name=a.name,
        data_type=a.data_type,
        total_count=a.total_count + b.total_count,
        null_count=a.null_count + b.null_count,
        non_null_count=n,
        distinct_count=None,     # not mergeable without the HLL sketch
        min_value=_mn(a.min_value, b.min_value),
        max_value=_mx(a.max_value, b.max_value),
        mean=mean,
        stddev=stddev,
        quartiles=None,          # not mergeable without the GK summary
        min_length=_mn(a.min_length, b.min_length),
        max_length=_mx(a.max_length, b.max_length),
        histogram=hist,
        histogram_lo=lo,
        histogram_hi=hi,
        top_values=top_values,
    )


def merge_profiles(a: TableProfile, b: TableProfile) -> TableProfile:
    """Merge two batch profiles of the SAME table schema."""
    cols = {}
    for c in a.columns:
        cols[c] = _merge_col(a.columns[c], b.columns[c]) if c in b.columns else a.columns[c]
    for c in b.columns:
        cols.setdefault(c, b.columns[c])
    return TableProfile(
        table=a.table,
        total_rows=a.total_rows + b.total_rows,
        columns=cols,
    )
