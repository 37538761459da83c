"""Drift: PSI/KS statistics and baseline-profile comparison."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkcheck.drift import (
    compare_profiles,
    ks_from_binned,
    ks_statistic,
    psi,
    psi_from_counts,
)
from sparkcheck.profile import profile_table


def test_psi_identical_distributions_is_zero():
    assert psi_from_counts([10, 20, 30], [100, 200, 300]) == pytest.approx(0.0, abs=1e-12)


def test_psi_known_value():
    # hand-computed: e=[.5,.5], a=[.9,.1] → (.9-.5)ln(.9/.5)+(.1-.5)ln(.1/.5)
    expected = 0.4 * math.log(0.9 / 0.5) + (-0.4) * math.log(0.1 / 0.5)
    assert psi_from_counts([5, 5], [9, 1]) == pytest.approx(expected, rel=1e-12)


def test_ks_known_value():
    # CDFs: e = [.5, 1.0], a = [.9, 1.0] → max gap .4
    assert ks_from_binned([5, 5], [9, 1]) == pytest.approx(0.4, rel=1e-12)


def test_spark_psi_ks_detect_planted_shift(spark):
    # slice 0: uniform 0..99; slice 1: uniform 50..149 (clear shift)
    rows = [(0, float(i % 100)) for i in range(2000)] + [
        (1, float(50 + i % 100)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "s int, v double")
    p = psi(df, "v", F.col("s"), bins=10, lo=0.0, hi=150.0)
    k = ks_statistic(df, "v", F.col("s"), bins=10, lo=0.0, hi=150.0)
    assert p > 0.25  # major shift
    assert 0.3 < k <= 0.5

    # same distribution in both slices → no drift
    same = spark.createDataFrame(
        [(i % 2, float(i % 100)) for i in range(4000)], "s int, v double"
    )
    assert psi(same, "v", F.col("s"), bins=10, lo=0.0, hi=100.0) < 0.01
    assert ks_statistic(same, "v", F.col("s"), bins=10, lo=0.0, hi=100.0) < 0.02


def test_compare_profiles_flags_null_drift(spark):
    base = spark.createDataFrame([(i, "x") for i in range(100)], "id int, c string")
    # 20% nulls now (Δ null% = 20 > 5 threshold)
    cur = spark.createDataFrame(
        [(i, None if i % 5 == 0 else "x") for i in range(100)], "id int, c string"
    )
    pb = profile_table(base, "t", approx_distinct=False, with_histograms=False, with_top_k=False)
    pc = profile_table(cur, "t", approx_distinct=False, with_histograms=False, with_top_k=False)
    d = compare_profiles(pb, pc)
    assert "c" in d.drifted_columns
    assert d.column_changes["c"]["null_pct_delta"] == pytest.approx(20.0)
    assert d.has_drift and d.stability_score < 1.0


def test_compare_profiles_schema_changes(spark):
    base = spark.createDataFrame([(1, "x")], "id int, old_col string")
    cur = spark.createDataFrame([(1, 2.0)], "id int, new_col double")
    pb = profile_table(base, "t", approx_distinct=False, with_histograms=False, with_top_k=False)
    pc = profile_table(cur, "t", approx_distinct=False, with_histograms=False, with_top_k=False)
    d = compare_profiles(pb, pc)
    assert d.added_columns == ["new_col"]
    assert d.removed_columns == ["old_col"]


def test_psi_against_stored_baseline_detects_shift(spark):
    """The north-rule drift path: baseline profile with stored bin edges;
    current table re-binned on THOSE edges; PSI flags the shift."""
    from pyspark.sql import functions as F
    from sparkcheck.drift import compare_profiles
    from sparkcheck.profile import profile_table

    base = spark.range(5000).select((F.col("id") % 100).cast("double").alias("v"))
    shifted = spark.range(5000).select(
        ((F.col("id") % 100) * 0.3 + 65).cast("double").alias("v")
    )
    b = profile_table(base, table_name="t")
    bounds = {"v": (b.columns["v"].histogram_lo, b.columns["v"].histogram_hi)}
    cur = profile_table(shifted, table_name="t", histogram_bounds=bounds)
    delta = compare_profiles(b, cur)
    assert "psi" in delta.column_changes["v"]
    assert delta.column_changes["v"]["psi"] > 0.25  # major shift
    assert "v" in delta.drifted_columns

    # same data re-binned on same edges ⇒ zero PSI, no drift
    cur_same = profile_table(base, table_name="t", histogram_bounds=bounds)
    d2 = compare_profiles(b, cur_same)
    assert d2.column_changes.get("v", {}).get("psi", 0.0) < 1e-9
    assert not d2.has_drift


def test_psi_skipped_when_edges_misaligned(spark):
    from pyspark.sql import functions as F
    from sparkcheck.drift import compare_profiles
    from sparkcheck.profile import profile_table

    base = spark.range(1000).select((F.col("id") % 50).cast("double").alias("v"))
    other = spark.range(1000).select((F.col("id") % 200).cast("double").alias("v"))
    b = profile_table(base, table_name="t")
    cur = profile_table(other, table_name="t")  # own edges — misaligned
    delta = compare_profiles(b, cur)
    assert "psi" not in delta.column_changes.get("v", {})


def test_ks_from_quantiles(spark):
    """Sketch-native KS: agrees with the exact KS for a known shift and
    is ~0 for identical distributions."""
    import pyspark.sql.functions as F

    from sparkcheck.drift import ks_from_quantiles

    probs = [i / 100 for i in range(101)]
    base = spark.range(10_000).select((F.col("id") % 1000).cast("double").alias("v"))
    shifted = base.select((F.col("v") + 500.0).alias("v"))  # uniform shifted by 500

    def quantiles(df):
        return df.agg(F.percentile_approx("v", probs, 10_000).alias("q")).collect()[0]["q"]

    qb = quantiles(base)
    same = ks_from_quantiles(qb, quantiles(base))
    assert same < 0.02
    # uniform[0,1000) vs uniform[500,1500): exact KS = 0.5
    d = ks_from_quantiles(qb, quantiles(shifted))
    assert abs(d - 0.5) < 0.05, d
    with pytest.raises(ValueError):
        ks_from_quantiles([1.0], [1.0, 2.0])


def test_orc_source_roundtrip(spark, tmp_path):
    from sparkcheck.io import read_table

    path = str(tmp_path / "orc_tbl")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.orc(path)
    df = read_table(spark, path, fmt="orc")
    assert df.count() == 100 and set(df.columns) == {"id", "v"}


# ---------------------------------------------------------------------------
# chi-square categorical drift

def test_chi2_pvalue_matches_published_critical_values():
    from sparkcheck.drift import chi2_pvalue

    # (statistic, dof) -> upper-tail p from standard chi-square tables
    assert abs(chi2_pvalue(3.84146, 1) - 0.05) < 1e-4
    assert abs(chi2_pvalue(9.21034, 2) - 0.01) < 1e-4
    assert abs(chi2_pvalue(18.30704, 10) - 0.05) < 1e-4
    assert chi2_pvalue(0.0, 5) == 1.0
    assert chi2_pvalue(1000.0, 2) < 1e-12


def test_chi2_drift_detects_shift_and_passes_identical(spark):
    from pyspark.sql import functions as F
    from sparkcheck.drift import chi2_drift

    # identical categorical distributions -> no drift
    same = spark.range(20000).select(
        (F.col("id") % 2).alias("slice"),
        F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("cat"),
    )
    r = chi2_drift(same, "cat", F.col("slice"))
    assert not r["drifted"] and r["dof"] == 4 and r["p_value"] > 0.9

    # shifted: slice 1 concentrates mass on one category
    shifted = spark.range(20000).select(
        (F.col("id") % 2).alias("slice"),
        F.when((F.col("id") % 2 == 1) & (F.col("id") % 10 < 5), F.lit("c0"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 5).cast("string")))
        .alias("cat"),
    )
    r2 = chi2_drift(shifted, "cat", F.col("slice"))
    assert r2["drifted"] and r2["p_value"] < 1e-6


def test_chi2_drift_tail_pooling(spark):
    """Beyond max_categories, the tail pools into <other> so a high-
    cardinality column cannot flood the driver."""
    from pyspark.sql import functions as F
    from sparkcheck.drift import chi2_drift

    df = spark.range(10000).select(
        (F.col("id") % 2).alias("slice"),
        F.col("id").cast("string").alias("cat"),  # all-distinct ids
    )
    r = chi2_drift(df, "cat", F.col("slice"), max_categories=50)
    assert r["n_categories"] == 51  # 50 + <other>


def test_chi2_drift_null_slice_rows_excluded(spark):
    from pyspark.sql import functions as F
    from sparkcheck.drift import chi2_drift

    df = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, None).otherwise((F.col("id") % 2)).alias("s"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
    )
    r = chi2_drift(df, "cat", F.col("s"))  # must not raise on None labels
    assert r["n_categories"] == 3


def test_compare_profiles_chi2_categorical(spark):
    """compare_profiles gains chi-square over stored top-k counts:
    a real categorical shift flags (chi2_flag via p AND Cramer's V);
    identical profiles don't."""
    from pyspark.sql import functions as F
    from sparkcheck.drift import compare_profiles
    from sparkcheck.profile import profile_table

    base_df = spark.range(4000).select(
        F.concat(F.lit("c"), (F.col("id") % 4).cast("string")).alias("cat"))
    # shifted: 70% of rows collapse to c0
    cur_df = spark.range(4000).select(
        F.when(F.col("id") % 10 < 7, F.lit("c0"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 4).cast("string")))
        .alias("cat"))
    b = profile_table(base_df, "t")
    delta_same = compare_profiles(b, profile_table(base_df, "t"))
    assert "cat" not in delta_same.drifted_columns
    assert delta_same.column_changes.get("cat", {}).get("chi2", 0.0) == 0.0

    delta = compare_profiles(b, profile_table(cur_df, "t"))
    ch = delta.column_changes["cat"]
    assert ch["chi2_flag"] and ch["chi2_p"] < 0.01 and ch["cramers_v"] > 0.1
    assert "cat" in delta.drifted_columns


def test_compare_profiles_chi2_ignores_topk_rank_churn():
    """Categories present in only ONE side's top-k have unknown (not
    zero) counts on the other side — they must pool into <other>, not
    fabricate drift from rank churn at the top-k boundary."""
    from sparkcheck.drift import compare_profiles
    from sparkcheck.profile.models import ColumnStatistics, TableProfile

    def prof(values):
        return TableProfile(table="t", total_rows=100_000, columns={
            "cat": ColumnStatistics(
                name="cat", data_type="string", total_count=100_000,
                null_count=0, non_null_count=100_000,
                top_values=[{"value": v, "count": c} for v, c in values],
            )})

    # 12 near-equal categories; top-10 membership churns by noise
    base = prof([(f"c{i}", 8340 + (3 if i < 10 else 0)) for i in range(10)])
    cur = prof([(f"c{i}", 8340) for i in [0, 1, 2, 3, 4, 5, 6, 7, 10, 11]])
    delta = compare_profiles(base, cur)
    ch = delta.column_changes.get("cat", {})
    assert not ch.get("chi2_flag")
    assert "cat" not in delta.drifted_columns


def test_comparison_page_side_by_side():
    """VERDICT r3 #3 done-criterion: the comparison page renders BOTH
    profiles' charts per column (same y-scale) with drift chips — DRIFT
    for a drifted column, ok for an undrifted one — plus the summary
    table. Pure driver-side: profiles constructed directly."""
    from sparkcheck.drift import compare_profiles
    from sparkcheck.io.html_report import render_comparison_html
    from sparkcheck.profile.models import ColumnStatistics, TableProfile

    def col(name, hist=None, top=None, total=1000):
        cs = ColumnStatistics(
            name=name, data_type="double" if hist else "string",
            total_count=total, non_null_count=total, null_count=0,
            distinct_count=100,
        )
        if hist is not None:
            cs.histogram = [{"bucket": b, "count": n} for b, n in enumerate(hist)]
            cs.histogram_lo, cs.histogram_hi = 0.0, 10.0
        if top is not None:
            cs.top_values = [{"value": v, "count": n} for v, n in top]
        return cs

    baseline = TableProfile(table="t", total_rows=1000, columns={
        "score": col("score", hist=[100] * 10),
        "flat": col("flat", hist=[50, 150, 300, 150, 50, 100, 100, 50, 25, 25]),
        "lang": col("lang", top=[("en", 700), ("de", 200), ("fr", 100)]),
    })
    current = TableProfile(table="t", total_rows=1000, columns={
        "score": col("score", hist=[10] * 9 + [910]),   # hard shift → PSI flag
        "flat": col("flat", hist=[50, 150, 300, 150, 50, 100, 100, 50, 25, 25]),
        "lang": col("lang", top=[("en", 700), ("de", 200), ("fr", 100)]),
    })
    delta = compare_profiles(baseline, current)
    assert "score" in delta.drifted_columns and "flat" not in delta.drifted_columns

    doc = render_comparison_html(baseline, current, delta)
    # three side-by-side figures, each with a baseline and a current pane
    assert doc.count('class="cmp"') == 3
    assert doc.count(">baseline</p>") == 3 and doc.count(">current</p>") == 3
    # both numeric columns render bars on both sides: 4 charts × 10 bins
    assert doc.count('class="hbar"') == 40
    # categorical column renders top-k bars on both sides
    assert doc.count('class="kbar"') == 6
    # drift chips: DRIFT for score, ok for flat, PSI values shown
    assert '<span class="chip fail">DRIFT</span>' in doc
    assert '<span class="chip pass">ok</span>' in doc
    assert "PSI " in doc and "KS " in doc
    # summary table included
    assert "Profile comparison (baseline vs current)" in doc
    # delta=None path computes the same verdicts from the profiles
    doc2 = render_comparison_html(baseline.to_dict(), current.to_dict())
    assert '<span class="chip fail">DRIFT</span>' in doc2


def test_comparison_page_pooled_topk_and_filter():
    """VERDICT r4 #4+#5: a category that churns out of the top-k between
    profiles must NOT render as a missing bar — both charts show the
    chi-square statistic's category set (intersection + a pooled
    '<other>' residual), so the visual and the chip agree; and the page
    carries the zero-dependency inline filter (data-col/data-flag
    attributes + the filter bar + script)."""
    from sparkcheck.drift import compare_profiles
    from sparkcheck.io.html_report import render_comparison_html
    from sparkcheck.profile.models import ColumnStatistics, TableProfile

    def col(top, total=1000):
        return ColumnStatistics(
            name="lang", data_type="string", total_count=total,
            non_null_count=total, null_count=0, distinct_count=10,
            top_values=[{"value": v, "count": n} for v, n in top],
        )

    baseline = TableProfile(table="t", total_rows=1000, columns={
        "lang": col([("en", 600), ("de", 250), ("fr", 150)]),
    })
    # fr drops out of the top-k, it enters — rank churn at the boundary
    current = TableProfile(table="t", total_rows=1000, columns={
        "lang": col([("en", 600), ("de", 250), ("it", 150)]),
    })
    delta = compare_profiles(baseline, current)
    doc = render_comparison_html(baseline, current, delta)
    # intersection {en, de} + one pooled residual bar per side = 3 + 3
    assert doc.count('class="kbar"') == 6
    assert "&lt;other&gt;" in doc and "&lt;other&gt;: 150" in doc
    assert "tail pooled" in doc
    # fr/it never render as one-sided bars
    assert ">fr<" not in doc and ">it<" not in doc
    # interactive filter plumbing: attributes, bar, script, self-contained
    assert 'data-col="lang"' in doc and 'data-flag=' in doc
    assert 'id="colfilter"' in doc and 'id="flagonly"' in doc
    assert "<script>" in doc and "http" not in doc.split("</style>")[1]

    # >9 shared categories must NOT be truncated (review finding: the
    # chart's category set must stay identical to the statistic's — a
    # drift driven by the 12th-ranked shared category must be visible)
    many = [(f"c{i:02d}", 100 - i) for i in range(12)]
    b12 = TableProfile(table="t", total_rows=1200, columns={"lang": col(many)})
    c12 = TableProfile(table="t", total_rows=1200, columns={"lang": col(many)})
    doc12 = render_comparison_html(b12, c12, compare_profiles(b12, c12))
    # all 12 shared categories render on both sides (+ residual bars)
    for i in range(12):
        assert f">c{i:02d}<" in doc12
    assert doc12.count('class="kbar"') >= 24
