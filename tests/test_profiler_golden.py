"""Golden fixture #2 (FIXTURES.md §2) — the reference profiler streaming
test (reference tests/modules/profiler/test_profiler_streaming.py:12-62):
1200 rows, every 100th category NULL ⇒ exact totals/min/max/null counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck.profile import histogram, profile_table, top_k, pattern_match_rates


def numbers_df(spark):
    rows = [
        (i, i, None if i % 100 == 0 else ("even" if i % 2 == 0 else "odd"))
        for i in range(1200)
    ]
    return spark.createDataFrame(rows, "id int, value int, category string")


def test_profile_golden_expectations(spark):
    p = profile_table(numbers_df(spark), "numbers", approx_distinct=False)
    assert p.total_rows == 1200
    v = p.columns["value"]
    assert v.min_value == 0 and v.max_value == 1199
    assert v.null_count == 0
    assert len(v.histogram) > 0
    assert sum(b["count"] for b in v.histogram) == 1200
    c = p.columns["category"]
    assert c.null_count == 12
    assert abs(c.null_percentage - 12 / 1200 * 100) < 1e-12
    assert c.distinct_count == 2
    # mean of 0..1199 = 599.5; pandas-style SAMPLE stddev
    assert abs(v.mean - 599.5) < 1e-9
    assert abs(v.stddev - 346.5545) < 1e-3


def test_histogram_clamps_max_into_last_bin(spark):
    df = spark.createDataFrame([(float(i),) for i in range(11)], "v double")
    rows = histogram(df, "v", bins=10, lo=0.0, hi=10.0).collect()
    buckets = {r["bucket"]: r["bucket_count"] for r in rows}
    # v=10 (the max) lands in bucket 9, not a phantom bucket 10
    assert buckets[9] == 2 and sum(buckets.values()) == 11
    assert max(buckets) == 9


def test_top_k_deterministic_ties(spark):
    df = numbers_df(spark)
    rows = top_k(df, "category", k=2).collect()
    # i % 100 == 0 rows (12 of them) are all even ⇒ even 588, odd 600
    assert [(r["value"], r["value_count"]) for r in rows] == [("odd", 600), ("even", 588)]


def test_pattern_detection(spark):
    rows = [(f"user{i}@example.com",) for i in range(90)] + [("not-an-email",)] * 10
    df = spark.createDataFrame(rows, "email string")
    p = profile_table(df, "t", approx_distinct=False)
    pats = {d["pattern"]: d["confidence"] for d in p.columns["email"].patterns}
    assert "email" in pats and abs(pats["email"] - 0.9) < 1e-12
    rates = {r["pattern"]: r["match_rate"] for r in pattern_match_rates(df, "email").collect()}
    assert abs(rates["email"] - 0.9) < 1e-12
    assert rates["uuid"] == 0.0
