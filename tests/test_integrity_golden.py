"""Golden fixtures #3/#5 (FIXTURES.md) — uniqueness + referential
integrity with planted violations at exact positions."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck.compile import summary_df
from sparkcheck.integrity import (
    duplicate_key_counts,
    duplicate_violation_rows,
    orphan_rows,
    orphan_summary,
    uniqueness_summary,
)
from sparkcheck.rules import NullCheckRule


def test_emails_streaming_golden(spark):
    # FIXTURES §3: 250 emails, NULL when i % 60 == 0 (i in 0..249)
    # ⇒ exactly 5 not_null failures; max violating 1-based row = 241.
    rows = [(i + 1, None if i % 60 == 0 else f"user{i}@example.com") for i in range(250)]
    df = spark.createDataFrame(rows, "id int, email string")
    s = summary_df(df, [NullCheckRule(name="email_not_null", column="email")]).collect()[0]
    assert s["total_rows"] == 250
    assert s["violations"] == 5
    viol_ids = [r["id"] for r in df.where(F.col("email").isNull()).collect()]
    assert max(viol_ids) == 241


def test_uniqueness_with_planted_duplicates(spark):
    # customers with a duplicated customer_id (FIXTURES §5)
    rows = [(i, f"c{i}@x.com") for i in range(100)] + [(7, "dup@x.com"), (7, "dup2@x.com")]
    df = spark.createDataFrame(rows, "customer_id int, email string")
    s = uniqueness_summary(df, ["customer_id"], approx=False).collect()[0]
    assert s["total_keys"] == 102
    assert s["distinct_keys"] == 100
    assert s["duplicate_excess"] == 2  # COUNT − COUNT DISTINCT

    dups = duplicate_key_counts(df, ["customer_id"]).collect()
    assert len(dups) == 1 and dups[0]["customer_id"] == 7 and dups[0]["dup_count"] == 3

    # keep=False semantics: ALL 3 copies flagged
    vrows = duplicate_violation_rows(df, ["customer_id"], extra_cols=["email"]).collect()
    assert len(vrows) == 3
    assert all(r["customer_id"] == 7 for r in vrows)


def test_uniqueness_nulls_exempt(spark):
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (2,)], "k int"
    )
    s = uniqueness_summary(df, ["k"], approx=False).collect()[0]
    assert s["total_keys"] == 2 and s["duplicate_excess"] == 0
    assert duplicate_key_counts(df, ["k"]).count() == 0


def test_salted_two_phase_matches_plain(spark):
    rows = [(i % 10, i) for i in range(1000)]  # every key duplicated 100×
    df = spark.createDataFrame(rows, "k int, v int")
    plain = {r["k"]: r["dup_count"] for r in duplicate_key_counts(df, ["k"]).collect()}
    salted = {r["k"]: r["dup_count"] for r in duplicate_key_counts(df, ["k"], salted=True).collect()}
    assert plain == salted and plain[0] == 100


def test_referential_integrity_orphans(spark):
    customers = spark.createDataFrame([(i,) for i in range(50)], "c_id int")
    orders = spark.createDataFrame(
        [(100 + i, i % 60) for i in range(120)] + [(999, None)],
        "o_id int, c_id int",
    )
    # FKs 50..59 have no parent: i%60 in 50..59 occurs for i=50..59 and 110..119 ⇒ 20 orphans
    got = orphan_rows(orders, "c_id", customers, "c_id", broadcast_parent=True)
    assert got.count() == 20
    s = orphan_summary(orders, "c_id", customers, "c_id").collect()[0]
    assert s["orphan_count"] == 20 and s["distinct_orphan_keys"] == 10
    # NULL FK is not an orphan (reference: WHERE c.fk IS NOT NULL)
    assert got.where(F.col("c_id").isNull()).count() == 0


def test_orphan_broadcast_plan(spark):
    customers = spark.createDataFrame([(i,) for i in range(50)], "c_id int")
    orders = spark.createDataFrame([(i, i % 60) for i in range(120)], "o_id int, c_id int")
    plan = orphan_rows(orders, "c_id", customers, "c_id", broadcast_parent=True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_distinct_count_by_key_salted_parity(spark):
    from sparkcheck.integrity import distinct_count_by_key
    from pyspark.sql import functions as F

    # skewed: key 'hot' holds half the rows; urls unique per row except
    # planted repeats so ndv < count
    df = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))).alias("k"),
        (F.col("id") % 900).cast("string").alias("v"),
    )
    plain = {r["k"]: r["ndv"] for r in distinct_count_by_key(df, "k", "v").collect()}
    salted = {r["k"]: r["ndv"] for r in
              distinct_count_by_key(df, "k", "v", salted=True, salt_buckets=16).collect()}
    assert plain == salted
    assert plain["hot"] == 900
