"""Golden fixture #1 (FIXTURES.md §1) — the reference's canonical
field-validation test (reference tests/test_field_validation.py:31-95):
4 users with planted violations; exact per-rule pass/fail counts."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sparkcheck.compile import summary_df, violation_rows, plan_time_check
from sparkcheck.rules import (
    EnumRule,
    LengthRule,
    NullCheckRule,
    RangeRule,
    RegexRule,
)
from sparkcheck.rules.models import EMAIL_PATTERN


def users_df(spark):
    rows = [
        (1, "test@example.com", 25, "Alice", "active"),
        (2, "invalid-email", 30, "Bob", "inactive"),
        (3, None, 150, "C", "ACTIVE"),
        (4, "another@test.org", -5, "Very Long Name That Exceeds Normal Length", "pending"),
    ]
    return spark.createDataFrame(rows, "id int, email string, age int, name string, status string")


RULES = [
    RegexRule(name="email_format", column="email", pattern=EMAIL_PATTERN),
    NullCheckRule(name="email_not_null", column="email"),
    RangeRule(name="age_range", column="age", min_value=0, max_value=120),
    LengthRule(name="name_length", column="name", min_length=2, max_length=20),
    EnumRule(
        name="status_enum", column="status",
        allowed_values=("active", "inactive", "suspended", "deleted"),
    ),
]


def test_summary_matches_reference_matrix(spark):
    df = users_df(spark)
    s = {r["rule_id"]: r.asDict() for r in summary_df(df, RULES).collect()}

    # email regex: row 2 fails; row 3 NULL skipped ⇒ evaluated 3
    assert s["email_format"]["evaluated"] == 3
    assert s["email_format"]["violations"] == 1
    # null check evaluates all 4 rows; row 3 fails
    assert s["email_not_null"]["evaluated"] == 4
    assert s["email_not_null"]["violations"] == 1
    # age range [0,120]: rows 3 (150) and 4 (−5) fail
    assert s["age_range"]["violations"] == 2
    # name length [2,20]: row 3 ("C") and row 4 (42 chars) fail
    assert s["name_length"]["violations"] == 2
    # enum case-sensitive: row 3 "ACTIVE" and row 4 "pending" fail
    assert s["status_enum"]["violations"] == 2
    assert all(r["total_rows"] == 4 for r in s.values())


def test_violation_rows_lineage(spark):
    df = users_df(spark)
    rows = violation_rows(df, RULES, key_cols=["id"]).collect()
    by_id = {r["id"]: set(r["failed_rules"]) for r in rows}
    assert 1 not in by_id  # row 1 is clean
    assert by_id[2] == {"email_format"}
    assert by_id[3] == {"email_not_null", "age_range", "name_length", "status_enum"}
    assert by_id[4] == {"age_range", "name_length", "status_enum"}
    assert all(r["partition_id"] is not None for r in rows)


def test_case_insensitive_enum(spark):
    df = users_df(spark)
    rule = EnumRule(
        name="status_ci", column="status", case_sensitive=False,
        allowed_values=("active", "inactive", "suspended", "deleted"),
    )
    s = summary_df(df, [rule]).collect()[0]
    assert s["violations"] == 1  # only 'pending' now fails


def test_regex_is_left_anchored_not_full_match(spark):
    # reference uses re.match: anchored at start, NOT at end
    df = spark.createDataFrame([("abc123",), ("xabc",), (None,)], "v string")
    rule = RegexRule(name="r", column="v", pattern="abc")
    s = summary_df(df, [rule]).collect()[0]
    assert s["evaluated"] == 2  # NULL skipped
    assert s["violations"] == 1  # 'xabc' fails (no match at start); 'abc123' passes


def test_range_non_numeric_is_violation(spark):
    # validator.py:249-260 — a non-numeric value is a violation, not a skip
    df = spark.createDataFrame([("5",), ("abc",), (None,)], "v string")
    rule = RangeRule(name="r", column="v", min_value=0, max_value=10)
    s = summary_df(df, [rule]).collect()[0]
    assert s["evaluated"] == 2
    assert s["violations"] == 1  # 'abc'


def test_empty_table_summary_is_zero_not_null(spark):
    df = spark.createDataFrame([], "v int")
    s = summary_df(df, [NullCheckRule(name="nn", column="v")]).collect()[0]
    assert s["evaluated"] == 0 and s["violations"] == 0 and s["total_rows"] == 0


def test_rule_name_with_quote_is_escaped(spark):
    df = spark.createDataFrame([(1,)], "v int")
    s = summary_df(df, [NullCheckRule(name="bad'name", column="v")]).collect()[0]
    assert s["rule_id"] == "bad'name"


def test_missing_column_guard(spark):
    df = users_df(spark)
    rules = RULES + [NullCheckRule(name="ghost", column="no_such_col")]
    ok, missing = plan_time_check(df, rules)
    assert [r.name for r in missing] == ["ghost"]
    assert len(ok) == len(RULES)


def test_partition_verdicts_sum_to_global(spark):
    """Per-partition verdicts partition the global counts exactly, and a
    clean partition reads passed=True even when another fails."""
    from pyspark.sql import functions as F
    from sparkcheck.compile import partition_verdicts, summary_df
    from sparkcheck.rules import NullCheckRule, RangeRule

    df = spark.range(0, 1000, 1, 4).select(
        F.when(F.col("id") % 250 == 0, None).otherwise(F.col("id")).alias("v")
    )
    rules = [NullCheckRule(name="nn", column="v"),
             RangeRule(name="rg", column="v", min_value=0, max_value=2000)]
    pv = partition_verdicts(df, rules).collect()
    assert {r["partition_id"] for r in pv} == {0, 1, 2, 3}
    glob = {r["rule_id"]: r for r in summary_df(df, rules).collect()}
    for rid in ("nn", "rg"):
        per = [r for r in pv if r["rule_id"] == rid]
        assert sum(r["evaluated"] for r in per) == glob[rid]["evaluated"]
        assert sum(r["violations"] for r in per) == glob[rid]["violations"]
    # every 250th id null → one violation in each partition for nn
    nn = {r["partition_id"]: r for r in pv if r["rule_id"] == "nn"}
    assert all(not r["passed"] for r in nn.values())
    rg = {r["partition_id"]: r for r in pv if r["rule_id"] == "rg"}
    assert all(r["passed"] for r in rg.values())


def test_verdicts_and_sink_single_scan_matches_two_pass(spark, tmp_path):
    """verdicts_and_sink must return the same verdict rows and write the
    same violation rows as the separate two-scan computation, from one
    cached pass."""
    import pyspark.sql.functions as F

    from sparkcheck.compile import partition_verdicts, verdicts_and_sink, violation_rows
    from sparkcheck.rules import NullCheckRule, RangeRule

    df = spark.range(0, 1000, 1, 4).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id")).alias("v"),
    ).persist()
    df.count()
    rules = [NullCheckRule(name="nn_v", column="v"),
             RangeRule(name="rg_v", column="v", min_value=0, max_value=900)]
    sink = str(tmp_path / "sink")
    verdicts = verdicts_and_sink(df, rules, key_cols=["id"], sink_path=sink)

    expected_v = partition_verdicts(df, rules).collect()
    key = lambda r: (r["partition_id"], r["rule_id"])  # noqa: E731
    assert sorted([tuple(r) for r in verdicts]) == sorted([tuple(r) for r in expected_v])
    assert sum(r["violations"] for r in verdicts) == 10 + 99  # nulls + >900

    got = {(r["id"], tuple(r["failed_rules"])) for r in spark.read.parquet(sink).collect()}
    want = {(r["id"], tuple(r["failed_rules"]))
            for r in violation_rows(df, rules, key_cols=["id"]).collect()}
    assert got == want and len(got) == 109
    df.unpersist()


def test_verdicts_and_sink_with_cache_mode(spark, tmp_path):
    """storage_level= shares one scan through a cache; outputs identical."""
    import pyspark.sql.functions as F
    from pyspark import StorageLevel

    from sparkcheck.compile import verdicts_and_sink
    from sparkcheck.rules import NullCheckRule

    df = spark.range(0, 100, 1, 2).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
        F.col("id"),
    )
    rules = [NullCheckRule(name="nn", column="v")]
    sink = str(tmp_path / "s2")
    verdicts = verdicts_and_sink(df, rules, key_cols=["id"], sink_path=sink,
                                 storage_level=StorageLevel.MEMORY_AND_DISK)
    assert sum(r["violations"] for r in verdicts) == 10
    assert spark.read.parquet(sink).count() == 10


def test_rule_projection_fallback_for_undeclared_columns():
    """A rule that declares no column set must disable pruning (its
    predicate may reference columns the projection would drop); rules
    with plural `columns` (multi-col unique) contribute them."""
    from sparkcheck.compile.compiler import rule_projection
    from sparkcheck.rules import CompletenessRule, NullCheckRule, UniqueRule

    needed, prunable = rule_projection(
        [NullCheckRule(name="nn", column="a"),
         CompletenessRule(name="cp", required_columns=("b", "c")),
         UniqueRule(name="uq", column="", columns=("d", "e"))],
        key_cols=["id"],
    )
    assert needed == ["id", "a", "b", "c", "d", "e"] and prunable

    class _ExprRule:  # future rule type with an opaque predicate
        name = "x"

    _, prunable2 = rule_projection(
        [NullCheckRule(name="nn", column="a"), _ExprRule()], key_cols=["id"]
    )
    assert not prunable2
