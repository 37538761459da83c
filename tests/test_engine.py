"""ValidationEngine: orchestration, thresholds, DAG, SQL-rule contract,
checkpoint/resume (FIXTURES.md §4/§5 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcheck.rules import (
    EnumRule,
    NullCheckRule,
    RangeRule,
    ReferentialIntegrityRule,
    RuleSet,
    Severity,
    SqlRule,
    UniqueRule,
)
from sparkcheck.run import (
    CheckpointStore,
    CircularDependencyError,
    ValidationEngine,
    checkpointed_validate,
    merge_group_outcomes,
    topo_sort,
)
from sparkcheck.rules.models import Rule


def test_topo_sort_orders_dependencies():
    a = Rule(name="a")
    b = Rule(name="b", depends_on=("a",))
    c = Rule(name="c", depends_on=("b", "a"))
    order = [r.name for r in topo_sort([c, b, a])]
    assert order.index("a") < order.index("b") < order.index("c")


def test_topo_sort_detects_cycle():
    a = Rule(name="a", depends_on=("b",))
    b = Rule(name="b", depends_on=("a",))
    with pytest.raises(CircularDependencyError):
        topo_sort([a, b])


def test_engine_mixed_ruleset(spark):
    customers = spark.createDataFrame(
        [(1, "a@x.com"), (2, None), (3, "c@x.com"), (3, "dup@x.com")],
        "customer_id int, email string",
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99)], "order_id int, customer_id int"
    )
    rs = RuleSet(
        name="fixtures5",
        rules=(
            NullCheckRule(name="email_not_null", column="email"),
            UniqueRule(name="pk_unique", column="customer_id"),
            ReferentialIntegrityRule(
                name="orders_fk", child_table="orders", child_column="customer_id",
                parent_table="customers", parent_column="customer_id",
            ),
        ),
    )
    eng = ValidationEngine(spark)
    rep = eng.run(rs, {"customers": customers, "orders": orders}, default_table="customers")
    by_id = {o.rule_id: o for o in rep.outcomes}
    assert by_id["email_not_null"].violations == 1
    assert by_id["pk_unique"].violations == 1  # COUNT − COUNT DISTINCT = 4−3
    assert by_id["orders_fk"].violations == 1  # customer 99
    assert not rep.passed
    assert rep.total_violations == 3
    assert all(o.elapsed_sec >= 0 for o in rep.outcomes)


def test_engine_thresholds(spark):
    df = spark.createDataFrame([(None,), (None,), (1,)], "v int")
    eng = ValidationEngine(spark)
    # max_violations=2 tolerates both nulls
    rs = RuleSet(name="t", rules=(NullCheckRule(name="nn", column="v", max_violations=2),))
    assert eng.run(rs, {"t": df}).passed
    # expected_violations=1 fails (actual 2)
    rs = RuleSet(name="t", rules=(NullCheckRule(name="nn", column="v", expected_violations=1),))
    assert not eng.run(rs, {"t": df}).passed
    # expected_violations=2 passes exactly
    rs = RuleSet(name="t", rules=(NullCheckRule(name="nn", column="v", expected_violations=2),))
    assert eng.run(rs, {"t": df}).passed


def test_engine_warning_severity_does_not_fail_suite(spark):
    df = spark.createDataFrame([(None,)], "v int")
    rs = RuleSet(
        name="t",
        rules=(NullCheckRule(name="nn", column="v", severity=Severity.WARNING),),
    )
    rep = ValidationEngine(spark).run(rs, {"t": df})
    assert rep.outcomes[0].violations == 1
    assert not rep.outcomes[0].passed
    assert rep.passed  # warnings don't gate


def test_sql_rule_violation_contract(spark):
    # FIXTURES §4: 2000 ints, rule `value % 50 = 0` ⇒ exactly 40 violation rows
    spark.createDataFrame(
        [(i, i) for i in range(2000)], "id int, value int"
    ).createOrReplaceTempView("numbers")
    rs = RuleSet(
        name="br",
        rules=(SqlRule(
            name="mod50",
            sql="SELECT id, value, 1 AS violation_count FROM numbers WHERE value % 50 = 0",
        ),),
    )
    rep = ValidationEngine(spark).run(rs, {"numbers": spark.table("numbers")})
    o = rep.outcomes[0]
    assert o.violations == 40
    assert not o.passed
    assert o.sample_values and o.sample_values[0]["value"] % 50 == 0


def test_sql_rule_passing_rows(spark):
    spark.createDataFrame([(1,)], "v int").createOrReplaceTempView("tiny")
    rs = RuleSet(
        name="br",
        rules=(SqlRule(name="ok", sql="SELECT 0 AS violation_count FROM tiny"),),
    )
    rep = ValidationEngine(spark).run(rs, {"tiny": spark.table("tiny")})
    assert rep.outcomes[0].passed and rep.outcomes[0].violations == 0


def test_missing_column_is_synthetic_failure(spark):
    df = spark.createDataFrame([(1,)], "v int")
    rs = RuleSet(name="t", rules=(NullCheckRule(name="ghost", column="nope"),))
    rep = ValidationEngine(spark).run(rs, {"t": df})
    o = rep.outcomes[0]
    assert not o.passed and "column_exists" in o.message


def test_checkpoint_resume(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 4, None if i % 10 == 0 else i) for i in range(400)],
        "id int, part int, v int",
    )
    rules = [NullCheckRule(name="v_not_null", column="v")]
    store = CheckpointStore(str(tmp_path / "ckpt"))

    # First run: process only groups 0,1 then "crash".
    seen = []
    def crash_after_two(res):
        seen.append(res.group_id)
        if len(seen) == 2:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        checkpointed_validate(
            spark, df, rules, F.col("part"), store, suite_name="s",
            on_group_done=crash_after_two,
        )

    # Resume: the two completed groups load from checkpoint (resumed=True).
    results = checkpointed_validate(spark, df, rules, F.col("part"), store, suite_name="s")
    assert len(results) == 4
    assert sum(r.resumed for r in results) == 2
    merged = {m["rule_id"]: m for m in merge_group_outcomes(results)}
    assert merged["v_not_null"]["violations"] == 40
    assert merged["v_not_null"]["total_rows"] == 400

    # Changing the suite invalidates the checkpoint (different fingerprint).
    other = [NullCheckRule(name="v_not_null", column="v", max_violations=5)]
    results2 = checkpointed_validate(spark, df, other, F.col("part"), store, suite_name="s")
    assert sum(r.resumed for r in results2) == 0


def test_ri_rule_missing_table_is_synthetic_failure(spark):
    from sparkcheck.rules import NullCheckRule, ReferentialIntegrityRule, RuleSet
    from sparkcheck.run import ValidationEngine

    df = spark.createDataFrame([(1,)], "id long")
    rs = RuleSet(name="r", rules=(
        NullCheckRule(name="nn", column="id"),
        ReferentialIntegrityRule(
            name="fk", child_table="missing_child", child_column="id",
            parent_table="t", parent_column="id"),
    ))
    report = ValidationEngine(spark).run(rs, {"t": df})
    by_id = {o.rule_id: o for o in report.outcomes}
    assert by_id["nn"].passed
    assert by_id["fk"].skipped and not by_id["fk"].passed
    assert "missing_child" in by_id["fk"].message


def test_independent_rules_run_concurrently(spark):
    """≥3 independent non-fused rules must overlap their Spark jobs:
    suite wall time < sum of per-rule wall times (each rule's job is a
    single 1-task sleep, so sequential execution would be ~additive)."""
    import time as _time

    from sparkcheck.run.engine import ValidationEngine, _dependency_waves

    spark.udf.register("sc_slow_id", lambda x: _time.sleep(0.1) or x, "long")
    spark.range(1).createOrReplaceTempView("eng_conc_tiny")

    def slow_rule(name, deps=()):
        # 10 rows × 0.1 s in ONE task ⇒ ~1 s of genuinely serial job time
        return SqlRule(
            name=name,
            sql="SELECT count(*) AS violation_count FROM "
                "(SELECT sc_slow_id(id) AS s FROM range(0, 10, 1, 1)) WHERE s < 0",
            depends_on=tuple(deps),
        )

    rules = (slow_rule("r1"), slow_rule("r2"), slow_rule("r3"),
             slow_rule("r4_dep", deps=["r1"]))
    waves = _dependency_waves(list(rules))
    assert [sorted(r.name for r in w) for w in waves] == [
        ["r1", "r2", "r3"], ["r4_dep"]]

    rs = RuleSet(name="conc", rules=rules, max_concurrent=4)
    rep = ValidationEngine(spark).run(
        rs, {"eng_conc_tiny": spark.table("eng_conc_tiny")})
    assert all(o.passed for o in rep.outcomes), [o.message for o in rep.outcomes]
    assert [o.rule_id for o in rep.outcomes] == ["r1", "r2", "r3", "r4_dep"]
    per_rule = sum(o.elapsed_sec for o in rep.outcomes)
    # wave 1 overlaps its three ~1 s jobs; wave 2 adds ~1 s. Sequential
    # would be ≥ per_rule (~4 s); require clear overlap with noise margin.
    assert rep.elapsed_sec < per_rule * 0.75, (rep.elapsed_sec, per_rule)
