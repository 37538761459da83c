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


# ---------------------------------------------------------------------------
# intelligent analysis (reference intelligent_analysis.py / query_analyzer.py)

def test_capture_plans_and_cartesian_smell(spark, tmp_path):
    """A deliberately cartesian SqlRule, run with capture_plans=True,
    must carry its physical plan on the outcome and produce a plan-smell
    warning that lands in the HTML report's analysis section."""
    from sparkcheck.io.html_report import render_full_html
    from sparkcheck.run import analyze_report

    spark.range(50).createOrReplaceTempView("_an_a")
    spark.range(50).createOrReplaceTempView("_an_b")
    rs = RuleSet(name="an", rules=(SqlRule(
        name="cartesian_rule",
        sql="SELECT a.id AS violation_count FROM _an_a a, _an_b b "
            "WHERE a.id * b.id < 0",
    ),))
    df = spark.range(10).select(F.col("id"))
    report = ValidationEngine(spark, capture_plans=True).run(rs, {"t": df})
    out = report.outcomes[0]
    assert out.plan  # captured
    insights = analyze_report(report)
    smells = [i for i in insights if i.kind == "plan_smell"]
    assert smells and any(
        "CartesianProduct" in i.details.get("pattern", "")
        or "NestedLoop" in i.details.get("pattern", "")
        for i in smells
    )
    page = render_full_html(report, title="t")
    assert "Analysis warnings" in page and "cartesian_rule" in page
    # JSON form round-trips
    assert smells[0].to_dict()["rule_id"] == "cartesian_rule"
    spark.catalog.dropTempView("_an_a")
    spark.catalog.dropTempView("_an_b")


def test_unpushed_filter_smell_on_real_scan(spark):
    """A predicate Catalyst cannot push (arithmetic over the column)
    leaves PushedFilters: [] on the parquet scan — flagged."""
    from sparkcheck.run import explain_str, plan_smells

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    blocked = df.where((F.col("o_totalprice") * 1.0000001) > 100.0)
    smells = plan_smells(explain_str(blocked), "r")
    assert any(i.details["pattern"] == "unpushed_filter" for i in smells)
    # control: a pushable predicate must NOT trigger the smell
    pushed = df.where(F.col("o_totalprice") > 100.0)
    assert not any(
        i.details["pattern"] == "unpushed_filter"
        for i in plan_smells(explain_str(pushed), "r")
    )


def test_slow_rule_history_detector():
    """p95-outlier over run history (query_analyzer.get_slow_queries):
    a rule 10x above its own history is flagged; steady rules are not."""
    from sparkcheck.run import slow_rules

    history = [
        {"ts": i, "rules": {"hot": {"violations": 0, "passed": True, "elapsed_sec": 1.0},
                            "steady": {"violations": 0, "passed": True, "elapsed_sec": 2.0}}}
        for i in range(5)
    ]
    report = {"ruleset": "r", "outcomes": [
        {"rule_id": "hot", "table": "t", "column": "", "passed": True,
         "violations": 0, "evaluated": 1, "total_rows": 1, "elapsed_sec": 10.0},
        {"rule_id": "steady", "table": "t", "column": "", "passed": True,
         "violations": 0, "evaluated": 1, "total_rows": 1, "elapsed_sec": 2.1},
    ]}
    flags = slow_rules(report, history)
    assert [i.rule_id for i in flags if i.severity == "warning"] == ["hot"]


def test_history_records_elapsed(tmp_path):
    from sparkcheck.io.html_report import append_history, load_history

    report = {"ruleset": "r", "outcomes": [
        {"rule_id": "a", "violations": 1, "passed": False, "elapsed_sec": 0.25},
    ]}
    p = str(tmp_path / "h.jsonl")
    append_history(report, p, run_ts=1.0)
    rec = load_history(p)[0]
    assert rec["rules"]["a"]["elapsed_sec"] == 0.25


def test_history_ts_is_report_run_ts(tmp_path):
    """append_history stores the report's own run_ts as the record ts, so
    a report matches its history record exactly — a stable suite whose
    consecutive runs have identical violation maps no longer fools the
    trailing-record dedup in cmd_report (ADVICE r3)."""
    from sparkcheck.io.html_report import append_history, load_history

    p = str(tmp_path / "h.jsonl")
    for ts in (100.5, 200.5):  # identical violations, distinct runs
        append_history(
            {"ruleset": "r", "run_ts": ts,
             "outcomes": [{"rule_id": "a", "violations": 0, "passed": True}]},
            p,
        )
    recs = load_history(p)
    assert [r["ts"] for r in recs] == [100.5, 200.5]
    # the cmd_report dedup drops ONLY the record whose ts == run_ts
    report = {"ruleset": "r", "run_ts": 200.5, "outcomes": []}
    prior = [r for r in recs if r["ts"] != report["run_ts"]]
    assert [r["ts"] for r in prior] == [100.5]


def test_flaky_rule_detector():
    """Flip-flopping rules flagged (intelligent_analysis.py:270-317);
    consistently passing/failing ones are not."""
    from sparkcheck.run import flaky_rules

    history = [
        {"rules": {"flappy": {"passed": i % 2 == 0, "violations": i % 2},
                   "steady": {"passed": True, "violations": 0},
                   "broken": {"passed": False, "violations": 9}}}
        for i in range(8)
    ]
    flags = flaky_rules(history)
    assert [i.rule_id for i in flags] == ["flappy"]
    assert flags[0].details["flakiness"] == 0.5


def test_degrading_rule_detector():
    """Upward wall-time trend flagged (intelligent_analysis.py:224-268);
    flat and fast rules are not."""
    from sparkcheck.run import degrading_rules

    history = [
        {"rules": {"creeping": {"passed": True, "elapsed_sec": 2.0 + 0.5 * i},
                   "flat": {"passed": True, "elapsed_sec": 3.0},
                   "fast_creep": {"passed": True, "elapsed_sec": 0.01 * (i + 1)}}}
        for i in range(6)
    ]
    flags = degrading_rules(history)
    assert [i.rule_id for i in flags] == ["creeping"]
    assert flags[0].details["slope_sec_per_run"] == 0.5


def test_failure_pattern_grouping():
    """N rules failing with the same normalized message collapse into
    one systemic insight (intelligent_analysis.py:184-222)."""
    from sparkcheck.run import failure_patterns

    report = {"ruleset": "r", "outcomes": [
        {"rule_id": f"ri_{i}", "table": "t", "column": "", "passed": False,
         "violations": 5, "evaluated": 5, "total_rows": 5,
         "message": f"distinct orphan keys: {i * 17}"}
        for i in range(3)
    ] + [
        {"rule_id": "other", "table": "t", "column": "", "passed": False,
         "violations": 1, "evaluated": 1, "total_rows": 1,
         "message": "unique violation on 'url'"},
        {"rule_id": "green", "table": "t", "column": "", "passed": True,
         "violations": 0, "evaluated": 1, "total_rows": 1, "message": ""},
    ]}
    flags = failure_patterns(report)
    assert len(flags) == 1
    assert flags[0].details["rules"] == ["ri_0", "ri_1", "ri_2"]
    assert "<n>" in flags[0].details["pattern"]


def test_unpushed_filter_smell_skips_having(spark):
    """A HAVING-style predicate sits above an Aggregate and can never
    push to the reader — it must not trigger the unpushed-filter smell."""
    from pyspark.sql import functions as F
    from sparkcheck.run import explain_str, plan_smells

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    having = (
        df.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 3)
    )
    assert not any(
        i.details["pattern"] == "unpushed_filter"
        for i in plan_smells(explain_str(having), "r")
    )


def test_orchestrate_rulesets_merged_and_fail_fast(spark):
    """Cross-suite orchestration (run/orchestrate.py — reference
    orchestration.py/enterprise_executor.py): per-set table binding,
    merged verdicts, fail_fast skip list, history append."""
    from pyspark.sql import functions as F

    from sparkcheck.rules.models import EnumRule, NullCheckRule, RuleSet
    from sparkcheck.run import run_rulesets

    users = spark.range(20).select(
        F.col("id"), F.lit("active").alias("status"))
    events = spark.range(30).select(
        F.col("id"), F.when(F.col("id") < 3, None).otherwise("e").alias("kind"))
    tables = {"users": users, "events": events}

    ok_set = RuleSet(name="users_ok", table="users", rules=(
        EnumRule(name="st", column="status", allowed_values=("active",)),))
    bad_set = RuleSet(name="events_bad", table="events", rules=(
        NullCheckRule(name="nn_kind", column="kind"),))
    tail_set = RuleSet(name="users_tail", table="users", rules=(
        NullCheckRule(name="nn_id", column="id"),))

    res = run_rulesets(spark, [ok_set, bad_set, tail_set], tables)
    assert list(res.reports) == ["users_ok", "events_bad", "users_tail"]
    assert not res.passed and res.total_violations == 3
    assert res.reports["users_ok"].passed and not res.reports["events_bad"].passed
    sd = res.summary_dict()
    assert sd["failed_sets"] == ["events_bad"] and sd["rule_sets"] == 3

    # fail_fast: the set AFTER the failing one is skipped, not run
    ff = run_rulesets(spark, [ok_set, bad_set, tail_set], tables, fail_fast=True)
    assert list(ff.reports) == ["users_ok", "events_bad"]
    assert ff.skipped == ["users_tail"] and not ff.passed

    # parallel path produces the same verdicts
    par = run_rulesets(spark, [ok_set, bad_set, tail_set], tables, parallel=2)
    assert {n: r.passed for n, r in par.reports.items()} == \
           {n: r.passed for n, r in res.reports.items()}

    # unknown binding is a loud error before any job runs
    import pytest as _pytest
    with _pytest.raises(KeyError):
        run_rulesets(spark, [RuleSet(name="x", table="nope", rules=(
            NullCheckRule(name="n", column="id"),))], tables)

    # aggregate HTML: summary row per set + per-suite sections + skip row
    from sparkcheck.io.html_report import render_orchestration_html

    doc = render_orchestration_html(ff)
    assert doc.count('id="suite-') == 2 and "SKIPPED (fail_fast)" in doc
    assert '<span class="fail">FAIL</span>' in doc and "users_tail" in doc


def test_orchestrate_guards_and_parallel_fail_fast(spark):
    """Review fixes: duplicate set names rejected loudly (silent report
    drop), parallel fail_fast skips sets queued behind a failure (weak
    deterministic form: reports ∪ skipped partition the input), anchor
    slugs valid for names with spaces."""
    from pyspark.sql import functions as F

    from sparkcheck.rules.models import NullCheckRule, RuleSet
    from sparkcheck.run import run_rulesets

    df = spark.range(5).select(
        F.col("id"), F.when(F.col("id") < 2, None).otherwise("x").alias("v"))
    tables = {"t": df}
    bad = RuleSet(name="bad set", table="t",
                  rules=(NullCheckRule(name="nn", column="v"),))
    ok = RuleSet(name="ok", table="t",
                 rules=(NullCheckRule(name="nnid", column="id"),))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="duplicate"):
        run_rulesets(spark, [ok, ok], tables)

    bad2 = RuleSet(name="bad2", table="t",
                   rules=(NullCheckRule(name="nn2", column="v"),))
    res = run_rulesets(spark, [bad, bad2, ok.__class__(name="ok2", table="t",
                       rules=ok.rules)], tables, parallel=2, fail_fast=True)
    # rolling submission (round-5 ADVICE fix): at most `parallel` sets
    # are in flight and the queue tops up as each finishes, so no wave
    # barrier lets a straggler idle the other workers — while fail_fast
    # still halts submission within one in-flight window. Deterministic
    # form: BOTH in-flight sets fail, so whichever finishes first has
    # already raised the stop flag before any top-up can happen — 'ok2'
    # is never submitted (previously all three were submitted up front
    # and fail_fast degraded to a no-op when max_workers >= n sets).
    assert "bad set" in res.reports and not res.reports["bad set"].passed
    assert "ok2" in res.skipped
    assert set(res.reports) | set(res.skipped) == {"bad set", "bad2", "ok2"}
    assert not res.passed

    # whitespace-containing suite names get valid HTML ids + hrefs
    from sparkcheck.io.html_report import render_orchestration_html

    doc = render_orchestration_html(res)
    assert 'id="suite-bad-set"' in doc and 'href="#suite-bad-set"' in doc
    assert 'id="suite-bad set"' not in doc


def test_merged_outcomes_csv(tmp_path):
    """write_merged_outcomes_csv: one CSV across suites with a leading
    rule_set column (the --all-rulesets --csv path)."""
    import csv as _csv

    from sparkcheck.io.html_report import write_merged_outcomes_csv

    reports = {
        "s1": {"outcomes": [{"rule_id": "a", "violations": 1, "passed": False}]},
        "s2": {"outcomes": [{"rule_id": "b", "violations": 0, "passed": True}]},
    }
    p = str(tmp_path / "m.csv")
    write_merged_outcomes_csv(reports, p)
    rows = list(_csv.DictReader(open(p)))
    assert [(r["rule_set"], r["rule_id"]) for r in rows] == [("s1", "a"), ("s2", "b")]
