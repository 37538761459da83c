"""End-to-end tests for the SQL unit-testing framework, mirroring the
reference's integration scenarios (tests/sql_testing/test_integration.py:
user-count/avg-age/user-exists suite over an inline users fixture) plus
the Spark-specific surfaces: session isolation, SQL-script fixtures,
parallel suites, the fluent expect() API, and YAML loading with
!include."""

from __future__ import annotations

import textwrap

import pytest

from sparkcheck.io.config import IncludeError, load_yaml_with_includes
from sparkcheck.testing import (
    FixtureType,
    SQLTestCase,
    SQLTestSuite,
    SparkAssertionError,
    SparkTestRunner,
    TestAssertion,
    TestFixture,
    TestStatus,
    expect,
    load_suite_yaml,
    run_assertion,
    run_sql_statements,
    split_sql_statements,
)

USERS = TestFixture(
    name="test_users",
    table_name="users",
    fixture_type=FixtureType.INLINE,
    data_source=[
        {"id": 1, "name": "Alice", "age": 30},
        {"id": 2, "name": "Bob", "age": 25},
        {"id": 3, "name": "Charlie", "age": 35},
    ],
    schema="id int, name string, age int",
)


# ---------------------------------------------------------------------------
# reference integration scenario (test_integration.py: user_tests suite)

def test_reference_user_suite(spark):
    suite = SQLTestSuite(
        name="user_tests",
        tests=(
            SQLTestCase(
                name="test_user_count",
                sql="SELECT COUNT(*) AS count FROM users",
                fixtures=(USERS,),
                assertions=(TestAssertion("equals", expected=[{"count": 3}]),),
            ),
            SQLTestCase(
                name="test_average_age",
                sql="SELECT AVG(age) AS avg_age FROM users",
                fixtures=(USERS,),
                assertions=(
                    TestAssertion(
                        "custom",
                        custom_function=lambda df: {
                            "passed": abs(df.first()["avg_age"] - 30) < 0.1,
                            "actual": df.first()["avg_age"],
                        },
                    ),
                ),
            ),
            SQLTestCase(
                name="test_user_exists",
                sql="SELECT * FROM users WHERE name = 'Alice'",
                fixtures=(USERS,),
                assertions=(
                    TestAssertion("contains", expected={"name": "Alice", "age": 30}),
                    TestAssertion("row_count", params={"expected_count": 1}),
                ),
            ),
        ),
    )
    result = SparkTestRunner(spark).execute_suite(suite)
    assert result.total_tests == 3
    assert result.passed_tests == 3, [
        (r.test_name, r.error_message, [a.as_dict() for a in r.assertion_results])
        for r in result.test_results
    ]
    assert result.success_rate == 1.0


def test_failed_assertion_and_statuses(spark):
    suite = SQLTestSuite(
        name="mixed",
        tests=(
            SQLTestCase(
                name="wrong_count",
                sql="SELECT COUNT(*) AS count FROM users",
                fixtures=(USERS,),
                assertions=(TestAssertion("equals", expected=[{"count": 99}]),),
            ),
            SQLTestCase(
                name="bad_sql",
                sql="SELECT * FROM table_that_does_not_exist_xyz",
            ),
            SQLTestCase(name="disabled", sql="SELECT 1", enabled=False),
            SQLTestCase(
                name="dependent_on_missing",
                sql="SELECT 1",
                depends_on=("never_ran",),
            ),
        ),
    )
    res = SparkTestRunner(spark).execute_suite(suite)
    by = {r.test_name: r for r in res.test_results}
    assert by["wrong_count"].status == TestStatus.FAILED
    assert by["wrong_count"].assertion_results[0].passed is False
    assert by["bad_sql"].status == TestStatus.ERROR
    assert "disabled" not in by  # filtered by enabled_tests()
    assert by["dependent_on_missing"].status == TestStatus.SKIPPED


def test_dependency_ordering_and_execution(spark):
    """depends_on tests run after their dependency (executor.py:351-384)."""
    order: list[str] = []
    suite = SQLTestSuite(
        name="deps",
        tests=(
            SQLTestCase(
                name="b_child",
                sql="SELECT 1 AS one",
                depends_on=("a_parent",),
                assertions=(TestAssertion(
                    "custom", custom_function=lambda df: order.append("b_child") or True),),
            ),
            SQLTestCase(
                name="a_parent",
                sql="SELECT 1 AS one",
                assertions=(TestAssertion(
                    "custom", custom_function=lambda df: order.append("a_parent") or True),),
            ),
        ),
    )
    res = SparkTestRunner(spark).execute_suite(suite)
    assert all(r.status == TestStatus.PASSED for r in res.test_results)
    assert order == ["a_parent", "b_child"]


def test_session_isolation(spark):
    """A fixture view registered in one isolated test is invisible to the
    next test and to the parent session (Spark analog of transaction
    isolation, executor.py:447-510)."""
    t1 = SQLTestCase(
        name="register", sql="SELECT COUNT(*) AS n FROM users", fixtures=(USERS,),
        assertions=(TestAssertion("equals", expected=3),),
    )
    t2 = SQLTestCase(name="cannot_see", sql="SELECT COUNT(*) AS n FROM users")
    runner = SparkTestRunner(spark)
    r1 = runner.execute_test(t1)
    r2 = runner.execute_test(t2)
    assert r1.status == TestStatus.PASSED
    assert r2.status == TestStatus.ERROR  # users view not in this session
    assert "users" not in [v.name for v in spark.catalog.listTables()]


def test_setup_teardown_and_multistatement_sql(spark):
    t = SQLTestCase(
        name="setup_teardown",
        setup_sql="CREATE OR REPLACE TEMP VIEW doubled AS SELECT id * 2 AS v FROM src",
        sql=textwrap.dedent("""
            CREATE OR REPLACE TEMP VIEW capped AS SELECT v FROM doubled WHERE v <= 4;
            SELECT SUM(v) AS total FROM capped
        """),
        teardown_sql="DROP VIEW IF EXISTS capped; DROP VIEW IF EXISTS doubled",
        fixtures=(TestFixture(
            name="src", table_name="src", fixture_type="inline",
            data_source=[{"id": 1}, {"id": 2}, {"id": 3}], schema="id int"),),
        assertions=(TestAssertion("equals", expected=6),),
    )
    r = SparkTestRunner(spark).execute_test(t)
    assert r.status == TestStatus.PASSED, (r.error_message, r.assertion_results)


def test_sql_script_fixture(spark, tmp_path):
    """.sql fixture file executed statement-by-statement; last SELECT
    becomes the fixture table (fixtures.py:110-124)."""
    script = tmp_path / "orders_fixture.sql"
    script.write_text(
        "-- seed data; semicolons inside 'quoted; strings' are preserved\n"
        "CREATE OR REPLACE TEMP VIEW _raw AS SELECT * FROM VALUES"
        " (1, 'a;b'), (2, 'c') AS t(id, tag);\n"
        "SELECT id, upper(tag) AS tag FROM _raw;\n"
    )
    t = SQLTestCase(
        name="script_fixture",
        sql="SELECT COUNT(*) AS n, MAX(tag) AS mx FROM fixture_orders",
        fixtures=(TestFixture(
            name="fixture_orders", table_name="fixture_orders",
            fixture_type="sql", data_source=str(script)),),
        assertions=(TestAssertion("equals", expected=[{"n": 2, "mx": "C"}]),),
    )
    r = SparkTestRunner(spark).execute_test(t)
    assert r.status == TestStatus.PASSED, (r.error_message, r.assertion_results)


def test_parallel_suite_runs_all(spark):
    tests = tuple(
        SQLTestCase(
            name=f"p{i}",
            sql=f"SELECT {i} AS v",
            assertions=(TestAssertion("equals", expected=i),),
        )
        for i in range(6)
    )
    suite = SQLTestSuite(name="par", tests=tests, parallel=True, max_workers=4)
    res = SparkTestRunner(spark).execute_suite(suite)
    assert res.passed_tests == 6


def test_fail_fast_stops_suite(spark):
    suite = SQLTestSuite(
        name="ff",
        fail_fast=True,
        tests=(
            SQLTestCase(name="a_fails", sql="SELECT 1 AS v",
                        assertions=(TestAssertion("equals", expected=2),)),
            SQLTestCase(name="b_never", sql="SELECT 1 AS v"),
        ),
    )
    res = SparkTestRunner(spark).execute_suite(suite)
    assert [r.test_name for r in res.test_results] == ["a_fails"]
    assert res.failed_tests == 1


def test_suite_teardown_failure_surfaces(spark):
    """A teardown_sql failure after all tests ran must not report the
    suite clean — it surfaces as a synthetic suite-level ERROR result."""
    suite = SQLTestSuite(
        name="td",
        tests=(SQLTestCase(name="ok", sql="SELECT 1 AS v",
                           assertions=(TestAssertion("equals", expected=1),)),),
        teardown_sql="SELECT * FROM no_such_table_xyz",
    )
    res = SparkTestRunner(spark).execute_suite(suite)
    assert res.passed_tests == 1
    errs = [r for r in res.test_results if r.status == TestStatus.ERROR]
    assert len(errs) == 1
    assert errs[0].test_name == "td::teardown"
    assert "teardown failed" in errs[0].error_message


# ---------------------------------------------------------------------------
# assertion engine: all 26 reference types (assertions/engine.py:32-59)

def test_assertion_engine_all_types(spark):
    df = spark.createDataFrame(
        [(1, "alice@x.com", 30.0), (2, "bob@y.org", 25.0), (3, "carol@z.io", 35.0)],
        "id int, email string, score double",
    )
    one = spark.sql("SELECT 30.0 AS v")
    nul = spark.sql("SELECT CAST(NULL AS INT) AS v")
    empty = df.where("id < 0")

    cases = [
        (TestAssertion("equals", expected=30.0), one, True),
        (TestAssertion("not_equals", expected=31.0), one, True),
        (TestAssertion("greater_than", expected=29), one, True),
        (TestAssertion("less_than", expected=29), one, False),
        (TestAssertion("greater_equal", expected=30.0), one, True),
        (TestAssertion("less_equal", expected=30.0), one, True),
        (TestAssertion("contains", expected={"id": 2, "email": "bob@y.org"}), df, True),
        (TestAssertion("not_contains", expected={"id": 9}), df, True),
        (TestAssertion("starts_with", expected="3"), one, True),
        (TestAssertion("ends_with", expected=".0"), one, True),
        (TestAssertion("matches_regex", expected="^3\\d", params={}), one, True),
        (TestAssertion("matches_regex", expected="^[a-z]+@[a-z.]+$",
                       params={"column": "email"}), df, True),
        (TestAssertion("is_null"), nul, True),
        (TestAssertion("is_not_null"), one, True),
        (TestAssertion("is_empty"), empty, True),
        (TestAssertion("is_not_empty"), df, True),
        (TestAssertion("has_length", expected=4), one, True),   # "30.0"
        (TestAssertion("has_min_length", expected=2), one, True),
        (TestAssertion("has_max_length", expected=3), one, False),
        (TestAssertion("in_range", params={"min": 20, "max": 40}), one, True),
        (TestAssertion("not_in_range", params={"min": 50, "max": 60}), one, True),
        (TestAssertion("in_range", params={"column": "score", "min": 20, "max": 40}), df, True),
        (TestAssertion("is_unique", params={"column": "id"}), df, True),
        (TestAssertion("has_duplicates", params={"column": "id"}), df, False),
        (TestAssertion("row_count", params={"expected_count": 3}), df, True),
        (TestAssertion("row_count", params={"min_count": 1, "max_count": 2}), df, False),
        (TestAssertion("column_count", params={"expected_count": 3}), df, True),
        (TestAssertion("schema_matches", params={
            "expected_columns": ["id", "email"],
            "expected_types": {"score": "double"}}), df, True),
        (TestAssertion("schema_matches", params={
            "expected_columns": ["id", "email", "score"],
            "allow_extra_columns": False, "strict_order": True}), df, True),
        (TestAssertion("custom", custom_function=lambda d: d.count() == 3), df, True),
    ]
    for assertion, frame, want in cases:
        out = run_assertion(assertion, frame)
        assert out.passed is want, (assertion.assertion_type, out.as_dict())
        assert out.error is None, out.as_dict()


def test_equals_tolerance_and_order(spark):
    df = spark.createDataFrame([(1, 0.30000001), (2, 0.7)], "id int, p double")
    out = run_assertion(
        TestAssertion("equals", tolerance=1e-6, ignore_order=True,
                      expected=[{"id": 2, "p": 0.7}, {"id": 1, "p": 0.3}]),
        df,
    )
    assert out.passed, out.as_dict()
    strict = run_assertion(
        TestAssertion("equals", expected=[{"id": 1, "p": 0.3}, {"id": 2, "p": 0.7}]),
        df,
    )
    assert not strict.passed  # no tolerance → float mismatch


# ---------------------------------------------------------------------------
# fluent expect() API (reference testing/assertions.py:147-246)

def test_fluent_expect_chain(spark):
    df = spark.createDataFrame(
        [(1, "a@x.com", 10), (2, "b@y.org", 20)], "id int, email string, n int"
    )
    (
        expect(df)
        .row_count(equals=2)
        .column_count(3)
        .is_not_empty()
        .schema_matches(columns=["id", "email", "n"], types={"id": "int"})
        .contains({"id": 1, "n": 10})
        .column("id").is_unique().has_no_nulls().in_range(1, 2)
        .expect()
        .column("email").matches_regex("^[ab]@").expect()
        .column("n").is_in([10, 20])
    )
    with pytest.raises(SparkAssertionError, match="row_count"):
        expect(df).row_count(equals=5)
    with pytest.raises(SparkAssertionError, match="custom msg"):
        expect(df).with_message("custom msg").row_count(at_least=3)


def test_fluent_query_equals_distributed(spark):
    a = spark.range(100).withColumnRenamed("id", "v")
    b = spark.range(100).withColumnRenamed("id", "v")
    expect(a).query_equals(b)
    with pytest.raises(SparkAssertionError):
        expect(a).query_equals(b.where("v < 99"))


def test_scalar_extraction(spark):
    assert expect(spark.sql("SELECT 42 AS v")).scalar() == 42
    expect(spark.sql("SELECT 42 AS v")).scalar_equals(42)


# ---------------------------------------------------------------------------
# YAML loading (+ !include, env interpolation, no-inline-code policy)

SUITE_YAML = """\
name: yaml_suite
description: loaded from yaml
fixtures:
  - name: test_users
    table_name: users
    fixture_type: inline
    data_source:
      - {id: 1, name: Alice, age: 30}
      - {id: 2, name: Bob, age: 25}
      - {id: 3, name: Charlie, age: 35}
    schema: "id int, name string, age int"
tests:
  - name: test_user_count
    sql: SELECT COUNT(*) AS count FROM users
    fixtures: [test_users]
    assertions:
      - {type: equals, expected: [{count: 3}]}
    isolation_level: transaction   # reference level -> session analog
  - name: test_age_range
    sql: SELECT * FROM users
    fixtures: [test_users]
    assertions:
      - {type: in_range, column: age, min: 20, max: 40}
      - {type: is_unique, column: id}
      - {type: schema_match, expected_columns: [id, name, age]}
"""


def test_yaml_suite_end_to_end(spark, tmp_path):
    p = tmp_path / "suite.yaml"
    p.write_text(SUITE_YAML)
    suite = load_suite_yaml(str(p))
    assert suite.name == "yaml_suite"
    assert suite.tests[0].isolation.value == "session"
    res = SparkTestRunner(spark).execute_suite(suite)
    assert res.passed_tests == 2, [
        (r.test_name, r.error_message, [a.as_dict() for a in r.assertion_results])
        for r in res.test_results
    ]


def test_yaml_include(tmp_path):
    (tmp_path / "fixtures.yaml").write_text(
        "fixtures:\n"
        "  - {name: t, table_name: t, fixture_type: inline,"
        " data_source: [{id: 1}]}\n"
    )
    (tmp_path / "suite.yaml").write_text(
        "!include fixtures.yaml\n"
        "name: inc\n"
        "tests:\n"
        "  - {name: t1, sql: SELECT 1 AS v, fixtures: [t]}\n"
    )
    suite = load_suite_yaml(str(tmp_path / "suite.yaml"))
    assert suite.name == "inc"
    assert suite.tests[0].fixtures[0].name == "t"


def test_yaml_include_traversal_blocked(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    (tmp_path / "outside.yaml").write_text("x: 1\n")
    (sub / "suite.yaml").write_text("!include ../outside.yaml\nname: bad\ntests: []\n")
    with pytest.raises(IncludeError, match="escapes"):
        load_yaml_with_includes(str(sub / "suite.yaml"))


def test_yaml_include_circular_blocked(tmp_path):
    (tmp_path / "a.yaml").write_text("!include b.yaml\n")
    (tmp_path / "b.yaml").write_text("!include a.yaml\n")
    with pytest.raises(IncludeError, match="circular"):
        load_yaml_with_includes(str(tmp_path / "a.yaml"))


def test_yaml_custom_assertion_requires_registry(tmp_path):
    p = tmp_path / "s.yaml"
    p.write_text(
        "name: s\ntests:\n"
        "  - name: t1\n    sql: SELECT 1 AS v\n    assertions:\n"
        "      - {type: custom, custom_function: nope}\n"
    )
    with pytest.raises(KeyError, match="unregistered"):
        load_suite_yaml(str(p))
    suite = load_suite_yaml(str(p), custom_registry={"nope": lambda df: True})
    assert suite.tests[0].assertions[0].custom_function is not None


# ---------------------------------------------------------------------------
# SQL statement splitter

def test_split_sql_statements():
    script = (
        "SELECT 'a;b' AS x; -- trailing; comment\n"
        'SELECT ";" AS y;\n'
        "/* block; comment */ SELECT 3"
    )
    stmts = split_sql_statements(script)
    assert len(stmts) == 3
    assert stmts[0] == "SELECT 'a;b' AS x"
    assert stmts[1].startswith("-- trailing; comment")


def test_split_sql_statements_slash_star_slash():
    """'/*/' must NOT close the block comment it opens (the close check
    would otherwise match the opener's own '*') — the ';' inside stays
    part of one statement."""
    stmts = split_sql_statements("SELECT 1 /*/ still comment; */ ; SELECT 2")
    assert len(stmts) == 2
    assert stmts[0] == "SELECT 1 /*/ still comment; */"
    assert stmts[1] == "SELECT 2"
    # and '/**/' (empty comment) still closes correctly
    stmts2 = split_sql_statements("SELECT 1 /**/; SELECT 2")
    assert len(stmts2) == 2


def test_run_sql_statements_lazy_last_select(spark):
    df = run_sql_statements(
        spark,
        "CREATE OR REPLACE TEMP VIEW _tt AS SELECT 1 AS v; SELECT v + 1 AS w FROM _tt",
    )
    assert df.collect()[0]["w"] == 2
    spark.catalog.dropTempView("_tt")


def test_junit_xml_and_suite_html(spark, tmp_path):
    """JUnit XML artifact (reference ci_cd_integration.py test-results.xml)
    + suite HTML page render all four statuses."""
    import xml.etree.ElementTree as ET

    from sparkcheck.testing import render_suite_html, write_junit_xml

    suite = SQLTestSuite(
        name="ci_suite",
        tests=(
            SQLTestCase(name="ok", sql="SELECT 1 AS v",
                        assertions=(TestAssertion("equals", expected=1),)),
            SQLTestCase(name="fails", sql="SELECT 1 AS v",
                        assertions=(TestAssertion("equals", expected=2),)),
            SQLTestCase(name="errors", sql="SELECT * FROM missing_tbl_xyz"),
            SQLTestCase(name="skipped_dep", sql="SELECT 1",
                        depends_on=("nonexistent",)),
        ),
    )
    res = SparkTestRunner(spark).execute_suite(suite)
    xml_path = str(tmp_path / "test-results.xml")
    write_junit_xml(res, xml_path)
    root = ET.parse(xml_path).getroot()
    ts = root.find("testsuite")
    assert ts.get("tests") == "4" and ts.get("failures") == "1"
    assert ts.get("errors") == "1" and ts.get("skipped") == "1"
    by_name = {tc.get("name"): tc for tc in ts.findall("testcase")}
    assert by_name["fails"].find("failure") is not None
    assert "expected 2" in by_name["fails"].find("failure").get("message")
    assert by_name["errors"].find("error") is not None
    assert by_name["skipped_dep"].find("skipped") is not None
    assert by_name["ok"].find("failure") is None

    page = render_suite_html(res)
    assert "SUITE FAILED" in page and "ci_suite" in page
    assert "expected 2" in page and "SKIP" in page


def test_benchmark_query_and_regression_gate(spark, tmp_path):
    from sparkcheck.testing import benchmark_concurrent, benchmark_query, regression_gate

    res = benchmark_query(
        spark, lambda: spark.range(10_000).selectExpr("sum(id) AS s"),
        name="sum_range", reps=3, warmup=1)
    assert res.rows == 1 and res.reps == 3 and len(res.samples) == 3
    assert res.best_sec <= res.p50_sec <= res.p95_sec

    base = str(tmp_path / "bench_baseline.json")
    ok, ratio = regression_gate(res, base)          # first run seeds baseline
    assert ok and ratio == 1.0
    ok2, ratio2 = regression_gate(res, base, tolerance=1000.0)
    assert ok2 and ratio2 > 0
    # a fabricated 10x slower result trips the gate
    import dataclasses
    slow = dataclasses.replace(res, p50_sec=res.p50_sec * 10)
    ok3, ratio3 = regression_gate(slow, base, tolerance=1.5)
    assert not ok3 and ratio3 > 5

    load = benchmark_concurrent(
        spark, [lambda: spark.range(5000).selectExpr("count(*) AS c")] * 4,
        workers=4)
    assert load["n_queries"] == 4 and load["overlap_factor"] >= 1.0


# ---------------------------------------------------------------------------
# regression tests for review findings

def test_suite_fixture_visible_to_all_tests(spark, tmp_path):
    """A suite-level fixture referenced by one test must stay visible to
    tests that don't list it (the documented suite-scope contract)."""
    p = tmp_path / "scope.yaml"
    p.write_text(
        "name: scope\n"
        "fixtures:\n"
        "  - {name: users, table_name: users, fixture_type: inline,\n"
        "     data_source: [{id: 1}, {id: 2}], schema: 'id int'}\n"
        "tests:\n"
        "  - name: references_it\n"
        "    sql: SELECT COUNT(*) AS n FROM users\n"
        "    fixtures: [users]\n"
        "    assertions: [{type: equals, expected: 2}]\n"
        "  - name: relies_on_suite_scope\n"
        "    sql: SELECT MAX(id) AS m FROM users\n"
        "    assertions: [{type: equals, expected: 2}]\n"
    )
    res = SparkTestRunner(spark).execute_suite(load_suite_yaml(str(p)))
    assert res.passed_tests == 2, [
        (r.test_name, r.error_message) for r in res.test_results]


def test_generated_fixture_content_hash_cache(spark, tmp_path, monkeypatch):
    """fixture_cache_dir: a GENERATED fixture is materialized to parquet
    once, keyed by md5 of its generation spec; a second registration of
    the SAME spec (e.g. another suite) reads the cache and never calls
    the generator, while a DIFFERENT spec gets its own entry."""
    import sparkcheck.testing.runner as R
    from sparkcheck.testing.models import FixtureType, TestFixture

    cache = str(tmp_path / "fixcache")
    spec = {"n": 100, "columns": {"id": "id", "v": "int"}, "seed": 7}
    fx = TestFixture(name="g", table_name="g_tbl",
                     fixture_type=FixtureType.GENERATED, data_source=spec)
    df1 = R.register_fixture(spark, fx, cache_dir=cache)
    rows1 = sorted((r["id"], r["v"]) for r in df1.collect())

    # second registration must be a pure cache read
    def _boom(*a, **k):
        raise AssertionError("generator re-invoked despite warm cache")
    monkeypatch.setattr(R, "generated_fixture", _boom)
    df2 = R.register_fixture(spark, fx, cache_dir=cache)
    assert sorted((r["id"], r["v"]) for r in df2.collect()) == rows1
    monkeypatch.undo()

    # a different spec misses the cache and creates a second entry
    import os
    fx2 = TestFixture(name="g2", table_name="g2_tbl",
                      fixture_type=FixtureType.GENERATED,
                      data_source={**spec, "seed": 8})
    R.register_fixture(spark, fx2, cache_dir=cache)
    assert len([d for d in os.listdir(cache) if d.startswith("gen_")]) == 2
    # runner plumbing: the knob reaches execute_test's registrations
    assert SparkTestRunner(spark, fixture_cache_dir=cache).fixture_cache_dir == cache


def test_fixture_cache_cold_start_not_raced(spark, tmp_path, monkeypatch):
    """Parallel tests sharing one GENERATED suite fixture hit a cold
    cache together; the per-path lock in io.cache must serialize the
    probe+write so the generator runs ONCE and no thread overwrites
    another's in-flight parquet job (review finding)."""
    import threading
    import time as _time

    import sparkcheck.testing.runner as R
    from sparkcheck.io.sources import generated_fixture as real_gen
    from sparkcheck.testing.models import FixtureType, TestFixture

    calls = []

    def slow_gen(spark_, **kw):
        calls.append(1)
        _time.sleep(0.3)  # widen the race window
        return real_gen(spark_, **kw)

    monkeypatch.setattr(R, "generated_fixture", slow_gen)
    cache = str(tmp_path / "racecache")
    spec = {"n": 50, "columns": {"id": "id", "v": "int"}, "seed": 3}
    errors = []

    def _register(i):
        try:
            fx = TestFixture(name=f"g{i}", table_name=f"g{i}_tbl",
                             fixture_type=FixtureType.GENERATED, data_source=spec)
            R.register_fixture(spark, fx, cache_dir=cache)
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [threading.Thread(target=_register, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(calls) == 1  # one build; three lock-waited cache hits


def test_inline_fixture_comma_bearing_types(spark):
    from decimal import Decimal

    from sparkcheck.io import inline_fixture

    df = inline_fixture(
        spark,
        [{"id": 1, "price": Decimal("9.50"), "tags": {"a": 1}}],
        schema="id int, price decimal(10,2), tags map<string,int>",
    )
    row = df.collect()[0]
    assert row["id"] == 1 and float(row["price"]) == 9.5 and row["tags"] == {"a": 1}


def test_equals_unknown_expected_key_fails_loudly(spark):
    df = spark.sql("SELECT CAST(NULL AS INT) AS n")
    out = run_assertion(TestAssertion("equals", expected=[{"m": 5}]), df)
    assert not out.passed and "not in the result schema" in (out.error or "")


def test_is_unique_multicolumn_no_expand(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (None, "z")], "a int, b string")
    out = run_assertion(TestAssertion("is_unique"), df)  # all columns
    # a unique (NULL exempt); b has one extra 'x' -> 1 duplicate
    assert not out.passed and "1 duplicate" in str(out.actual)
    ok = run_assertion(TestAssertion("is_unique", params={"columns": ["a"]}), df)
    assert ok.passed


def test_query_equals_tolerance_grid(spark):
    a = spark.createDataFrame([(0.44,)], "v double")
    b = spark.createDataFrame([(0.4401,)], "v double")
    expect(a).query_equals(b, tolerance=0.01)  # within tol -> equal
    far = spark.createDataFrame([(0.51,)], "v double")
    with pytest.raises(SparkAssertionError):
        expect(a).query_equals(far, tolerance=0.01)


def test_comment_prefixed_select_stays_query(spark):
    from sparkcheck.testing.runner import _strip_leading_comments

    assert _strip_leading_comments("-- note\nSELECT 1").startswith("SELECT")
    assert _strip_leading_comments("/* b; */ WITH t AS (SELECT 1) SELECT * FROM t").startswith("WITH")
    assert _strip_leading_comments("-- only a comment") == ""
    df = run_sql_statements(spark, "-- pick rows\nSELECT 41 + 1 AS v")
    assert df.collect()[0]["v"] == 42
