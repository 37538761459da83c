"""SQL unit-testing framework — the reference's namesake feature
(sql_testing/executor.py, fixtures.py, models.py; assertions/engine.py)
re-expressed for Spark: fixtures become temp views over lazily-planned
DataFrames, isolation becomes child SparkSessions, assertions compile to
Spark aggregations that collect only verdicts."""

from sparkcheck.testing.assertions import (
    Expectation,
    SparkAssertionError,
    expect,
    run_assertion,
)
from sparkcheck.testing.loader import (
    assertion_from_dict,
    fixture_from_dict,
    load_suite_yaml,
    load_suites_yaml,
    suite_from_dict,
)
from sparkcheck.testing.models import (
    AssertionOutcome,
    FixtureType,
    IsolationLevel,
    SQLTestCase,
    SQLTestSuite,
    SuiteResult,
    TestAssertion,
    TestFixture,
    TestResult,
    TestStatus,
    split_sql_statements,
)
from sparkcheck.testing.benchmark import (
    BenchmarkResult,
    benchmark_concurrent,
    benchmark_query,
    regression_gate,
)
from sparkcheck.testing.report import (
    render_suite_html,
    suite_to_junit_xml,
    write_junit_xml,
)
from sparkcheck.testing.scenarios import (
    MockScenario,
    ScenarioError,
    TableSpec,
    build_scenario,
    load_scenarios_yaml,
)
from sparkcheck.testing.runner import (
    SparkTestRunner,
    register_fixture,
    run_sql_script,
    run_sql_statements,
)

__all__ = [
    "AssertionOutcome",
    "BenchmarkResult",
    "benchmark_concurrent",
    "benchmark_query",
    "regression_gate",
    "Expectation",
    "FixtureType",
    "IsolationLevel",
    "SQLTestCase",
    "SQLTestSuite",
    "SparkAssertionError",
    "SparkTestRunner",
    "SuiteResult",
    "TestAssertion",
    "TestFixture",
    "TestResult",
    "TestStatus",
    "assertion_from_dict",
    "expect",
    "fixture_from_dict",
    "load_suite_yaml",
    "load_suites_yaml",
    "register_fixture",
    "render_suite_html",
    "suite_to_junit_xml",
    "write_junit_xml",
    "run_assertion",
    "run_sql_script",
    "run_sql_statements",
    "split_sql_statements",
    "suite_from_dict",
    "MockScenario",
    "ScenarioError",
    "TableSpec",
    "build_scenario",
    "load_scenarios_yaml",
]
