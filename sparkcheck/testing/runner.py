"""SQL unit-test runner — the Spark counterpart of the reference's
TestExecutor (sql_testing/executor.py:22-596).

Lifecycle per test (executor.py:37-128): dependency check → fixtures →
setup SQL → test SQL → assertions → teardown → cleanup. Spark-native
choices:

- **Isolation = child session.** ``spark.newSession()`` shares the
  SparkContext (JVM, executors, cached data) but has its own temp-view
  catalog and SQL conf — the engine's analog of the reference's
  transaction/schema isolation (executor.py:447-510). Fixture views
  registered for one test are invisible to every other.
- **Parallel tests = concurrent job submission.** Spark schedules jobs
  from multiple driver threads; a FAIR scheduler pool per thread keeps
  one slow test from starving the rest (reference used asyncio
  semaphores over DB connections, executor.py:386-438).
- **Timeouts cancel server-side** via job groups
  (sparkcheck.run.retry.run_with_timeout) — executors stop burning on a
  runaway test, not just the driver thread abandoning it.
- **Fixtures are temp views over DataFrames** — lazily-planned, zero
  copy; a parquet fixture of any size costs nothing until the test SQL
  scans it (the reference CREATE TABLE + row-by-row INSERTed,
  fixtures.py:216-302 — a non-starter at Spark scale).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

from sparkcheck.io.sources import generated_fixture, inline_fixture, read_table
from sparkcheck.run.retry import run_with_timeout
from sparkcheck.testing.assertions import run_assertion
from sparkcheck.testing.models import (
    FixtureType,
    IsolationLevel,
    SQLTestCase,
    SQLTestSuite,
    SuiteResult,
    TestFixture,
    TestResult,
    TestStatus,
    split_sql_statements,
)


def _cached_generated_fixture(
    spark: SparkSession, cfg: dict, cache_dir: str
) -> DataFrame:
    """Content-hash fixture cache (the reference's enhanced_fixtures.py
    caching, re-shaped for Spark: most fixture types are lazy views and
    need no cache, but a LARGE generated fixture reused across suites
    recomputes its column expressions on every test scan). Key =
    md5(canonical JSON of the generation spec) — the generator is
    deterministic, so equal specs mean byte-equal data; the parquet
    materialization is written once (io.cache.cached_parquet: Hadoop-FS
    probe for remote cache dirs, per-path lock so PARALLEL tests sharing
    a cold suite fixture don't race the write) and every later suite
    reads it."""
    import hashlib
    import json

    from sparkcheck.io.cache import cached_parquet

    key = hashlib.md5(
        json.dumps(
            {"n": int(cfg["n"]), "columns": dict(cfg["columns"]),
             "seed": int(cfg.get("seed", 42))},
            sort_keys=True,
        ).encode()
    ).hexdigest()
    return cached_parquet(
        spark,
        cache_dir.rstrip("/") + f"/gen_{key}",
        lambda: generated_fixture(
            spark, n=int(cfg["n"]), columns=cfg["columns"],
            seed=int(cfg.get("seed", 42)),
        ),
    )


def register_fixture(
    spark: SparkSession, fixture: TestFixture, cache_dir: str | None = None
) -> DataFrame:
    """Materialize one fixture as a temp view named ``table_name``.

    Maps the reference's loaders (fixtures.py:72-161) onto Spark readers;
    the SQL type executes a .sql script statement-by-statement
    (fixtures.py:110-124) and registers the LAST statement's result.
    ``cache_dir`` enables the content-hash cache for GENERATED fixtures
    (other types are lazy views over existing data — nothing to cache).
    """
    ft = fixture.fixture_type
    if ft in (FixtureType.CSV, FixtureType.JSON, FixtureType.PARQUET):
        df = read_table(spark, str(fixture.data_source), fmt=ft.value, schema=fixture.schema)
    elif ft == FixtureType.INLINE:
        df = inline_fixture(spark, fixture.data_source, schema=fixture.schema)
    elif ft == FixtureType.GENERATED:
        cfg = dict(fixture.data_source)
        if cache_dir is not None:
            df = _cached_generated_fixture(spark, cfg, cache_dir)
        else:
            df = generated_fixture(
                spark, n=int(cfg["n"]), columns=cfg["columns"], seed=int(cfg.get("seed", 42))
            )
    elif ft == FixtureType.SQL:
        df = run_sql_script(spark, str(fixture.data_source))
        if df is None:
            raise ValueError(
                f"SQL fixture {fixture.name!r}: script produced no result frame"
            )
    else:  # pragma: no cover
        raise ValueError(f"unsupported fixture type {ft}")
    df.createOrReplaceTempView(fixture.table_name)
    return df


def run_sql_script(spark: SparkSession, path: str) -> DataFrame | None:
    """Execute a .sql file statement-by-statement (the reference's
    script fixture, fixtures.py:110-124); returns the last statement's
    frame (None if the script is empty)."""
    with open(path) as f:
        script = f.read()
    return run_sql_statements(spark, script)


def _strip_leading_comments(stmt: str) -> str:
    """Skip -- line comments and /* */ blocks so statement-kind
    classification sees the first real keyword."""
    s = stmt.lstrip()
    while True:
        if s.startswith("--"):
            nl = s.find("\n")
            if nl < 0:
                return ""
            s = s[nl + 1 :].lstrip()
        elif s.startswith("/*"):
            end = s.find("*/")
            if end < 0:
                return ""
            s = s[end + 2 :].lstrip()
        else:
            return s


def run_sql_statements(spark: SparkSession, script: str) -> DataFrame | None:
    last: DataFrame | None = None
    for stmt in split_sql_statements(script):
        last = spark.sql(stmt)
        # DDL/DML (CREATE VIEW, INSERT, SET) must execute eagerly; a
        # query (SELECT/WITH/VALUES/TABLE — even behind a comment) stays
        # LAZY for the caller: eagerly collecting a misclassified SELECT
        # would pull its full result to the driver.
        head = _strip_leading_comments(stmt).upper()
        if not head.startswith(("SELECT", "WITH", "VALUES", "TABLE", "(")):
            last.collect()
    return last


class SparkTestRunner:
    """Executes SQLTestCase / SQLTestSuite objects against a SparkSession."""

    def __init__(
        self,
        spark: SparkSession,
        max_result_rows: int = 10_000,
        fair_pool: str | None = "sparkcheck-tests",
        fixture_cache_dir: str | None = None,
    ):
        self.spark = spark
        self.max_result_rows = max_result_rows
        self.fair_pool = fair_pool
        # content-hash cache for GENERATED fixtures reused across
        # suites/tests (see _cached_generated_fixture); None = off
        self.fixture_cache_dir = fixture_cache_dir
        self._executed: set[str] = set()

    # -- single test ----------------------------------------------------
    def execute_test(
        self,
        test: SQLTestCase,
        extra_fixtures: Iterable[TestFixture] = (),
    ) -> TestResult:
        t0 = time.perf_counter()
        result = TestResult(test_name=test.name, status=TestStatus.RUNNING)

        if not test.enabled:
            result.status = TestStatus.SKIPPED
            return result
        # dependency gate (executor.py:287-292: dep must have EXECUTED)
        missing = [d for d in test.depends_on if d not in self._executed]
        if missing:
            result.status = TestStatus.SKIPPED
            result.error_message = f"dependencies not met: {', '.join(missing)}"
            return result

        session = (
            self.spark.newSession()
            if test.isolation == IsolationLevel.SESSION
            else self.spark
        )
        fixtures = [*extra_fixtures, *test.fixtures]
        registered: list[TestFixture] = []
        try:
            def _body() -> None:
                # the FAIR pool must be set HERE: _body runs inside
                # run_with_timeout's worker thread, and PySpark local
                # properties (pinned-thread mode) do not cross threads —
                # a pool set by the parallel-suite thread never reaches
                # the thread that actually submits the jobs
                if self.fair_pool:
                    session.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", self.fair_pool
                    )
                for fx in fixtures:
                    register_fixture(session, fx, cache_dir=self.fixture_cache_dir)
                    registered.append(fx)
                if test.setup_sql:
                    run_sql_statements(session, test.setup_sql)
                df = run_sql_statements(session, test.sql)
                assert df is not None  # test SQL is non-empty by model contract
                rows = df.limit(self.max_result_rows).collect()
                result.query_result = rows
                result.row_count = len(rows)
                all_passed = True
                for a in test.assertions:
                    out = run_assertion(a, df, self.max_result_rows)
                    result.assertion_results.append(out)
                    if not out.passed:
                        all_passed = False
                result.status = TestStatus.PASSED if all_passed else TestStatus.FAILED
                if test.teardown_sql:
                    try:
                        run_sql_statements(session, test.teardown_sql)
                    except Exception as e:  # teardown failure ≠ test failure
                        result.error_message = f"teardown warning: {e}"

            if test.timeout:
                run_with_timeout(session, _body, test.timeout, f"test {test.name}")
            else:
                _body()
        except Exception as e:
            result.status = TestStatus.ERROR
            result.error_message = str(e)
        finally:
            if self.fair_pool:  # don't leak the pool onto the caller thread
                session.sparkContext.setLocalProperty("spark.scheduler.pool", None)
            self._cleanup(session, registered, isolated=session is not self.spark)
            self._executed.add(test.name)
            result.execution_time = time.perf_counter() - t0
        return result

    def _cleanup(
        self, session: SparkSession, fixtures: list[TestFixture], isolated: bool
    ) -> None:
        # An isolated child session's temp catalog dies with it, but drop
        # eagerly anyway (a long-lived runner would leak view registrations).
        for fx in fixtures:
            if fx.cleanup:
                try:
                    session.catalog.dropTempView(fx.table_name)
                except Exception:
                    pass

    # -- suites -----------------------------------------------------------
    def execute_suite(self, suite: SQLTestSuite) -> SuiteResult:
        """Suite lifecycle (executor.py:294-349): suite setup → topo-ordered
        tests (parallel for independent ones if suite.parallel) → teardown.
        Suite setup/teardown SQL runs on the SHARED session so suite-level
        views are visible to non-isolated tests; isolated tests see only
        their fixtures (by design — declare suite fixtures instead)."""
        t0 = time.perf_counter()
        out = SuiteResult(suite_name=suite.name)
        tests = self._topo_sort(suite.enabled_tests())
        try:
            if suite.setup_sql:
                run_sql_statements(self.spark, suite.setup_sql)
            if suite.parallel:
                out.test_results.extend(
                    self._run_parallel(tests, suite, suite.fail_fast)
                )
            else:
                for t in tests:
                    r = self.execute_test(t, extra_fixtures=suite.fixtures)
                    out.test_results.append(r)
                    if suite.fail_fast and r.failed:
                        break
        except Exception as e:
            # suite setup failed → every unexecuted test is an error
            done = {r.test_name for r in out.test_results}
            for t in tests:
                if t.name not in done:
                    out.test_results.append(TestResult(
                        test_name=t.name, status=TestStatus.ERROR,
                        error_message=f"suite setup failed: {e}",
                    ))
        # Teardown runs after all tests have results — a failure here has
        # no unexecuted test to attach to, so surface it as a synthetic
        # suite-level ERROR result instead of reusing the setup handler
        # (which would swallow it and report the suite clean).
        if suite.teardown_sql:
            try:
                run_sql_statements(self.spark, suite.teardown_sql)
            except Exception as e:
                out.test_results.append(TestResult(
                    test_name=f"{suite.name}::teardown",
                    status=TestStatus.ERROR,
                    error_message=f"suite teardown failed: {e}",
                ))
        out.execution_time = time.perf_counter() - t0
        return out

    def _run_parallel(
        self, tests: list[SQLTestCase], suite: SQLTestSuite, fail_fast: bool
    ) -> list[TestResult]:
        """Independent tests run concurrently (each submits Spark jobs from
        its own driver thread into a FAIR pool); dependent tests run
        sequentially afterwards in topo order (executor.py:386-438)."""
        independent = [t for t in tests if not t.depends_on]
        dependent = [t for t in tests if t.depends_on]
        results: list[TestResult] = []

        def _run(t: SQLTestCase) -> TestResult:
            # pool assignment happens inside execute_test's _body (the
            # thread that submits jobs); nothing to set here
            return self.execute_test(t, extra_fixtures=suite.fixtures)

        if independent:
            with ThreadPoolExecutor(max_workers=max(1, suite.max_workers)) as pool:
                for r in pool.map(_run, independent):
                    results.append(r)
        if fail_fast and any(r.failed for r in results):
            return results
        for t in dependent:
            r = self.execute_test(t, extra_fixtures=suite.fixtures)
            results.append(r)
            if fail_fast and r.failed:
                break
        return results

    @staticmethod
    def _topo_sort(tests: list[SQLTestCase]) -> list[SQLTestCase]:
        """Dependency-first DFS ordering (executor.py:351-384);
        deterministic, ignores unknown deps."""
        by_name = {t.name: t for t in tests}
        seen: set[str] = set()
        ordered: list[SQLTestCase] = []

        def visit(name: str) -> None:
            if name in seen or name not in by_name:
                return
            seen.add(name)
            for dep in by_name[name].depends_on:
                visit(dep)
            ordered.append(by_name[name])

        for t in tests:
            visit(t.name)
        return ordered

    def clear_state(self) -> None:
        self._executed.clear()
