"""Data model for the SQL unit-testing framework.

Re-expresses the reference's sql_testing/models.py:16-217 (TestStatus,
FixtureType, TestFixture, TestAssertion, SQLTest, TestSuite, TestResult,
TestSuiteResult) for Spark. Differences, all deliberate:

- Isolation levels collapse to {none, session}: Spark has no transactions
  or schemas to roll back; ``spark.newSession()`` gives each test an
  isolated temp-view catalog + SQL conf over the SHARED SparkContext —
  the engine-native analog of the reference's transaction/schema
  isolation (models.py:49-54). "transaction"/"schema"/"database" from
  reference-style configs map onto "session".
- ``query_result`` holds collected Rows (small by contract: test SQL
  returns verdict-sized frames), never a full-table collect — the runner
  caps the fetch (`max_result_rows`).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping


class TestStatus(str, enum.Enum):
    """Test execution status (reference models.py:16-23)."""

    __test__ = False  # not a pytest class

    PENDING = "pending"
    RUNNING = "running"
    PASSED = "passed"
    FAILED = "failed"
    SKIPPED = "skipped"
    ERROR = "error"


class FixtureType(str, enum.Enum):
    """Fixture kinds (reference models.py:26-32)."""

    CSV = "csv"
    JSON = "json"
    PARQUET = "parquet"  # Spark-native addition: the production format
    SQL = "sql"          # .sql script file, executed statement-by-statement
    INLINE = "inline"
    GENERATED = "generated"


class IsolationLevel(str, enum.Enum):
    """Spark-native isolation (see module docstring)."""

    NONE = "none"
    SESSION = "session"

    @classmethod
    def coerce(cls, v: "IsolationLevel | str") -> "IsolationLevel":
        if isinstance(v, cls):
            return v
        # reference levels (models.py:49-54) map to their Spark analog
        return cls.NONE if str(v) == "none" else cls.SESSION


@dataclass(frozen=True)
class TestFixture:
    """A table made available to the test (reference models.py:57-74).

    data_source by type:
      csv/json/parquet — file path (read via io.sources.read_table)
      sql              — .sql script path; statements run in order, the
                         final SELECT's result becomes the fixture table
      inline           — list[dict] rows
      generated        — {"n": int, "columns": {...}, "seed": int} for the
                         deterministic generator (io.sources.generated_fixture)
    """

    __test__ = False  # not a pytest class

    name: str
    table_name: str
    fixture_type: FixtureType
    data_source: Any
    schema: str | None = None  # Spark DDL string ("id int, name string")
    cleanup: bool = True

    def __post_init__(self) -> None:
        ft = FixtureType(self.fixture_type)
        object.__setattr__(self, "fixture_type", ft)
        if ft in (FixtureType.CSV, FixtureType.JSON, FixtureType.PARQUET, FixtureType.SQL):
            if not isinstance(self.data_source, str):
                raise ValueError(f"fixture type {ft.value} requires a path data_source")
        if ft == FixtureType.INLINE and not isinstance(self.data_source, (list, tuple)):
            raise ValueError("inline fixture requires list-of-dicts data_source")
        if ft == FixtureType.GENERATED and not isinstance(self.data_source, Mapping):
            raise ValueError("generated fixture requires a mapping data_source")


@dataclass(frozen=True)
class TestAssertion:
    """One declarative assertion (reference models.py:77-90, widened to
    the 26-type engine of assertions/engine.py:32-59). ``params`` carries
    type-specific options (expected_count/min_count/max_count, column,
    min/max, pattern, expected_columns/expected_types/strict_order/
    allow_extra_columns, ...)."""

    __test__ = False  # not a pytest class

    assertion_type: str
    expected: Any = None
    message: str | None = None
    tolerance: float | None = None
    ignore_order: bool = True
    params: Mapping[str, Any] = field(default_factory=dict)
    custom_function: Callable[..., Any] | None = None

    def __post_init__(self) -> None:
        if self.assertion_type == "custom" and self.custom_function is None:
            raise ValueError("custom assertion requires custom_function")


@dataclass(frozen=True)
class SQLTestCase:
    """A complete SQL unit test (reference models.py:93-114).

    ``sql`` may contain multiple ;-separated statements; the LAST
    statement's result is the frame assertions run against.
    """

    name: str
    sql: str
    description: str = ""
    fixtures: tuple[TestFixture, ...] = ()
    assertions: tuple[TestAssertion, ...] = ()
    setup_sql: str | None = None
    teardown_sql: str | None = None
    tags: tuple[str, ...] = ()
    timeout: float = 300.0
    enabled: bool = True
    depends_on: tuple[str, ...] = ()
    isolation: IsolationLevel = IsolationLevel.SESSION

    def __post_init__(self) -> None:
        if not self.sql.strip():
            raise ValueError("test SQL cannot be empty")
        object.__setattr__(self, "isolation", IsolationLevel.coerce(self.isolation))
        object.__setattr__(self, "fixtures", tuple(self.fixtures))
        object.__setattr__(self, "assertions", tuple(self.assertions))
        object.__setattr__(self, "tags", tuple(self.tags))
        object.__setattr__(self, "depends_on", tuple(self.depends_on))


@dataclass(frozen=True)
class SQLTestSuite:
    """A collection of tests (reference models.py:160-180)."""

    name: str
    tests: tuple[SQLTestCase, ...]
    description: str = ""
    setup_sql: str | None = None
    teardown_sql: str | None = None
    tags: tuple[str, ...] = ()
    parallel: bool = False
    max_workers: int = 4
    fail_fast: bool = False
    fixtures: tuple[TestFixture, ...] = ()  # suite-level, visible to every test

    def __post_init__(self) -> None:
        object.__setattr__(self, "tests", tuple(self.tests))
        object.__setattr__(self, "fixtures", tuple(self.fixtures))

    def tests_by_tag(self, tag: str) -> list[SQLTestCase]:
        return [t for t in self.tests if tag in t.tags]

    def enabled_tests(self) -> list[SQLTestCase]:
        return [t for t in self.tests if t.enabled]


@dataclass
class AssertionOutcome:
    """Result of one assertion (reference executor.py:191-208 dict shape)."""

    assertion_type: str
    passed: bool
    expected: Any = None
    actual: Any = None
    message: str = ""
    error: str | None = None

    def as_dict(self) -> dict[str, Any]:
        return {
            "assertion_type": self.assertion_type,
            "passed": self.passed,
            "expected": self.expected,
            "actual": self.actual,
            "message": self.message,
            "error": self.error,
        }


@dataclass
class TestResult:
    """Result of one test (reference models.py:117-152)."""

    __test__ = False  # not a pytest class

    test_name: str
    status: TestStatus
    execution_time: float = 0.0
    error_message: str | None = None
    assertion_results: list[AssertionOutcome] = field(default_factory=list)
    query_result: list[Any] | None = None  # collected Rows, capped
    row_count: int | None = None

    @property
    def passed(self) -> bool:
        return self.status == TestStatus.PASSED

    @property
    def failed(self) -> bool:
        return self.status in (TestStatus.FAILED, TestStatus.ERROR)


@dataclass
class SuiteResult:
    """Result of a suite run (reference models.py:183-217)."""

    suite_name: str
    test_results: list[TestResult] = field(default_factory=list)
    execution_time: float = 0.0

    def _count(self, *statuses: TestStatus) -> int:
        return sum(1 for r in self.test_results if r.status in statuses)

    @property
    def total_tests(self) -> int:
        return len(self.test_results)

    @property
    def passed_tests(self) -> int:
        return self._count(TestStatus.PASSED)

    @property
    def failed_tests(self) -> int:
        return self._count(TestStatus.FAILED)

    @property
    def skipped_tests(self) -> int:
        return self._count(TestStatus.SKIPPED)

    @property
    def error_tests(self) -> int:
        return self._count(TestStatus.ERROR)

    @property
    def success_rate(self) -> float:
        return self.passed_tests / self.total_tests if self.total_tests else 0.0


def split_sql_statements(script: str) -> list[str]:
    """Split a SQL script into statements on ';', respecting single/double
    quotes, backticks, ``--`` line comments and ``/* */`` block comments
    (the reference executed whole files through its DB driver,
    sql_testing/fixtures.py:110-124; Spark needs one statement per
    ``spark.sql`` call)."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    quote: str | None = None
    comment_open = -1  # index of the '/' that opened the current /* block
    while i < n:
        ch = script[i]
        if quote:
            buf.append(ch)
            # the closing '*/' must start after the opener's own '*'
            # (guards '/*/': there script[i-1] IS the opener's '*')
            if (
                quote == "*/"
                and ch == "/"
                and script[i - 1] == "*"
                and i - 1 > comment_open + 1
            ):
                quote = None
            elif quote == "\n" and ch == "\n":
                quote = None
            elif ch == quote:
                # doubled quote = escaped quote inside literal
                if i + 1 < n and script[i + 1] == quote:
                    buf.append(script[i + 1])
                    i += 1
                else:
                    quote = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            quote = ch
            buf.append(ch)
        elif ch == "-" and script[i : i + 2] == "--":
            quote = "\n"
            buf.append(ch)
        elif ch == "/" and script[i : i + 2] == "/*":
            quote = "*/"
            comment_open = i
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    stmt = "".join(buf).strip()
    if stmt:
        out.append(stmt)
    return out
