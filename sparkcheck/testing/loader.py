"""YAML loader for SQL test suites.

Mirrors the reference's pydantic config surface (sql_testing/models.py:
221-305 and config_loader.py) on the sparkcheck dataclasses, reusing the
shared YAML machinery from io.config: ``${ENV:default}`` interpolation
and whole-line ``!include other.yaml`` processing. Inline Python in YAML
is rejected by design (same policy as io/config.py) — custom assertions
must be registered named functions passed via ``custom_registry``.

Suite document shape::

    name: user_tests
    description: ...
    fixtures:                       # suite-level, visible to every test
      - name: users
        table_name: users
        fixture_type: inline        # csv|json|parquet|sql|inline|generated
        data_source: [{id: 1, name: Alice}, ...]
        schema: "id int, name string"
    tests:                          # alias: test_cases
      - name: test_user_count
        sql: SELECT count(*) AS n FROM users
        fixtures: [users]           # by-name refs or full fixture dicts
        assertions:
          - {type: equals, expected: [{n: 3}]}
          - {type: row_count, expected_count: 1}
        isolation_level: session    # none|session (transaction/schema→session)
        depends_on: []
        timeout: 60
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from sparkcheck.io.config import _interp, load_yaml_with_includes
from sparkcheck.testing.models import (
    SQLTestCase,
    SQLTestSuite,
    TestAssertion,
    TestFixture,
)

# reference AssertionType values (models.py:35-46) → engine names
_TYPE_ALIASES = {
    "empty": "is_empty",
    "not_empty": "is_not_empty",
    "schema_match": "schema_matches",
}

_ASSERTION_OPTION_KEYS = {"type", "expected", "message", "tolerance",
                          "ignore_order", "custom_function"}


def assertion_from_dict(
    d: Mapping[str, Any],
    custom_registry: Mapping[str, Callable] | None = None,
) -> TestAssertion:
    t = _TYPE_ALIASES.get(d["type"], d["type"])
    fn = None
    if t == "custom":
        name = d.get("custom_function")
        registry = custom_registry or {}
        if not name or name not in registry:
            raise KeyError(
                f"custom assertion references unregistered function {name!r} — "
                "inline YAML code is not executed by design"
            )
        fn = registry[name]
    params = {k: v for k, v in d.items() if k not in _ASSERTION_OPTION_KEYS}
    return TestAssertion(
        assertion_type=t,
        expected=d.get("expected"),
        message=d.get("message"),
        tolerance=d.get("tolerance"),
        ignore_order=d.get("ignore_order", True),
        params=params,
        custom_function=fn,
    )


def fixture_from_dict(d: Mapping[str, Any]) -> TestFixture:
    return TestFixture(
        name=d["name"],
        table_name=d.get("table_name", d["name"]),
        fixture_type=d["fixture_type"],
        data_source=d["data_source"],
        schema=d.get("schema"),
        cleanup=d.get("cleanup", True),
    )


def test_from_dict(
    d: Mapping[str, Any],
    named_fixtures: Mapping[str, TestFixture],
    custom_registry: Mapping[str, Callable] | None = None,
) -> SQLTestCase:
    fixtures = []
    for fx in d.get("fixtures", []):
        if isinstance(fx, str):
            if fx not in named_fixtures:
                raise KeyError(f"test {d['name']!r} references unknown fixture {fx!r}")
            fixtures.append(named_fixtures[fx])
        else:
            fixtures.append(fixture_from_dict(fx))
    return SQLTestCase(
        name=d["name"],
        sql=d["sql"],
        description=d.get("description", ""),
        fixtures=tuple(fixtures),
        assertions=tuple(
            assertion_from_dict(a, custom_registry) for a in d.get("assertions", [])
        ),
        setup_sql=d.get("setup_sql"),
        teardown_sql=d.get("teardown_sql"),
        tags=tuple(d.get("tags", ())),
        timeout=float(d.get("timeout", 300.0)),
        enabled=bool(d.get("enabled", True)),
        depends_on=tuple(d.get("depends_on", ())),
        isolation=d.get("isolation_level", d.get("isolation", "session")),
    )


def suite_from_dict(
    data: Mapping[str, Any],
    custom_registry: Mapping[str, Callable] | None = None,
) -> SQLTestSuite:
    data = _interp(dict(data))
    named = {}
    for fx in data.get("fixtures", data.get("global_fixtures", [])):
        f = fixture_from_dict(fx)
        named[f.name] = f
    # Suite-level fixtures are visible to EVERY test (models.py contract);
    # a test's by-name reference is validated but doesn't narrow the
    # scope — re-registering the same temp view is an idempotent no-op,
    # and lazily-planned views cost nothing until a test's SQL reads them.
    test_dicts = data.get("tests", data.get("test_cases", []))
    suite_fixtures = list(named.values())
    tests = tuple(test_from_dict(td, named, custom_registry) for td in test_dicts)
    return SQLTestSuite(
        name=data["name"],
        tests=tests,
        description=data.get("description", ""),
        setup_sql=data.get("setup_sql"),
        teardown_sql=data.get("teardown_sql"),
        tags=tuple(data.get("tags", ())),
        parallel=bool(data.get("parallel", False)),
        max_workers=int(data.get("max_workers", 4)),
        fail_fast=bool(data.get("fail_fast", False)),
        fixtures=tuple(suite_fixtures),
    )


def load_suite_yaml(
    path: str,
    custom_registry: Mapping[str, Callable] | None = None,
) -> SQLTestSuite:
    """Load one test suite from a YAML file (with !include + ${ENV})."""
    return suite_from_dict(load_yaml_with_includes(path), custom_registry)


def load_suites_yaml(
    path: str,
    custom_registry: Mapping[str, Callable] | None = None,
) -> list[SQLTestSuite]:
    """Load a multi-suite document ({test_suites: [...]}) or a single
    suite document."""
    data = load_yaml_with_includes(path)
    if "test_suites" in data:
        return [suite_from_dict(s, custom_registry) for s in data["test_suites"]]
    return [suite_from_dict(data, custom_registry)]
