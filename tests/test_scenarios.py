"""Named mock scenarios: FK graph composition, topo build order,
planted orphans, YAML loading, RI rule end-to-end
(reference advanced_mocking.py:546-607 scenario manager semantics)."""

from __future__ import annotations

import textwrap

import pytest

from sparkcheck.testing.scenarios import (
    MockScenario,
    ScenarioError,
    TableSpec,
    build_scenario,
    load_scenarios_yaml,
)


def test_build_scenario_fk_graph(spark):
    sc = MockScenario(
        name="shop",
        tables={
            "customers": TableSpec(rows=50, columns={"id": "id", "name": "string"}),
            "orders": TableSpec(
                rows=400, columns={"id": "id", "customer_id": "fk:customers",
                                   "amount": "double"},
            ),
        },
    )
    frames = build_scenario(spark, sc)
    assert set(frames) == {"customers", "orders"}
    # every FK value hits a parent id (no orphans without orphan=)
    orphans = (
        frames["orders"]
        .join(frames["customers"].select("id"),
              frames["orders"].customer_id == frames["customers"].id, "left_anti")
        .count()
    )
    assert orphans == 0
    # deterministic: same spec → identical rows
    again = build_scenario(spark, sc)
    assert frames["orders"].exceptAll(again["orders"]).count() == 0


def test_scenario_orphan_injection_feeds_ri_rule(spark):
    """Scenario with planted orphans drives a ReferentialIntegrityRule
    end-to-end through ValidationEngine — the rule must both count the
    planted orphans and fail."""
    from sparkcheck.rules import ReferentialIntegrityRule, RuleSet
    from sparkcheck.run import ValidationEngine

    sc = MockScenario(
        name="ri",
        tables={
            "parents": TableSpec(rows=100, columns={"id": "id"}),
            "children": TableSpec(
                rows=2000,
                columns={"id": "id", "pid": "fk:parents:orphan=10"},
            ),
        },
    )
    frames = build_scenario(spark, sc)
    rs = RuleSet(name="ri", rules=(ReferentialIntegrityRule(
        name="children_pid_fk", child_table="children", child_column="pid",
        parent_table="parents", parent_column="id",
    ),))
    report = ValidationEngine(spark).run(rs, frames, default_table="children")
    out = report.outcomes[0]
    assert not out.passed
    # ~10% of 2000 planted orphans; hash-uniform ⇒ loose bounds
    assert 120 <= out.violations <= 280
    # planted FKs are shifted PAST the parent range — provably orphan
    mx = frames["children"].agg({"pid": "max"}).collect()[0][0]
    assert mx >= 100


def test_scenario_topo_and_errors(spark):
    tri = MockScenario(
        name="chain",
        tables={
            "c": TableSpec(rows=10, columns={"id": "id", "b_id": "fk:b"}),
            "b": TableSpec(rows=10, columns={"id": "id", "a_id": "fk:a"}),
            "a": TableSpec(rows=10, columns={"id": "id"}),
        },
    )
    frames = build_scenario(spark, tri)  # builds despite declaration order
    assert list(frames) == ["a", "b", "c"]

    with pytest.raises(ScenarioError, match="unknown table"):
        build_scenario(spark, MockScenario(
            name="bad", tables={"x": TableSpec(rows=1, columns={"k": "fk:nope"})}
        ))
    with pytest.raises(ScenarioError, match="circular"):
        build_scenario(spark, MockScenario(
            name="cyc",
            tables={"x": TableSpec(rows=1, columns={"k": "fk:y"}),
                    "y": TableSpec(rows=1, columns={"k": "fk:x"})},
        ))


def test_load_scenarios_yaml_and_views(spark, tmp_path):
    p = tmp_path / "scenarios.yaml"
    p.write_text(textwrap.dedent("""\
        scenarios:
          - name: orders_with_customers
            description: parent/child
            tables:
              customers:
                rows: 20
                columns: {id: id, tier: "category:gold|silver"}
              orders:
                rows: 100
                columns: {id: id, customer_id: "fk:customers", amount: double}
    """))
    scenarios = load_scenarios_yaml(str(p))
    sc = scenarios["orders_with_customers"]
    assert sc.tables["orders"].rows == 100
    build_scenario(spark, sc, register_views=True)
    n = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN customers c ON o.customer_id = c.id"
    ).collect()[0]["n"]
    assert n == 100  # every order joins exactly one customer
    spark.catalog.dropTempView("orders")
    spark.catalog.dropTempView("customers")


def test_cli_mock_materializes_scenario(spark, tmp_path):
    import json as _json
    import textwrap

    from sparkcheck.cli import main

    p = tmp_path / "sc.yaml"
    p.write_text(textwrap.dedent("""\
        scenarios:
          - name: tiny
            tables:
              parents: {rows: 5, columns: {id: id}}
              kids: {rows: 30, columns: {id: id, pid: "fk:parents"}}
    """))
    out = tmp_path / "data"
    assert main(["mock", "--scenarios", str(p), "--out", str(out)]) == 0
    kids = spark.read.parquet(str(out / "kids"))
    parents = spark.read.parquet(str(out / "parents"))
    assert kids.count() == 30 and parents.count() == 5
    assert kids.join(parents, kids.pid == parents.id, "left_anti").count() == 0
    assert main(["mock", "--scenarios", str(p), "--scenario", "nope",
                 "--out", str(out)]) == 1
