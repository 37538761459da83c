"""Named mock scenarios — multi-table fixture sets composed from the
deterministic generator, with FK relationship graphs.

The Spark analog of the reference's scenario manager + relationship
features (sql_testing/advanced_mocking.py:546-607 MockScenarioManager,
:25-120 scenario registry; data relationships in its DataSourceMock).
The reference mocked a DB connection and replayed pandas frames; here a
scenario IS a set of lazily-planned DataFrames from
``sparkcheck.io.sources.generated_fixture`` — same rows at any
parallelism, no Python in the data path, any size for free.

FK columns may reference sibling tables by name:

    ``fk:<table>``                — uniform over the parent's rows
                                    (parent ids are 0..n-1)
    ``fk:<table>:orphan=<pct>``   — additionally, ~pct% of rows get an
                                    id ≥ parent rows (guaranteed
                                    orphans, for exercising RI rules)

Tables build in dependency order (topo sort over FK references); cycles
are an error. Plain ``fk:<int>`` specs from generated_fixture still
work untouched.

YAML shape (load_scenarios_yaml)::

    scenarios:
      - name: orders_with_customers
        description: parent/child with 2% planted orphans
        tables:
          customers:
            rows: 100
            columns: {id: id, name: string, tier: "category:gold|silver"}
          orders:
            rows: 1000
            columns: {id: id, customer_id: "fk:customers:orphan=2", amount: double}
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkcheck.io.sources import generated_fixture

_FK_TABLE_RE = re.compile(r"^fk:(?P<table>[A-Za-z_]\w*)(?::orphan=(?P<pct>\d+(?:\.\d+)?))?$")


@dataclass(frozen=True)
class TableSpec:
    rows: int
    columns: Mapping[str, str]
    seed: int = 42
    num_partitions: int | None = None


@dataclass(frozen=True)
class MockScenario:
    name: str
    tables: Mapping[str, TableSpec]
    description: str = ""


class ScenarioError(ValueError):
    pass


def _fk_refs(spec: TableSpec) -> dict[str, tuple[str, float]]:
    """column -> (parent table, orphan pct) for table-name FK specs."""
    out: dict[str, tuple[str, float]] = {}
    for col, kind in spec.columns.items():
        m = _FK_TABLE_RE.match(kind)
        if m:
            out[col] = (m.group("table"), float(m.group("pct") or 0.0))
    return out


def _topo_tables(scenario: MockScenario) -> list[str]:
    """Parents before children; unknown references and cycles error."""
    deps = {
        name: {t for t, _ in _fk_refs(spec).values()}
        for name, spec in scenario.tables.items()
    }
    for name, parents in deps.items():
        missing = parents - set(deps)
        if missing:
            raise ScenarioError(
                f"scenario {scenario.name!r}: table {name!r} references "
                f"unknown table(s) {sorted(missing)}"
            )
    order: list[str] = []
    seen: set[str] = set()
    while len(order) < len(deps):
        progress = [
            n for n in deps if n not in seen and deps[n] <= seen
        ]
        if not progress:
            cyc = sorted(set(deps) - seen)
            raise ScenarioError(
                f"scenario {scenario.name!r}: circular FK references among {cyc}"
            )
        for n in sorted(progress):
            order.append(n)
            seen.add(n)
    return order


def build_scenario(
    spark: SparkSession,
    scenario: MockScenario,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Materialize every table of a scenario (lazily — each DataFrame is
    a plan over ``spark.range``), resolving table-name FKs to the
    parent's row count. ``register_views=True`` additionally registers
    each as a temp view under its table name, so scenario tables drop
    straight into SQL tests / ValidationEngine runs."""
    order = _topo_tables(scenario)
    out: dict[str, DataFrame] = {}
    for name in order:
        spec = scenario.tables[name]
        refs = _fk_refs(spec)
        columns = dict(spec.columns)
        orphan_cols: dict[str, tuple[int, float]] = {}
        for col, (parent, pct) in refs.items():
            parent_rows = scenario.tables[parent].rows
            # resolve to the numeric form generated_fixture understands
            columns[col] = f"fk:{parent_rows}"
            if pct > 0:
                orphan_cols[col] = (parent_rows, pct)
        df = generated_fixture(
            spark, spec.rows, columns, seed=spec.seed,
            num_partitions=spec.num_partitions,
        )
        # planted orphans: deterministically shift ~pct% of FK values
        # past the parent's id range — guaranteed misses for RI rules
        for col, (parent_rows, pct) in orphan_cols.items():
            u = (
                F.pmod(
                    F.abs(F.xxhash64(F.col(col), F.lit(spec.seed), F.lit(col))),
                    F.lit(1 << 30),
                )
                / float(1 << 30)
            )
            df = df.withColumn(
                col,
                F.when(u < pct / 100.0, F.col(col) + F.lit(parent_rows)).otherwise(
                    F.col(col)
                ),
            )
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def load_scenarios_yaml(path: str) -> dict[str, MockScenario]:
    """Parse a scenarios YAML file (``!include`` supported, same loader
    as rule configs) into named MockScenario objects."""
    from sparkcheck.io.config import load_yaml_with_includes

    raw = load_yaml_with_includes(path) or {}
    scenarios = raw.get("scenarios")
    if not isinstance(scenarios, list):
        raise ScenarioError(f"{path}: expected a top-level 'scenarios' list")
    out: dict[str, MockScenario] = {}
    for s in scenarios:
        name = s.get("name")
        if not name:
            raise ScenarioError(f"{path}: scenario without a name")
        tables = {}
        for tname, t in (s.get("tables") or {}).items():
            if "rows" not in t or "columns" not in t:
                raise ScenarioError(
                    f"{path}: scenario {name!r} table {tname!r} needs rows + columns"
                )
            tables[tname] = TableSpec(
                rows=int(t["rows"]),
                columns=dict(t["columns"]),
                seed=int(t.get("seed", 42)),
                num_partitions=t.get("num_partitions"),
            )
        out[name] = MockScenario(
            name=name, tables=tables, description=s.get("description", "")
        )
    return out
