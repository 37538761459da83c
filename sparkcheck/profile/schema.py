"""Schema introspection + declared-schema conformance.

The reference introspects live DB schemas via SQLAlchemy
(db/schema_introspector.py:168-455) and asserts schema shape
(assertions/engine.py:977-1034 ``schema_matches``). Spark equivalent:
the schema is already on the DataFrame (Iceberg/parquet metadata — zero
data read), so introspection is a driver-side projection of
``df.schema`` and conformance is a plan-time set/type comparison.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def schema_report(spark: SparkSession, df: DataFrame, table_name: str = "table") -> DataFrame:
    """(table, column, data_type, nullable) — one row per column, built
    from metadata only (no job runs)."""
    rows = [
        (table_name, f.name, f.dataType.simpleString(), f.nullable)
        for f in df.schema.fields
    ]
    return spark.createDataFrame(rows, "table string, column string, data_type string, nullable boolean")


@dataclass
class SchemaDiff:
    missing: list[str] = field(default_factory=list)       # expected, absent
    unexpected: list[str] = field(default_factory=list)    # present, undeclared
    type_mismatch: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def matches(self) -> bool:
        return not (self.missing or self.unexpected or self.type_mismatch)


def schema_matches(
    df: DataFrame,
    expected: dict[str, str],
    allow_extra: bool = False,
) -> SchemaDiff:
    """Compare against {column: spark_type_simple_string}. The analog of
    assertions/engine.py:977-1034 — a PLAN-TIME gate to run before any
    rule job, so a drifted upstream schema fails fast and cheap."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    diff = SchemaDiff()
    for c, t in expected.items():
        if c not in actual:
            diff.missing.append(c)
        elif actual[c] != t:
            diff.type_mismatch.append((c, t, actual[c]))
    if not allow_extra:
        diff.unexpected = [c for c in actual if c not in expected]
    return diff
