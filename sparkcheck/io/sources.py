"""Table sources.

Maps the reference's fixture loaders (sql_testing/fixtures.py:72-161) to
Spark readers. The Faker-based generator (:144-161, 333-423) is replaced
by a fully deterministic ``spark.range`` + hash-expression generator —
reproducible at any scale and parallelism, no Python in the data path.
Iceberg at production scale: ``spark.read.format("iceberg")`` needs the
runtime jar — gated behind a try so the sandbox (plain parquet) works.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: Any,
) -> DataFrame:
    """Read a table: parquet (default, full pushdown), csv (header on,
    explicit schema preferred — never inferSchema in production), json,
    or iceberg (if the runtime is on the classpath)."""
    if fmt == "parquet":
        return spark.read.options(**options).parquet(path)
    if fmt == "csv":
        reader = spark.read.options(header=True, **options)
        if schema:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        return reader.csv(path)
    if fmt == "json":
        reader = spark.read.options(**options)
        if schema:
            reader = reader.schema(schema)
        return reader.json(path)
    if fmt == "orc":
        return spark.read.options(**options).orc(path)
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").options(**options).load(path)
        except Exception as e:  # pragma: no cover - no iceberg jar in sandbox
            raise RuntimeError(
                "iceberg runtime jar not on classpath; at cluster scale add "
                "org.apache.iceberg:iceberg-spark-runtime and a catalog config"
            ) from e
    raise ValueError(f"unknown format {fmt!r}")


def inline_fixture(
    spark: SparkSession, rows: Sequence[Mapping[str, Any]], schema: str | None = None
) -> DataFrame:
    """List-of-dicts fixture (fixtures.py:126-142)."""
    if schema:
        names = _ddl_field_names(schema)
        ordered = [tuple(r.get(n) for n in names) for r in rows]
        return spark.createDataFrame(ordered, schema)
    return spark.createDataFrame([dict(r) for r in rows])


def _ddl_field_names(schema: str) -> list[str]:
    """Top-level field names from a DDL ("id int, price decimal(10,2)",
    "m map<string,int>") or colon ("id: int") schema string — commas
    inside (), <> nesting are NOT field separators."""
    fields: list[str] = []
    depth = 0
    buf: list[str] = []
    for ch in schema:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        fields.append("".join(buf))
    return [f.strip().split(":")[0].split()[0] for f in fields]


def generated_fixture(
    spark: SparkSession,
    n: int,
    columns: Mapping[str, str],
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic mock-data generator (replaces the reference's Faker
    mock system, sql_testing/fixtures.py:333-423 and the distribution /
    relationship features of sql_testing/advanced_mocking.py): every
    column derives from xxhash64(id, seed) — same rows at any
    parallelism, no Python in the data path.

    Column spec values:
      'id'                  — the row number 0..n-1 (a generated PK)
      'int' | 'double' | 'string' | 'email' | 'bool'
      'category:a|b|c'      — uniform pick
      'fk:<parent_n>'       — uniform int in [0, parent_n): joins cleanly
                              to a parent generated with that many 'id'
                              rows (advanced_mocking's relationships)
      'normal:<mean>:<std>' — Gaussian via Box–Muller over two hash
                              uniforms (deterministic)
      'zipf:<n>'            — log-uniform over 1..n (≈ Zipf(s=1) ranks):
                              the skewed-key generator for salting tests
      'null:<pct>:<kind>'   — NULL with probability pct/100, else <kind>
    """
    df = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    def _col(kind: str, i: int, salt: int = 0) -> F.Column:
        h = F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(i), F.lit(salt)))
        # uniform in [0, 1) with 2^30 resolution
        u = F.pmod(h, F.lit(1 << 30)) / float(1 << 30)
        if kind == "id":
            return F.col("id")
        if kind == "int":
            return F.pmod(h, F.lit(10_000)).cast("int")
        if kind == "double":
            return F.pmod(h, F.lit(1_000_000)) / 100.0
        if kind == "bool":
            return F.pmod(h, F.lit(2)) == 0
        if kind == "string":
            return F.concat(F.lit("s_"), F.pmod(h, F.lit(100_000)).cast("string"))
        if kind == "email":
            return F.concat(F.lit("user"), F.pmod(h, F.lit(100_000)).cast("string"),
                            F.lit("@example.com"))
        if kind.startswith("category:"):
            values = kind.split(":", 1)[1].split("|")
            arr = F.array(*[F.lit(v) for v in values])
            return F.element_at(arr, (F.pmod(h, F.lit(len(values))) + 1).cast("int"))
        if kind.startswith("fk:"):
            parent_n = int(kind.split(":", 1)[1])
            return F.pmod(h, F.lit(parent_n))
        if kind.startswith("normal:"):
            _, mean, std = kind.split(":")
            u2 = F.pmod(F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(i),
                                         F.lit(salt + 1))),
                        F.lit(1 << 30)) / float(1 << 30)
            # Box–Muller; clamp u away from 0 so log() stays finite
            z = (F.sqrt(-2.0 * F.log(F.greatest(u, F.lit(1e-12))))
                 * F.cos(2.0 * 3.141592653589793 * u2))
            return F.lit(float(mean)) + F.lit(float(std)) * z
        if kind.startswith("zipf:"):
            zn = int(kind.split(":", 1)[1])
            # inverse-CDF of the log-uniform distribution over [1, n]:
            # rank k drawn with P ∝ 1/k (Zipf s=1 up to normalization)
            import math as _m

            return F.floor(F.exp(u * _m.log(zn))).cast("long")
        if kind.startswith("null:"):
            _, pct, inner = kind.split(":", 2)
            return F.when(u < float(pct) / 100.0, F.lit(None)).otherwise(
                _col(inner, i, salt + 7)
            )
        raise ValueError(f"unknown column kind {kind!r}")

    cols = [
        _col(kind, i).alias(name)
        for i, (name, kind) in enumerate(sorted(columns.items()))
    ]
    return df.select(*cols)
