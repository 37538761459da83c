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
    mock system, sql_testing/fixtures.py:333-423): every column derives
    from xxhash64(id, seed) — same rows at any parallelism.

    Column spec values: 'int' | 'double' | 'string' | 'email' | 'bool'
    | 'category:a|b|c' | 'id'.
    """
    df = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    cols = []
    for i, (name, kind) in enumerate(sorted(columns.items())):
        h = F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(i)))
        if kind == "id":
            cols.append(F.col("id").alias(name))
        elif kind == "int":
            cols.append(F.pmod(h, F.lit(10_000)).cast("int").alias(name))
        elif kind == "double":
            cols.append((F.pmod(h, F.lit(1_000_000)) / 100.0).alias(name))
        elif kind == "bool":
            cols.append((F.pmod(h, F.lit(2)) == 0).alias(name))
        elif kind == "string":
            cols.append(F.concat(F.lit("s_"), F.pmod(h, F.lit(100_000)).cast("string")).alias(name))
        elif kind == "email":
            cols.append(
                F.concat(F.lit("user"), F.pmod(h, F.lit(100_000)).cast("string"),
                         F.lit("@example.com")).alias(name)
            )
        elif kind.startswith("category:"):
            values = kind.split(":", 1)[1].split("|")
            arr = F.array(*[F.lit(v) for v in values])
            cols.append(F.element_at(arr, (F.pmod(h, F.lit(len(values))) + 1).cast("int")).alias(name))
        else:
            raise ValueError(f"unknown column kind {kind!r}")
    return df.select(*cols)
