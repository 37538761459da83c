"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same parquet, compare row-count + column names + sorted values.

Usage: python scripts/check_oracle.py [--json out.json] [sf_dir] [only_query ...]

--json writes the per-query results in the driver's CORRECTNESS_r{N}
shape, so a FULL 58-query artifact can be committed each round (the
driver's own gate samples only 50 — ADVICE r3 #2).
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from sparkcheck.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {e}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: no oracle; spark rows={len(srows)}")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": None}
            continue
        try:
            # fetchall() (NOT fetchdf) preserves SQL NULL as None and NaN as
            # float('nan') — pandas would render both as NaN, silently
            # passing a Spark-NULL vs oracle-NaN mismatch. Same norm() both
            # sides: None→None, NaN→"NaN".
            cur = con.execute(oracles[name])
            ocols_raw = [d[0] for d in cur.description]
            oraw = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": None, "err": f"duckdb: {e}"}
            failures += 1
            continue
        ocols = sorted(ocols_raw)
        if ocols != scols:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": len(oraw), "err": None}
            failures += 1
            continue
        perm = [ocols_raw.index(c) for c in ocols]
        orows = sorted(
            tuple(norm(row[i].item() if hasattr(row[i], "item") else row[i])
                  for i in perm)
            for row in oraw
        )
        if len(orows) != len(sset):
            print(f"FAIL  {name}: rows spark={len(sset)} oracle={len(orows)}")
            results[name] = {"rows_match": False, "schema_match": True,
                             "hash_match": False, "spark_rows": len(sset),
                             "oracle_rows": len(orows), "err": None}
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(sset, orows) if a != b]
        results[name] = {"rows_match": True, "schema_match": True,
                         "hash_match": not bad, "spark_rows": len(sset),
                         "oracle_rows": len(orows), "err": None}
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(sset)} value mismatches; first: "
                  f"spark={bad[0][0]} oracle={bad[0][1]}")
            failures += 1
        else:
            print(f"OK    {name}: {len(sset)} rows")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
