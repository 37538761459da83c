"""Skew-handling evidence: salted two-phase vs plain aggregation on a
Zipf-skewed key, at full local parallelism.

Workload: exact distinct-URL count per url-host where ONE host owns 40%
of all rows (the north rule's "skewed url-host partitions"). The plain
plan funnels the hot host's final dedup into one reducer; the salted
plan (hash-of-value salt, exact by construction) spreads it across 64.

Prints one JSON line and appends a section to BENCH/BASELINE.md.
Usage: python scripts/bench_skew.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from sparkcheck.integrity import distinct_count_by_key
from sparkcheck.session import get_spark


def skewed_table(spark, n: int):
    """40% of rows on host-HOT, the rest Zipf-ish over 100k hosts; every
    row a distinct url. Deterministic."""
    df = spark.range(0, n, 1, 64)
    host = F.when(
        F.col("id") % 5 <= 1, F.lit("host-HOT")
    ).otherwise(
        F.concat(F.lit("host-"), F.pmod(F.xxhash64("id"), F.lit(100_000)).cast("string"))
    )
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("id").cast("string"))
    return df.select(host.alias("host"), url.alias("url"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="skew-bench", master=f"local[{cpus}]")
    df = skewed_table(spark, n)
    df.count()  # warm codegen

    results = {}
    checks = {}
    for mode, salted in (("plain", False), ("salted", True)):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = distinct_count_by_key(df, "host", "url", salted=salted)
            hot = out.where(F.col("host") == "host-HOT").collect()[0]["ndv"]
            best = min(best, time.perf_counter() - t0)
        results[mode] = round(best, 2)
        checks[mode] = hot

    assert checks["plain"] == checks["salted"], "salted plan must be exact"
    line = {
        "rows": n,
        "hot_key_share": 0.4,
        "plain_sec": results["plain"],
        "salted_sec": results["salted"],
        "speedup": round(results["plain"] / results["salted"], 2),
        "hot_host_distinct_urls": checks["plain"],
    }
    print(json.dumps(line))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write(f"""# BENCH/SKEW — salted two-phase aggregation

Exact distinct-URL count per url-host on {n:,} rows where one host owns
40% of the corpus (every row a distinct url), local[{cpus}]:

| plan | wall sec |
|---|---|
| plain `groupBy(host).count_distinct(url)` (hot host -> 1 reducer) | {line["plain_sec"]} |
| salted two-phase (`pmod(xxhash64(url), 64)` salt, exact) | {line["salted_sec"]} |

**Speedup {line["speedup"]}x**, identical results (hot-host ndv
{line["hot_host_distinct_urls"]:,} in both plans). At 10^12 rows the plain
plan's hot reducer holds ~4x10^11 values — it does not finish; the salted
plan is the only viable shape. Reproduce: `python scripts/bench_skew.py`.
""")
    print("wrote BENCH/SKEW.md")


if __name__ == "__main__":
    main()
