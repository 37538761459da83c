"""Noise analysis for the two bench entries the round-2 verdict flagged
as unstable across rounds (webtext_unique_url +20%, profile_stats
r02 > r01): measure each 8× INTERLEAVED (so a host load spike hits all
entries equally, not one), alongside a fixed pure-CPU calibration job,
and report min/median/max. Results → BENCH/NOISE.md.

Run: python scripts/bench_noise.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from sparkcheck.integrity import uniqueness_summary
from sparkcheck.session import get_spark


def calibration() -> float:
    """Fixed single-thread CPU burn — varies only with host load."""
    t0 = time.perf_counter()
    x = 0
    for i in range(4_000_000):
        x = (x * 1103515245 + i) % (1 << 31)
    return time.perf_counter() - t0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-noise")
    qs = entrymod.queries()

    # same webtext parquet the bench uses
    from bench import WEBTEXT_N, webtext_parquet

    wt = spark.read.parquet(webtext_parquet(spark, WEBTEXT_N))

    samples: dict[str, list[float]] = {
        "profile_stats": [], "webtext_unique_url": [], "cpu_calibration": []
    }
    for r in range(rounds):
        t0 = time.perf_counter()
        qs["profile_stats"](spark, sf_dir).collect()
        samples["profile_stats"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        uniqueness_summary(wt, ["url"]).collect()
        samples["webtext_unique_url"].append(time.perf_counter() - t0)

        samples["cpu_calibration"].append(calibration())
        spark.catalog.clearCache()

    for name, vals in samples.items():
        print(
            f"{name:22s} min {min(vals):6.2f}  med {statistics.median(vals):6.2f}"
            f"  max {max(vals):6.2f}  spread {max(vals)/min(vals):4.1f}x"
            f"  n={len(vals)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
