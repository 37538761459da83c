"""Interleaved noise re-measurement for bench entries that regressed
without a code change: webtext_verdicts_and_sink (r3: 9.8 -> 21.3 s),
webtext_extract_identity (r3: 3.0 -> 4.5 s), and webtext_host_stats
(r4: 3.16 -> 7.29 s, code and bench params unchanged). Protocol per
BENCH/NOISE.md: measure each N x INTERLEAVED with a fixed pure-CPU
calibration job so a host load spike is attributable, and report
min/median/max.

Run: python scripts/bench_verdicts_noise.py [rounds]
Results -> BENCH/VERDICTS_SINK.md / BENCH/HOST_APPROX.md (updated by hand).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkcheck.compile import verdicts_and_sink
from sparkcheck.session import get_spark
from sparkcheck.textextract.extract import extraction_mismatch_rows
from sparkcheck.webtext.generate import webtext_rules


def calibration() -> float:
    """Fixed single-thread CPU burn — varies only with host load."""
    t0 = time.perf_counter()
    x = 0
    for i in range(4_000_000):
        x = (x * 1103515245 + i) % (1 << 31)
    return time.perf_counter() - t0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench-verdicts-noise", master=f"local[{cpus}]")

    from bench import EXTRACT_N, WEBTEXT_N, webtext_parquet

    wt = (
        spark.read.parquet(webtext_parquet(spark, WEBTEXT_N))
        .withColumn("warc_ts_epoch", F.unix_timestamp("warc_ts").cast("double"))
    )
    ex = spark.read.parquet(webtext_parquet(spark, EXTRACT_N))
    rules = webtext_rules()
    wt.count()  # footer/file-listing warmup, same as bench.py

    from sparkcheck.webtext import host_stats

    samples: dict[str, list[float]] = {
        "verdicts_and_sink": [], "extract_identity": [],
        "host_stats": [], "cpu_calibration": []
    }
    sink = tempfile.mkdtemp(prefix="sparkcheck_viol_")
    try:
        for r in range(rounds):
            t0 = time.perf_counter()
            verdicts_and_sink(wt, rules, key_cols=["url"], sink_path=sink)
            samples["verdicts_and_sink"].append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            extraction_mismatch_rows(ex).count()
            samples["extract_identity"].append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            host_stats(wt, k=20, salted=True).collect()
            samples["host_stats"].append(time.perf_counter() - t0)

            samples["cpu_calibration"].append(calibration())
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(sink, ignore_errors=True)

    for name, vals in samples.items():
        print(
            f"{name:22s} min {min(vals):6.2f}  med {statistics.median(vals):6.2f}"
            f"  max {max(vals):6.2f}  spread {max(vals)/min(vals):4.1f}x"
            f"  n={len(vals)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
