"""Per-query measurement harness for the optimization rounds (guide §1).

NOT the frozen driver bench (bench.py) — this file exists so individual
entries can be isolated, timed with the noop sink, and their formatted
plans captured, without touching the frozen measurement protocol.

Usage:
  python bench_extra.py time  [--sf DIR] [--reps N] [--collect] q1 q2 ...
  python bench_extra.py plans [--sf DIR] [--out DIR] q1 q2 ...
  python bench_extra.py pipeline [--sf DIR]      # dedup_corpus + lm_score guards
  python bench_extra.py webtext [--n N]          # webtext-family bench entries

`time` defaults to the noop sink (computes every column, no driver
transfer); pass --collect to reproduce the frozen bench's .collect()
timing (what the driver measures).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sparkcheck.session import get_spark


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(app_name="sparkcheck-bench-extra", master=f"local[{cpus}]")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_time(args) -> None:
    spark = _spark()
    qs = entrymod.queries()
    names = args.queries or list(qs)
    out = {"loadavg_start": [round(x, 2) for x in os.getloadavg()]}
    timings = {}
    for name in names:
        best, rows = float("inf"), None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.collect:
                rows = len(df.collect())
            else:
                _noop(df)
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = {"sec": round(best, 3), "rows": rows}
        print(json.dumps({name: timings[name]}), flush=True)
    out["timings"] = timings
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))


def cmd_plans(args) -> None:
    spark = _spark()
    qs = entrymod.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries or list(qs):
        df = qs[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


def cmd_pipeline(args) -> None:
    spark = _spark()
    wt_path = _webtext_parquet(spark, 1_000_000)
    big_path = _webtext_parquet(spark, args.n)

    from sparkcheck.dedup import dedup_corpus

    pipe_n = min(args.n, 250_000)
    pipe_df = spark.read.parquet(big_path).where(F.col("doc_id") < pipe_n)
    best = float("inf")
    for _ in range(2):
        spark.sparkContext.setJobDescription("pipeline:dedup_corpus")
        t0 = time.perf_counter()
        n = dedup_corpus(
            pipe_df, text_col="text", id_col="doc_id", url_col="url",
            threshold=0.8, num_hashes=8, rows_per_band=4, max_bucket=1000,
        ).count()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(json.dumps({"dedup_corpus_sec": round(best, 3), "survivors": n}), flush=True)

    from sparkcheck.textstats.lm import perplexity_scores, train_ngram_counts

    lm_df = spark.read.parquet(wt_path)
    lm_train = lm_df.where(F.col("doc_id") < 100_000)
    lm_best = float("inf")
    for _ in range(3):
        spark.sparkContext.setJobDescription("pipeline:lm_score")
        t0 = time.perf_counter()
        lm_counts = train_ngram_counts(lm_train, text_col="text", n=3, min_count=5)
        lm_docs = perplexity_scores(
            lm_df, lm_counts, text_col="text", id_col="doc_id", n=3
        ).count()
        lm_best = min(lm_best, time.perf_counter() - t0)
    print(json.dumps({"lm_score_sec": round(lm_best, 3), "lm_docs": lm_docs}))


def _webtext_parquet(spark, n: int) -> str:
    from sparkcheck.io.cache import cached_parquet
    from sparkcheck.webtext.generate import webtext_table

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", f"webtext_n{n}")
    cached_parquet(spark, path, lambda: webtext_table(spark, n, num_partitions=64))
    return path


def cmd_webtext(args) -> None:
    spark = _spark()
    from sparkcheck.compile import fused_agg, verdicts_and_sink
    from sparkcheck.integrity import uniqueness_summary
    from sparkcheck.webtext import host_stats
    from sparkcheck.webtext.generate import webtext_rules

    path = _webtext_parquet(spark, args.n)
    wt = spark.read.parquet(path)
    timings = {}
    wt_e = wt.withColumn("warc_ts_epoch", F.unix_timestamp("warc_ts").cast("double"))
    rules = webtext_rules()
    wt.count()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fused_agg(wt_e, rules).collect()
        best = min(best, time.perf_counter() - t0)
    timings["webtext_suite"] = round(best, 3)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        uniqueness_summary(wt, ["url"]).collect()
        best = min(best, time.perf_counter() - t0)
    timings["webtext_unique_url"] = round(best, 3)

    wt.select(F.sum(F.length("url"))).collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        host_stats(wt, k=20, salted=True).collect()
        best = min(best, time.perf_counter() - t0)
    timings["webtext_host_stats"] = round(best, 3)

    import shutil
    import tempfile

    sink = tempfile.mkdtemp(prefix="sparkcheck_viol_")
    try:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            verdicts_and_sink(wt_e, rules, key_cols=["url"], sink_path=sink)
            best = min(best, time.perf_counter() - t0)
        timings["webtext_verdicts_and_sink"] = round(best, 3)
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    spark.catalog.clearCache()

    from sparkcheck.textextract.extract import extraction_mismatch_rows

    ex = spark.read.parquet(_webtext_parquet(spark, min(args.n, 1_000_000)))
    ex.select(F.sum(F.length("html")), F.sum(F.length("text"))).collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        extraction_mismatch_rows(ex).count()
        best = min(best, time.perf_counter() - t0)
    timings["webtext_extract_identity"] = round(best, 3)
    print(json.dumps(timings))


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("time")
    t.add_argument("queries", nargs="*")
    t.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    t.add_argument("--reps", type=int, default=2)
    t.add_argument("--collect", action="store_true")
    t.set_defaults(fn=cmd_time)

    pl = sub.add_parser("plans")
    pl.add_argument("queries", nargs="*")
    pl.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    pl.add_argument("--out", default="plans/r07")
    pl.add_argument("--suffix", default="")
    pl.set_defaults(fn=cmd_plans)

    pi = sub.add_parser("pipeline")
    pi.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    pi.add_argument("--n", type=int, default=8_000_000)
    pi.set_defaults(fn=cmd_pipeline)

    w = sub.add_parser("webtext")
    w.add_argument("--n", type=int, default=8_000_000)
    w.set_defaults(fn=cmd_webtext)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
