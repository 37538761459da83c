"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship webtext full
rule-suite pass (the BASELINE.json metric: validated docs/sec).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "webtext_docs_per_sec": ..., "webtext_rows": ...}

The webtext table is materialized once to parquet under .bench/ (content
is deterministic — sparkcheck.webtext.generate) so the suite measures a
real scan + fused aggregation, not generation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sparkcheck.compile import fused_agg
from sparkcheck.session import get_spark
from sparkcheck.webtext.generate import webtext_rules, webtext_table

HEADLINE = [
    "rules_summary",
    "profile_stats",
    "histogram_totalprice",
    "uniqueness_orders",
    "orphan_lineitem_part",
    "psi_drift",
    "ks_drift",
    "reconcile_orders",
    "dedup_jaccard",
    # simhash_bits (linear fingerprinting) not simhash_pairs: the
    # synthetic small-vocab text makes hamming<=3 pairs ~quadratic
    # (362k real pairs at sf0.1) — pair emission isn't a throughput
    # metric there; the correctness gate still checks simhash_pairs.
    "simhash_bits",
    "embedding_near_dups",
    "ann_topk",
    "token_stats",
    "quality_scores",
    "lang_id",
    "cross_doc_spans",
]

# 8M docs for the JVM-side headliners (longer measurement ⇒ stable
# docs/sec on this noisy host); the Python-UDF extraction headliner uses
# a 1M table so the whole bench stays under ~2 minutes.
WEBTEXT_N = int(os.environ.get("SPARKCHECK_WEBTEXT_N", "8000000"))
EXTRACT_N = min(WEBTEXT_N, 1_000_000)


def webtext_parquet(spark, n: int) -> str:
    from sparkcheck.io.cache import cached_parquet

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench", f"webtext_n{n}")
    cached_parquet(spark, path, lambda: webtext_table(spark, n, num_partitions=64))
    return path


def run_webtext_suite(spark, path: str) -> tuple[float, int]:
    """The flagship single-pass fused validation over the webtext table.
    Returns (elapsed_sec, n_rows). Timed twice, best-of-2 (excludes JVM
    and parquet-footer warmup)."""
    df = (
        spark.read.parquet(path)
        .withColumn("warc_ts_epoch", F.unix_timestamp("warc_ts").cast("double"))
    )
    rules = webtext_rules()
    n = df.count()  # warmup: footers + file listing
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fused_agg(df, rules).collect()
        best = min(best, time.perf_counter() - t0)
    return best, n


def _burn(n: int = 4_000_000) -> int:
    x = 0
    for i in range(n):
        x = (x * 1103515245 + i) % (1 << 31)
    return x


def cpu_calibration() -> float:
    """Fixed single-thread CPU burn — varies ONLY with host load. The
    sandbox host has measured 4.6× calibration spreads across minutes
    (BENCH/HOST_APPROX.md round-5 section), so the bench artifact
    carries its own noise evidence: a calibration sample well above the
    ~0.65 s idle floor marks the surrounding timings as taken in a
    degraded window."""
    t0 = time.perf_counter()
    _burn()
    return time.perf_counter() - t0


def cpu_calibration_mt(workers: int = 8) -> float:
    """Wall time of ``workers`` concurrent burns (subprocesses — the
    GIL serializes threads). On an uncontended host this ≈ the
    single-thread time; a multi-core-throttled window inflates it even
    when the single-thread probe looks clean (observed: a bench run
    3-6× degraded across the board with the 1-thread burn only 1.2×
    its floor — hypervisor core-throttling is invisible to one
    thread)."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(workers) as pool:
        pool.map(_burn, [4_000_000] * workers)
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="sparkcheck-bench", master=f"local[{cpus}]")
    calib = {
        "start": round(cpu_calibration(), 3),
        "start_mt8": round(cpu_calibration_mt(), 3),
    }
    # load average at start — the 1-second calibration slices miss a
    # bursty co-tenant between them (measured: idle-floor calibrations
    # bracketing an 11x-degraded suite), but the kernel's 1/5/15-min
    # averages do not; recorded again at the end (BENCH/NOISE.md
    # round-6 event)
    loadavg = {"start": [round(x, 2) for x in os.getloadavg()]}

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # the sandbox is noisy: best-of-2 everywhere, best-of-4 for the
    # entries BENCH/NOISE.md measured as load-spike-exposed
    extra_reps = {"profile_stats": 4}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(extra_reps.get(name, 2)):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # drop frames a query persisted (e.g. jaccard's shingle cache) so
        # later headliners aren't taxed by earlier queries' memory
        spark.catalog.clearCache()

    calib["after_headliners"] = round(cpu_calibration(), 3)
    wt_path = webtext_parquet(spark, WEBTEXT_N)
    wt_sec, wt_rows = run_webtext_suite(spark, wt_path)
    timings["webtext_suite"] = round(wt_sec, 3)

    # shuffle-heavy headline: url uniqueness over the webtext table
    from sparkcheck.integrity import uniqueness_summary

    wt = spark.read.parquet(wt_path)
    best = float("inf")
    for _ in range(4):  # noisiest shuffle entry (BENCH/NOISE.md)
        t0 = time.perf_counter()
        uniqueness_summary(wt, ["url"]).collect()
        best = min(best, time.perf_counter() - t0)
    timings["webtext_unique_url"] = round(best, 3)

    # skew headline: per-host doc counts + salted exact distinct urls.
    # Warm the OS page cache for the url column first: host_stats has a
    # measured 2.2 s warm vs 7.9 s cold profile (BENCH/NOISE.md) and the
    # r4 bench recorded the cold number (7.29 s) as the best-of-4 when a
    # host load spike hit all four reps — the warm-up makes rep 1
    # comparable to reps 2-4 instead of burning one rep on page-in.
    from sparkcheck.webtext import host_stats

    wt.select(F.sum(F.length("url"))).collect()
    best = float("inf")
    for _ in range(5):  # interleaved spread measured in BENCH/HOST_APPROX.md
        t0 = time.perf_counter()
        host_stats(wt, k=20, salted=True).collect()
        best = min(best, time.perf_counter() - t0)
    timings["webtext_host_stats"] = round(best, 3)
    calib["after_host_stats"] = round(cpu_calibration(), 3)
    calib["after_host_stats_mt8"] = round(cpu_calibration_mt(), 3)

    # north-rule verdict contract at 8M: per-partition pass/fail verdicts
    # + violation rows with lineage written to a parquet sink, over a
    # shared rule-pruned projection (two pruned columnar scans — measured
    # faster than a shared-scan cache, see BENCH/VERDICTS_SINK.md)
    import shutil
    import tempfile

    from pyspark.sql import functions as F2

    from sparkcheck.compile import verdicts_and_sink
    from sparkcheck.webtext.generate import webtext_rules

    wt_e = wt.withColumn("warc_ts_epoch", F2.unix_timestamp("warc_ts").cast("double"))
    rules = webtext_rules()
    sink = tempfile.mkdtemp(prefix="sparkcheck_viol_")
    try:
        best = float("inf")
        # best-of-5: 10x min..max spread measured interleaved with a CPU
        # calibration (BENCH/VERDICTS_SINK.md round-4 section) — the r3
        # "regression" was a degraded host window, true min 3.2 s
        for _ in range(5):
            t0 = time.perf_counter()
            verdicts_and_sink(wt_e, rules, key_cols=["url"], sink_path=sink)
            best = min(best, time.perf_counter() - t0)
        timings["webtext_verdicts_and_sink"] = round(best, 3)
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    spark.catalog.clearCache()

    # Arrow/pandas-UDF headline: byte-identity text re-extraction
    from sparkcheck.textextract.extract import extraction_mismatch_rows

    ex = spark.read.parquet(webtext_parquet(spark, EXTRACT_N))
    # Warm the OS page cache for the columns the UDF reads — this entry
    # reads its OWN 1M-doc parquet, so rep 1 of 4 burned on page-in
    # (the host_stats mitigation, applied after the r5 5.72 s artifact;
    # interleaved protocol + root-cause in BENCH/EXTRACT_NOISE.md)
    ex.select(F.sum(F.length("html")), F.sum(F.length("text"))).collect()
    calib["before_extract"] = round(cpu_calibration(), 3)
    best = float("inf")
    for _ in range(5):  # 13.1x interleaved spread (BENCH/EXTRACT_NOISE.md)
        t0 = time.perf_counter()
        n_mismatch = extraction_mismatch_rows(ex).count()
        best = min(best, time.perf_counter() - t0)
    timings["webtext_extract_identity"] = round(best, 3)
    calib["after_extract"] = round(cpu_calibration(), 3)
    assert n_mismatch == 2 * (EXTRACT_N // 1000), "planted extraction violations"

    # whole-pipeline regression guard (VERDICT r4 #2): one-call
    # dedup_corpus (URL → exact → LSH pairs → components → keep-best) on
    # a 250k-doc slice of the webtext table. Tracked as its OWN metric,
    # not a headline query: it is a multi-stage pipeline, not a p95-class
    # interactive query — the full-scale evidence (8M docs, per-stage
    # wall + shuffle + kill-resume) lives in BENCH/PIPELINE.md. r=4 /
    # t=0.8 geometry per that note (the synthetic 32-word vocab floods
    # the permissive r=2 curve with candidates).
    from sparkcheck.dedup import dedup_corpus

    # subset via a PUSHED-DOWN id filter, never .limit(): GlobalLimit
    # single-partitions the frame AND recomputes the limited scan for
    # every consumer subtree in the pipeline (measured 321 s vs 23 s
    # for the same 250k docs)
    pipe_n = min(WEBTEXT_N, 250_000)
    pipe_df = spark.read.parquet(wt_path).where(F.col("doc_id") < pipe_n)
    best = float("inf")
    for _ in range(2):  # measured 17.7-28.3 s spread across reps (host noise)
        t0 = time.perf_counter()
        pipe_survivors = dedup_corpus(
            pipe_df, text_col="text", id_col="doc_id", url_col="url",
            threshold=0.8, num_hashes=8, rows_per_band=4, max_bucket=1000,
        ).count()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    pipe_sec = round(best, 3)

    # CCNet-style LM perplexity scoring guard: train a pruned 3-gram
    # stupid-backoff model on a 100k-doc slice, score the 1M-doc table
    # (the broadcast-join hot path). Best-of-3 — rep 1 pays JIT/codegen
    # warm-up (measured 49.6 -> 21.7 -> 13.6 s on an idle host).
    from sparkcheck.textstats.lm import perplexity_scores, train_ngram_counts

    lm_df = spark.read.parquet(webtext_parquet(spark, EXTRACT_N))
    lm_train = lm_df.where(F.col("doc_id") < EXTRACT_N // 10)
    lm_best = float("inf")
    lm_docs = 0
    for _ in range(3):
        t0 = time.perf_counter()
        lm_counts = train_ngram_counts(lm_train, text_col="text", n=3, min_count=5)
        lm_docs = perplexity_scores(
            lm_df, lm_counts, text_col="text", id_col="doc_id", n=3
        ).count()
        lm_best = min(lm_best, time.perf_counter() - t0)
    lm_sec = round(lm_best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite wall time (+ webtext full rule-suite pass)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "webtext_rows": wt_rows,
                "webtext_docs_per_sec": round(wt_rows / wt_sec, 1),
                "dedup_corpus_sec": pipe_sec,
                "dedup_corpus_docs": pipe_n,
                "dedup_corpus_survivors": pipe_survivors,
                "lm_score_sec": lm_sec,
                "lm_score_docs": lm_docs,
                # single-thread CPU burn samples (idle floor ~0.65 s):
                # values well above it mark a degraded host window —
                # read regressions against these before blaming a plan
                "cpu_calibration_sec": calib,
                "loadavg_1_5_15": {
                    **loadavg,
                    "end": [round(x, 2) for x in os.getloadavg()],
                },
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
