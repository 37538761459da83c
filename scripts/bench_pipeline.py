"""End-to-end bench of the one-call corpus dedup pipeline
(dedup_corpus: canonical-URL -> exact -> MinHash-LSH pairs -> connected
components -> keep-best) on the bench webtext table — the whole-pipeline
number VERDICT r4 noted was missing (every stage had its own bench, the
composition did not).

Measures, per stage (via a timing wrapper around the pipeline's own
_stage_cached, so the numbers are the real checkpointed stage costs
including the parquet write):
  - wall seconds
  - shuffle-write byte delta (Spark REST API, spark.ui.enabled)
and then verifies the kill-and-resume contract at the same scale:
run 1 aborts after the pairs stage completes; run 2 resumes and must
spend ~only the clusters + final-assembly cost (cached stages load
from parquet).

Run: python scripts/bench_pipeline.py [n_docs] [cpus]
Results -> BENCH/PIPELINE.md (updated by hand).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, ".")

import sparkcheck.dedup.pipeline as P
from sparkcheck.session import get_spark


def shuffle_write_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-pipeline", master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    from bench import webtext_parquet

    path = webtext_parquet(spark, n)
    df = spark.read.parquet(path)
    df.count()  # footer/page-cache warmup

    stage_walls: dict[str, float] = {}
    stage_shuffle: dict[str, int] = {}
    orig = P._stage_cached
    abort_after_pairs = {"on": False}

    def timed(base_dir, stage, build, spark_):
        if abort_after_pairs["on"] and stage == "clusters":
            raise KeyboardInterrupt("simulated kill after pairs stage")
        s0 = shuffle_write_bytes(spark_)
        t0 = time.perf_counter()
        out = orig(base_dir, stage, build, spark_)
        out.count()  # force the read-back so cache hits are timed too
        stage_walls[stage] = round(time.perf_counter() - t0, 2)
        stage_shuffle[stage] = shuffle_write_bytes(spark_) - s0
        return out

    P._stage_cached = timed
    ckpt = tempfile.mkdtemp(prefix="sparkcheck_pipe_")
    try:
        # r=4 / t=0.8 geometry: the webtext generator's 32-word vocab
        # makes 3-shingles collide massively, so the permissive r=2 /
        # t=0.5 curve floods the candidate stage (measured 312 s pairs
        # at 1M vs 51 s with r=4 — BENCH/PIPELINE.md); near-dup dedup
        # on short docs wants the steep curve anyway.
        kw = dict(
            text_col="text", id_col="doc_id", url_col="url", threshold=0.8,
            num_hashes=8, rows_per_band=4, max_bucket=1000,
            checkpoint_dir=ckpt, input_fingerprint=f"bench-n{n}",
        )
        # ---- run 1: killed after pairs ----
        abort_after_pairs["on"] = True
        t0 = time.perf_counter()
        try:
            P.dedup_corpus(df, **kw).count()
            raise AssertionError("abort did not fire")
        except KeyboardInterrupt:
            pass
        t_killed = time.perf_counter() - t0
        walls_run1 = dict(stage_walls)
        shuf_run1 = dict(stage_shuffle)

        # ---- run 2: resume; url/exact/pairs are cache hits ----
        abort_after_pairs["on"] = False
        stage_walls.clear()
        stage_shuffle.clear()
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        survivors = P.dedup_corpus(df, **kw).count()
        t_resume = time.perf_counter() - t0
        final_shuffle = shuffle_write_bytes(spark) - s0 - sum(stage_shuffle.values())

        print(json.dumps({
            "n_docs": n, "cpus": int(cpus), "survivors": survivors,
            "run1_killed_after_pairs_sec": round(t_killed, 2),
            "run1_stage_walls": walls_run1,
            "run1_stage_shuffle_mb": {k: round(v / 1e6, 1) for k, v in shuf_run1.items()},
            "resume_total_sec": round(t_resume, 2),
            "resume_stage_walls": dict(stage_walls),
            "resume_final_assembly_shuffle_mb": round(final_shuffle / 1e6, 1),
        }, indent=2))
    finally:
        P._stage_cached = orig
        shutil.rmtree(ckpt, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
