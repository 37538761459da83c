"""Evidence bench for the candidate-id semi-join in jaccard_for_pairs
(round-2 verdict task 4).

Scenario: LOW candidate density — a large corpus where LSH emitted only
a handful of candidate pairs (clean corpora are the common case: most
docs collide with nothing). Without the semi-join, jaccard_for_pairs
still shingled and aggregated the WHOLE corpus to build the per-doc
size frame; with it, non-candidate docs never enter the explode or the
shuffle.

Both shapes are timed on identical inputs; shuffle-write and input
bytes are read from the Spark UI REST API (/api/v1) as a before/after
diff per run. Results → BENCH/MINHASH_VERIFY.md (low-density section).

Run: python scripts/bench_jaccard_semijoin.py [n_docs] [n_pairs]
     (default 400000 docs, 200 pairs)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkcheck.dedup.jaccard import jaccard_for_pairs, shingles
from sparkcheck.session import get_spark


def corpus(spark, n: int):
    """n docs, 60 words each, doc-unique vocabulary except that doc 2i
    and 2i+1 share their first 50 words (true near-dups)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") / 2).cast("long").alias("c")
    )
    shared = F.concat_ws(
        " ", *[F.concat(F.lit(f"w{i}_"), F.col("c").cast("string")) for i in range(50)]
    )
    own = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"u{i}_"), F.col("doc_id").cast("string")) for i in range(10)],
    )
    return base.select("doc_id", F.concat_ws(" ", shared, own).alias("text"))


def pairs_frame(spark, m: int):
    return spark.range(m).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )


def jaccard_for_pairs_no_semijoin(df, pairs, threshold=0.5):
    """The pre-fix shape: sizes + routed joins over the FULL corpus
    shingle frame (jaccard.py before the candidate-id semi-join)."""
    sh = shingles(df, "text", "doc_id", 3)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    p = pairs.select("id_a", "id_b").distinct()
    a_sh = p.join(sh.withColumnRenamed("id", "id_a"), "id_a").select(
        "id_a", "id_b", "shingle"
    )
    inter = (
        a_sh.join(sh.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select("id_a", "id_b",
                F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _stage_totals(spark) -> tuple[int, int]:
    """(input bytes, shuffle-write bytes) summed over all completed
    stages, via the UI REST API."""
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete")
    )
    return (
        sum(s.get("inputBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def timed(spark, fn, docs, pairs, reps: int = 3):
    best = (float("inf"), 0, 0, -1)
    for _ in range(reps):
        in0, sw0 = _stage_totals(spark)
        t0 = time.perf_counter()
        n = fn(docs, pairs).count()
        dt = time.perf_counter() - t0
        in1, sw1 = _stage_totals(spark)
        if dt < best[0]:
            best = (dt, in1 - in0, sw1 - sw0, n)
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      app_name="bench_jaccard_semijoin",
                      extra_conf={"spark.ui.enabled": "true"})
    docs = corpus(spark, n_docs).persist()
    docs.count()
    pairs = pairs_frame(spark, n_pairs).persist()
    pairs.count()

    rows = []
    for label, fn in [
        ("no semi-join (old)", jaccard_for_pairs_no_semijoin),
        ("semi-join (new)", lambda d, p: jaccard_for_pairs(d, p, threshold=0.5)),
    ]:
        dt, dinput, dshuffle, n = timed(spark, fn, docs, pairs)
        rows.append((label, dt, dshuffle, n))
        print(f"{label:22s} wall {dt:6.2f}s  shuffle-write {dshuffle/1e6:8.1f} MB  "
              f"pairs>=0.5: {n}")
    old, new = rows[0], rows[1]
    print(f"\nspeedup {old[1]/new[1]:.1f}x  shuffle reduction "
          f"{old[2]/max(new[2],1):.1f}x  (results identical: {old[3]} == {new[3]})")
    spark.stop()


if __name__ == "__main__":
    main()
