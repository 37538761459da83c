"""Evidence bench for the MinHash verify-stage fix (round-1 verdict,
"What's wrong #1").

Scenario: a boilerplate-heavy corpus — every doc shares a fixed header
paragraph (the web-crawl norm: nav bars, cookie banners), near-dup PAIRS
are rare (one per 2-doc cluster). The LSH stage emits only the M
intra-cluster candidate pairs, but the OLD verify shape

    semi-join corpus → candidate ids → all-pairs jaccard_pairs → semi-join pairs

re-grew the quadratic: every boilerplate shingle is shared by all 2M
candidate docs, so the shingle self-join emits Θ((2M)²) intermediate
rows per boilerplate shingle. The NEW shape (jaccard_for_pairs) routes
shingles through the pair frame — Θ(M·|doc|) rows.

Both paths are timed on IDENTICAL inputs and fixed candidate pairs at
doubling M; the old path's wall time should grow ~4× per doubling, the
new path ~2×. Results → BENCH/MINHASH_VERIFY.md.

Run: python scripts/bench_minhash_verify.py [M ...]   (default 500 1000 2000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkcheck.dedup.jaccard import jaccard_for_pairs, jaccard_pairs
from sparkcheck.session import get_spark

BOILER = " ".join(f"boiler{i}" for i in range(40))  # 38 3-shingles, in EVERY doc


def corpus(spark, m: int):
    """2M docs in M clusters of 2; each cluster shares 10 unique words,
    the two docs differ by one trailing token. All docs share BOILER."""
    base = spark.range(2 * m).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 2).cast("long").alias("cluster"),
        (F.col("id") % 2).alias("variant"),
    )
    cluster_words = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"c{w}_"), F.col("cluster").cast("string")) for w in range(10)],
    )
    text = F.concat_ws(
        " ",
        F.lit(BOILER),
        cluster_words,
        F.concat(F.lit("tail_"), F.col("variant").cast("string")),
    )
    return base.select("doc_id", text.alias("text"))


def pairs_frame(spark, m: int):
    return spark.range(m).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )


def verify_old(docs, pairs):
    """Round-1 shape (minhash.py:116-118 before the fix): subset by
    candidate ids, all-pairs Jaccard, semi-join back to pairs."""
    ids = pairs.select(F.col("id_a").alias("d")).union(
        pairs.select(F.col("id_b").alias("d"))
    ).distinct()
    sub = docs.join(ids.withColumnRenamed("d", "doc_id"), "doc_id", "left_semi")
    return jaccard_pairs(sub, threshold=0.5).join(pairs, ["id_a", "id_b"], "left_semi")


def verify_new(docs, pairs):
    return jaccard_for_pairs(docs, pairs, threshold=0.5)


def timed(fn, docs, pairs, reps: int = 3) -> tuple[float, int]:
    best, n = float("inf"), -1
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn(docs, pairs).count()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [500, 1000, 2000]
    spark = get_spark(app_name="bench-minhash-verify", master="local[8]",
                      shuffle_partitions=8)
    rows = []
    # interleave old/new per M (noisy-host guidance: compare within rounds)
    for m in ms:
        docs = corpus(spark, m).persist()
        p = pairs_frame(spark, m).persist()
        docs.count(), p.count()
        t_old, n_old = timed(verify_old, docs, p)
        t_new, n_new = timed(verify_new, docs, p)
        assert n_old == n_new == m, (n_old, n_new, m)
        rows.append((m, t_old, t_new))
        print(f"M={m}: old={t_old:.2f}s new={t_new:.2f}s verified_pairs={n_new}")
        docs.unpersist(), p.unpersist()
        spark.catalog.clearCache()

    lines = [
        "# MinHash verify-stage scaling (boilerplate-heavy corpus)",
        "",
        "Corpus: 2M docs, every doc shares a 40-word boilerplate header;",
        "M candidate pairs (one per 2-doc cluster). Old shape = semi-join to",
        "candidate ids + all-pairs `jaccard_pairs` (round-1 minhash.py:116-118);",
        "new shape = pair-restricted `jaccard_for_pairs`. Best-of-3, local[8].",
        "",
        "| M pairs (2M docs) | old verify sec | new verify sec | old/new |",
        "|---|---|---|---|",
    ]
    for m, t_old, t_new in rows:
        lines.append(f"| {m} | {t_old:.2f} | {t_new:.2f} | {t_old / t_new:.1f}× |")
    lines += [
        "",
        "Growth per doubling of M (quadratic ⇒ ~4×, linear ⇒ ~2×):",
        "",
        "| transition | old growth | new growth |",
        "|---|---|---|",
    ]
    for (m1, o1, n1), (m2, o2, n2) in zip(rows, rows[1:]):
        lines.append(f"| {m1}→{m2} | {o2 / o1:.1f}× | {n2 / n1:.1f}× |")
    lines.append("")
    with open("BENCH/MINHASH_VERIFY.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/MINHASH_VERIFY.md")


if __name__ == "__main__":
    main()
