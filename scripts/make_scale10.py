"""Build a 10x replica of the sf0.1 tables the sf-dependent headline
queries read (documents, embeddings, lineitem) under .bench/sf1x/, with
the remaining tables symlinked from sf0.1 — measurement harness ONLY
(bench_extra time --sf .bench/sf1x ...), never a correctness input.

A naive 10x union of IDENTICAL copies is the wrong workload: every doc
would gain 9 exact duplicates and every vector 9 cosine-1.0 twins, so
pair-emitting operators (jaccard, LSH verify) would see ~100x the pair
mass instead of the ~10x a real 10x corpus has. Each copy is therefore
DECORRELATED while preserving within-copy structure exactly:

  - documents: every token gets a per-copy suffix (copy i shares zero
    shingles with copy j; within-copy shingle/bigram/token structure is
    bit-identical to sf0.1, and the distinct-shingle vocabulary scales
    10x like a real corpus);
  - embeddings: per-(copy, dim) deterministic sign flips (s_d^2 = 1, so
    within-copy dot products and norms are EXACTLY preserved —
    within-copy cosine structure identical — while cross-copy cosines
    decorrelate);
  - lineitem: l_extendedprice jittered by copy * 1e-4 (distinct-value
    count scales ~10x like a real sf1.0, which is what the exact-
    percentile path's cost depends on).

Deterministic; idempotent (skips existing outputs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

from pyspark.sql import functions as F

from sparkcheck.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench", "sf1x"
)
COPIES = 10


def _copy_documents(df, i: int):
    if i == 0:
        return df
    suffixed = F.array_join(
        F.transform(F.split(F.col("text"), " "), lambda t: F.concat(t, F.lit(f"~{i}"))),
        " ",
    )
    return df.withColumn("text", F.when(F.col("text").isNotNull(), suffixed))


def _copy_embeddings(df, i: int):
    if i == 0:
        return df
    # sign s_{i,d} = +1/-1 from a cheap deterministic hash of (i, d);
    # two-arg transform lambda receives (element, index) — the
    # documented positional form (see CLAUDE.md invariant).
    flip = F.transform(
        F.col("embedding"),
        lambda x, d: x * (F.pmod(F.xxhash64(F.lit(i), d), F.lit(2)) * 2 - 1).cast("double"),
    )
    return df.withColumn(
        "embedding", F.when(F.col("embedding").isNotNull(), flip)
    )


def _copy_lineitem(df, i: int):
    if i == 0:
        return df
    return df.withColumn(
        "l_extendedprice", F.col("l_extendedprice") + F.lit(i * 1e-4)
    )


TABLES = {
    "documents": (["doc_id"], _copy_documents),
    "embeddings": (["vec_id"], _copy_embeddings),
    "lineitem": (["l_orderkey"], _copy_lineitem),
}


def main() -> None:
    spark = get_spark(app_name="make-scale10", master="local[32]")
    os.makedirs(DST, exist_ok=True)
    for name, (id_cols, fn) in TABLES.items():
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            print(f"skip {name} (exists)")
            continue
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        maxes = df.agg(
            *[(F.max(c) + 1).alias(c) for c in id_cols]
        ).collect()[0]
        parts = []
        for i in range(COPIES):
            p = fn(df, i)
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * maxes[c]))
            parts.append(p)
        big = reduce(lambda a, b: a.unionByName(b), parts)
        big.repartition(64).write.mode("overwrite").parquet(out)
        print(f"wrote {out}")
    for name in "region nation customer supplier part orders events".split():
        link = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{name}.parquet", link)
    print("done")


if __name__ == "__main__":
    main()
