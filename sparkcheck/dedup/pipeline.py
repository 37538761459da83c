"""One-call corpus deduplication — the composition every training-data
pipeline runs, wired from this package's verified pieces:

    1. exact dedup      — md5(normalized text) groups, keep one copy
    2. near-dup PAIRS   — MinHash-LSH candidates + pair-restricted
                          exact-Jaccard verify (dedup.minhash)
    3. CLUSTERS         — connected components over the pairs
                          (dedup.clusters)
    4. survivors        — one doc per cluster, best by a quality column
                          (dedup.canonical) or the minimum id

Every stage is the scale shape proven in its own module bench
(BENCH/MINHASH_VERIFY.md, BENCH/EMBEDDING_LSH.md): no all-pairs joins,
hot-bucket caps, candidate-restricted verification, iterative
components with checkpointed lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkcheck.dedup.clusters import connected_components
from sparkcheck.dedup.exact import drop_exact_duplicates
from sparkcheck.dedup.minhash import minhash_near_duplicates


def dedup_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    k: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_bucket: int | None = 1000,
    max_iter: int = 20,
) -> DataFrame:
    """Deduplicated corpus: full rows of the surviving docs.

    Exact duplicates collapse first (cheap md5 groupBy — they would
    otherwise all land in one LSH bucket anyway); near-dup clusters
    then keep their highest-``quality_col`` member (ties and absence of
    a quality column fall back to the minimum id — deterministic at any
    parallelism). Docs in no cluster pass through untouched."""
    exact = drop_exact_duplicates(df, text_col=text_col, id_col=id_col)
    pairs = minhash_near_duplicates(
        exact, text_col=text_col, id_col=id_col, k=k, num_hashes=num_hashes,
        rows_per_band=rows_per_band, threshold=threshold, max_bucket=max_bucket,
    )
    clusters = connected_components(pairs, max_iter=max_iter)

    member = exact.join(
        clusters.withColumnRenamed("id", id_col), id_col, "left"
    )
    in_cluster = member.where(F.col("cluster").isNotNull())
    if quality_col is not None:
        best = F.max(
            F.struct(
                F.col(quality_col).alias("q"),
                (-F.col(id_col)).alias("neg_id"),
                F.col(id_col).alias("id"),
            )
        )
    else:
        best = F.max(F.struct((-F.col(id_col)).alias("neg_id"), F.col(id_col).alias("id")))
    kept_ids = (
        in_cluster.groupBy("cluster").agg(best.alias("_b"))
        .select(F.col("_b.id").alias(id_col))
    )
    survivors = in_cluster.join(kept_ids, id_col, "left_semi").drop("cluster")
    untouched = member.where(F.col("cluster").isNull()).drop("cluster")
    return untouched.unionByName(survivors)
