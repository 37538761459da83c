"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:

- ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set,
  one map-side cross join against the corpus, per-query top-k via a
  window. The corpus side never shuffles for the join (broadcast nested
  loop); the only shuffle is the tiny (queries × k-ish) ranking — at
  10^12 corpus rows this is the right EXACT plan whenever queries fit
  in executor memory.

- ``cosine_topk_bucketed`` — the IVF-style scale path: corpus and
  queries are assigned to a coarse bucket (sign pattern of the first d
  coordinates — a fixed-hyperplane LSH), and each query scans only its
  bucket (+ optional 1-bit-flip probes for recall). Search cost drops
  ~2^d×; recall is tunable with ``probe_flips``.

Dot products run JVM-side via zip_with/aggregate (codegen, no Python);
results round cosine to 4 dp for cross-engine comparability and
tie-break deterministically on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from sparkcheck.dedup.embedding import _dot, _norm


def _prep(df: DataFrame, id_col: str, vec_col: str, alias: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{alias}_id"),
        F.col(vec_col).alias(f"{alias}_v"),
        _norm(F.col(vec_col)).alias(f"{alias}_n"),
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).
    Queries are broadcast — the 100 TB corpus side stays map-only."""
    c = _prep(corpus, id_col, vec_col, "neighbor")
    q = _prep(queries, id_col, vec_col, "query")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("query_v"), F.col("neighbor_v"))
                / (F.col("query_n") * F.col("neighbor_n")),
                4,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def _sign_bucket(vec: Column, dims: int) -> Column:
    return F.concat_ws(
        "", *[(F.element_at(vec, i + 1) >= 0).cast("int") for i in range(dims)]
    )


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 4,
    probe_flips: int = 0,
) -> DataFrame:
    """IVF/LSH-bucketed ANN: each query scans only corpus vectors whose
    sign-bucket matches one of its probe buckets (its own bucket plus
    every bucket at Hamming distance ≤ probe_flips). Approximate —
    recall grows with probes; cost shrinks ~2^bucket_dims / (1+probes)."""
    c = _prep(corpus, id_col, vec_col, "neighbor").withColumn(
        "bucket", _sign_bucket(F.col("neighbor_v"), bucket_dims)
    )
    q = _prep(queries, id_col, vec_col, "query").withColumn(
        "bucket0", _sign_bucket(F.col("query_v"), bucket_dims)
    )
    if probe_flips > 0:
        # probe buckets: own + all 1-bit flips (probe_flips==1 supported;
        # deeper probing would enumerate combinations)
        flips = [F.col("bucket0")]
        for i in range(bucket_dims):
            flipped_char = F.when(
                F.substring("bucket0", i + 1, 1) == "0", F.lit("1")
            ).otherwise(F.lit("0"))
            flips.append(
                F.concat(
                    F.substring("bucket0", 1, i),
                    flipped_char,
                    F.substring("bucket0", i + 2, bucket_dims - i - 1),
                )
            )
        q = q.withColumn("bucket", F.explode(F.array(*flips)))
    else:
        q = q.withColumn("bucket", F.col("bucket0"))
    scored = (
        c.join(F.broadcast(q.drop("bucket0")), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("query_v"), F.col("neighbor_v"))
                / (F.col("query_n") * F.col("neighbor_n")),
                4,
            ).alias("cosine"),
        )
        .distinct()
    )
    return _rank_topk(scored, k)
