"""IVF (inverted-file) approximate nearest neighbor — the learned-
partition counterpart to the sign-bucket LSH in ann.py.

Classic IVF (Sivic&Zisserman '03 / FAISS IVFFlat):
  train:  k-means coarse quantizer (MLlib, fixed seed) over a sample;
          assign every corpus vector to its nearest centroid (map-only
          after broadcasting the k centroids).
  search: a query probes only the ``nprobe`` nearest centroid lists —
          cost ~ nprobe/k of the corpus, recall grows with nprobe.

Centroid assignment is a crossJoin against a BROADCAST centroid table
(k rows) with a JVM-side argmin — the corpus never shuffles for the
assignment; the only shuffle is the search's per-list join, keyed by
centroid id (bounded fan-out: lists ≈ n/k vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sparkcheck.dedup.embedding import _dot, _norm


def train_centroids(
    corpus: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """K-means coarse quantizer → (centroid_id, centroid: array<double>).
    Deterministic for a fixed seed. Trains on a sample at corpus scale."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    df = corpus.select(F.col(vec_col).alias("emb"))
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    feats = df.select(array_to_vector(
        F.transform("emb", lambda x: x.cast("double"))).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    spark = corpus.sparkSession
    rows = [(i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())]
    return spark.createDataFrame(rows, "centroid_id int, centroid array<double>")


def _assign(df: DataFrame, centroids: DataFrame, vec_alias: str, id_alias: str,
            n_lists: int = 1) -> DataFrame:
    """Assign each vector to its ``n_lists`` nearest centroids (by cosine
    on normalized vectors).

    n_lists == 1 (the corpus side, the big one): the k centroids are packed
    into ONE array-of-structs row and broadcast; the argmax is a struct-max
    over that array — a pure projection, genuinely map-only. No k× row
    blow-up and, critically, no window shuffle of the corpus (the previous
    Window.partitionBy(id) exchanged the whole corpus×k frame — a
    data-proportional shuffle at 10^12 rows).

    n_lists > 1 (the query side, tiny): broadcast crossJoin + ranked window
    — fine, the frame is |queries|×k rows.
    """
    if n_lists == 1:
        packed = centroids.agg(
            F.collect_list(F.struct("centroid_id", "centroid")).alias("_cents")
        )
        # struct comparison is lexicographic by field: max ⇒ highest _sim,
        # ties ⇒ highest -centroid_id ⇒ LOWEST centroid_id (same tie-break
        # as the window's desc(_sim), asc(centroid_id)).
        scored = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                (_dot(F.col(vec_alias), c["centroid"])
                 / (F.col("_n") * _norm(c["centroid"]))).alias("_sim"),
                (-c["centroid_id"]).alias("_neg_id"),
                c["centroid_id"].alias("centroid_id"),
            ),
        )
        return (
            df.crossJoin(F.broadcast(packed))
            .withColumn("centroid_id", F.array_max(scored)["centroid_id"])
            .drop("_cents")
        )
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim",
        _dot(F.col(vec_alias), F.col("centroid"))
        / (F.col("_n") * _norm(F.col("centroid"))),
    )
    w = Window.partitionBy(id_alias).orderBy(F.desc("_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n_lists)
        .drop("_sim", "_r", "centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query, scanning only the ``nprobe``
    nearest centroid lists. Output: (query_id, neighbor_id, cosine, rank)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("neighbor_v")
    ).withColumn("_n", _norm(F.col("neighbor_v")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_v")
    ).withColumn("_n", _norm(F.col("query_v")))

    c_assigned = _assign(c, centroids, "neighbor_v", "neighbor_id", n_lists=1)
    q_assigned = _assign(q, centroids, "query_v", "query_id", n_lists=nprobe)

    scored = (
        c_assigned.join(
            F.broadcast(q_assigned.withColumnRenamed("_n", "_qn")), on="centroid_id"
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("query_v"), F.col("neighbor_v"))
                / (F.col("_qn") * F.col("_n")),
                4,
            ).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
