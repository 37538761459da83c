"""Deterministic Lloyd k-means over embedding columns — the
topic/domain clustering step of cluster-based corpus curation (DCLM /
FineWeb-style: cluster document embeddings, then inspect, rebalance,
or filter whole clusters). MLlib's KMeans (similarity/ivf.py's coarse
quantizer) is seed-deterministic but NOT engine-portable — k-means||
init and float accumulation order can't be reproduced outside Spark.
This variant is: every step is exact or order-proof, so a DuckDB
oracle re-derives the ENTIRE training loop bit-for-bit.

Determinism contract (the same discipline as textstats/classifier.py):

  - coordinates quantize once to integer MICROS (round(x * 1e6) —
    float→double is exact, the product and round are IEEE-identical
    everywhere), so per-cluster per-dimension sums are BIGINTs:
    exact under ANY summation order, which a distributed groupBy
    cannot otherwise promise;
  - centroids are sums/count — one double division of exact operands,
    identical in Python, the JVM and DuckDB;
  - init is hash-seeded, not RNG: the k vectors with the lowest
    sampling hash md5(seed|id), ranked (hash, id) — cluster_id is the
    rank, so even the labels are portable;
  - squared-distance folds run in index order (F.aggregate here,
    list_reduce in the oracle): identical rounding, identical doubles,
    identical argmins (ties break to the lowest cluster_id).

Execution shape: assignment is MAP-ONLY — the k centroids ride the
plan as a literal array of structs and the argmin is F.array_min over
it (no crossJoin row blow-up, no shuffle, whole-stage codegen). Each
Lloyd iteration shuffles only the (k x dim) per-dimension partial sums
(posexplode + groupBy with map-side combine), and the k x dim stats
frame is collected to the driver (tiny) to become the next literal.
At 10^12 docs: fit on a deterministic sample (cap the input with
sampling.deterministic_sample), then kmeans_assign the full corpus
map-only — the MLlib path's deployment shape, kept here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MICRO_SCALE = 1_000_000.0


def _microize(vec_col: str) -> Column:
    """array<float|double> → array<bigint> micro-units (exact, engine-
    portable — see module docstring). try_cast, not cast: the
    optimizer infers isnotnull/size constraints from downstream
    Generates and hoists this transform ABOVE the _valid_vec
    short-circuit via subexpression elimination, so an ANSI cast would
    throw on the very NaN rows the filter exists to drop (observed in
    the executed plan). Valid rows are unaffected — their values are
    finite — and invalid rows are filtered regardless."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * MICRO_SCALE, 0).try_cast(
            "bigint"
        ),
    )


def _valid_vec(vec_col: str, id_col: str, dim: int | None) -> Column:
    """Rows k-means may consume: non-NULL id and vector, no NaN/NULL
    elements, and (when the expected dimension is known) exactly dim
    wide. Without this filter corrupted vectors fail SILENTLY or
    LOUDLY, both wrongly: a wrong-dim vector zip_withs into NULL
    distance terms and a NULL distance struct compares LOW in
    array_min (it would WIN the argmin), while a NaN element makes the
    ANSI-mode bigint cast throw mid-job. profile/embeddings.py is the
    reporting view of the same failure modes — this is the execution
    guard."""
    v = F.col(vec_col)
    ok = (
        F.col(id_col).isNotNull()
        & v.isNotNull()
        & ~F.exists(v, lambda x: x.isNull() | F.isnan(x.cast("double")))
    )
    if dim is not None:
        ok = ok & (F.size(v) == dim)
    return ok


def _cent_literal(cents: list[list[float]]) -> Column:
    """Centroid list → plan-literal array<struct<cid, c: array<double>>>."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(v)) for v in c]).alias("c"),
            )
            for cid, c in enumerate(cents)
        ]
    )


def _dist2(m_col: Column, cent: Column) -> Column:
    """Squared euclidean distance in micro units: index-ordered fold of
    (x - c)^2 — identical rounding in every engine."""
    return F.aggregate(
        F.zip_with(
            m_col, cent, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_expr(cents: list[list[float]], m_col: Column) -> Column:
    """struct(d, cid) of the nearest centroid — array_min over the
    literal centroid array compares (distance, cid) lexicographically,
    so ties break to the lowest cluster id."""
    scored = F.transform(
        _cent_literal(cents),
        lambda c: F.struct(_dist2(m_col, c["c"]).alias("d"), c["cid"].alias("cid")),
    )
    return F.array_min(scored)


def _arrow_fit_stats(cents: list[list[float]]):
    """mapInArrow kernel for one Lloyd iteration: per-batch nearest-
    centroid assignment (numpy matmul) + IN-KERNEL integer partial
    sums, emitting only (cid, dim, sum, count) rows — the map-side
    combine of guide §2.3, so the Python boundary returns k×dim rows
    per batch instead of every vector. Partial sums are BIGINT micro
    units: integer addition is associative, so the merged totals are
    EXACTLY the Column path's (identical centroids) whenever the
    assignments agree — which they do except on exact distance ties
    (numpy's matmul reassociates the fold; same caveat as
    kmeans_assign(engine='arrow'), equality pytest-pinned)."""
    import numpy as np
    import pyarrow as pa

    cmat = np.asarray(cents, dtype=np.float64)  # (k, dim)
    k, dim = cmat.shape
    c2 = (cmat * cmat).sum(axis=1)

    def fn(batches):
        for batch in batches:
            arr = batch.column("_m")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = batch.num_rows
            if n == 0:
                continue
            offs = arr.offsets.to_numpy(zero_copy_only=False)
            flat = np.asarray(arr.values.to_numpy(zero_copy_only=False), dtype=np.int64)
            x_int = flat[np.add.outer(offs[:-1], np.arange(dim))]
            x = x_int.astype(np.float64)
            d2 = (x * x).sum(axis=1, keepdims=True) + c2[None, :] - 2.0 * (x @ cmat.T)
            cids = d2.argmin(axis=1)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, cids, x_int)
            counts = np.bincount(cids, minlength=k)
            present = np.nonzero(counts)[0]
            out_cid = np.repeat(present, dim).astype(np.int32)
            out_d = np.tile(np.arange(dim, dtype=np.int32), len(present))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_cid, type=pa.int32()),
                    pa.array(out_d, type=pa.int32()),
                    pa.array(sums[present].reshape(-1), type=pa.int64()),
                    pa.array(
                        np.repeat(counts[present], dim), type=pa.int64()
                    ),
                ],
                ["_cid", "_d", "_s", "_n"],
            )

    return fn


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 3,
    engine: str = "arrow",
) -> list[list[float]]:
    """Lloyd iterations; returns the k centroids (micro-unit doubles,
    cluster_id = list index). Each iteration is one map-only assignment
    + one (k x dim)-row stats agg collected to the driver; an empty
    cluster keeps its previous centroid. The driver holds only
    O(k x dim) floats — never data rows.

    ``engine`` picks who runs the per-iteration assignment arithmetic:
    ``"arrow"`` (default) assigns AND partially aggregates per batch in
    numpy (``_arrow_fit_stats``; measured ~11× the interpreted fold on
    50k×64-dim×2 iterations), ``"column"`` is the oracle-parity
    interpreted-fold path. Centroids are identical except when an exact
    distance TIE flips an assignment (numpy reassociates the fold) —
    use "column" where engine-portable bit-stability matters, e.g. the
    oracle-mirrored queries."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    ).alias("_h")
    # the corpus dimension is whatever the lowest-hash valid vector has;
    # rows of any OTHER width are dropped before seeding and fitting —
    # mixed widths would zip_with into NULL distance terms, and a NULL
    # distance struct compares LOW in array_min (it would WIN argmins).
    # Both the validity and the width predicate test the RAW vector
    # column: a predicate over the microized projection can be
    # reordered ahead of the validity filter and force the ANSI bigint
    # cast on a NaN row.
    first = (
        df.where(_valid_vec(vec_col, id_col, None))
        .select(F.size(vec_col).alias("_dim"), h, F.col(id_col))
        .orderBy("_h", id_col)
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError(f"k={k} but only 0 non-null vectors exist")
    dim = int(first[0]["_dim"])
    base = df.where(_valid_vec(vec_col, id_col, dim)).select(
        F.col(id_col).alias("_id"), _microize(vec_col).alias("_m")
    )
    hb = F.md5(F.concat(F.lit(f"{seed}|"), F.col("_id").cast("string")))
    seed_rows = (
        base.select("_m", hb.alias("_h"), "_id")
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"k={k} but only {len(seed_rows)} non-null vectors exist"
        )
    if engine not in ("arrow", "column"):
        raise ValueError(f"engine must be 'arrow' or 'column', got {engine!r}")
    cents = [[float(x) for x in r["_m"]] for r in seed_rows]
    for _ in range(n_iter):
        if engine == "arrow":
            stats = (
                base.select("_m")
                .mapInArrow(
                    _arrow_fit_stats(cents),
                    "_cid int, _d int, _s long, _n long",
                )
                .groupBy("_cid", "_d")
                .agg(F.sum("_s").alias("_s"), F.sum("_n").alias("_n"))
                .collect()
            )
        else:
            assigned = base.select(
                F.col("_m"), _assign_expr(cents, F.col("_m"))["cid"].alias("_cid")
            )
            stats = (
                assigned.select(
                    "_cid", F.posexplode("_m").alias("_d", "_v")
                )
                .groupBy("_cid", "_d")
                .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
                .collect()
            )
        by_cid: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cid.setdefault(r["_cid"], {})[r["_d"]] = (r["_s"], r["_n"])
        cents = [
            [
                by_cid[cid][d][0] / by_cid[cid][d][1]
                for d in range(len(cents[cid]))
            ]
            if cid in by_cid
            else cents[cid]  # empty cluster: keep the previous centroid
            for cid in range(k)
        ]
    return cents


def kmeans_assign(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: tuple[str, ...] = (),
    engine: str = "column",
) -> DataFrame:
    """Map-only assignment of every vector to its nearest centroid:
    (id_col, *keep_cols, cluster_id, dist2_micro) where dist2_micro is
    the squared distance in micro^2 units rounded to an exact BIGINT
    (hash-stable). Zero shuffle either way — the engines differ only
    in who runs the arithmetic:

      - ``"column"`` (default): pure Column expressions — the
        ORACLE-PARITY path (index-ordered folds, engine-identical
        doubles). Spark's higher-order functions are interpreted, not
        codegen'd, so this evaluates ~85k vec/s/32-threads at dim 64.
      - ``"arrow"``: Arrow-batched numpy (mapInPandas) — one (B x dim)
        @ (dim x k) matmul per batch, the sanctioned fast path for
        dense linear algebra (BENCH/KMEANS.md: ~14x). numpy's pairwise
        summation is NOT the index-ordered fold, so distances can
        differ in final ULPs; assignments match except on exact
        distance TIES (argmin takes the lowest cid in both paths, and
        assignment equality is pytest-pinned on real data) — use
        "column" where bit-stable dist2_micro matters, "arrow" for the
        full-corpus pass.
    """
    filtered = df.where(_valid_vec(vec_col, id_col, len(cents[0])))
    if engine == "column":
        best = _assign_expr(cents, _microize(vec_col))
        return filtered.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            best["cid"].cast("int").alias("cluster_id"),
            F.round(best["d"], 0).cast("bigint").alias("dist2_micro"),
        )
    if engine != "arrow":
        raise ValueError(f"engine must be 'column' or 'arrow', got {engine!r}")
    import numpy as np
    from pyspark.sql import types as T

    cmat = np.asarray(cents, dtype=np.float64)  # (k, dim)
    c2 = (cmat * cmat).sum(axis=1)  # (k,)
    in_cols = [id_col, *keep_cols, vec_col]
    schema = T.StructType(
        [filtered.schema[c] for c in (id_col, *keep_cols)]
        + [
            T.StructField("cluster_id", T.IntegerType(), False),
            T.StructField("dist2_micro", T.LongType(), False),
        ]
    )

    def assign_batches(it):
        for pdf in it:
            x = np.rint(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                * MICRO_SCALE
            )  # (B, dim) on the micro grid
            # ||x-c||^2 = x.x + c.c - 2 x.c — one matmul per batch
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                + c2[None, :]
                - 2.0 * (x @ cmat.T)
            )  # (B, k)
            out = pdf[[id_col, *keep_cols]].copy()
            out["cluster_id"] = d2.argmin(axis=1).astype("int32")
            out["dist2_micro"] = (
                np.rint(d2[np.arange(len(x)), out["cluster_id"]])
                .astype("int64")
            )
            yield out

    return filtered.select(*in_cols).mapInPandas(assign_batches, schema)


def kmeans_cluster(
    df: DataFrame,
    k: int,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 3,
    keep_cols: tuple[str, ...] = (),
    engine: str = "arrow",
) -> DataFrame:
    """fit + assign in one call — the curation entry point. ``engine``
    flows to both halves (see ``kmeans_fit`` / ``kmeans_assign``);
    "column" is the engine-portable oracle-parity pair."""
    cents = kmeans_fit(df, k, n_iter, vec_col, id_col, seed, engine=engine)
    return kmeans_assign(df, cents, vec_col, id_col, keep_cols, engine=engine)


def centroids_frame(spark, cents: list[list[float]]) -> "DataFrame":
    """kmeans_fit output → the (centroid_id, centroid) frame
    similarity.ivf.ivf_topk consumes as its coarse quantizer — the
    deterministic replacement for the MLlib-trained train_centroids.
    The micro-unit scale is irrelevant to IVF: its assignment and
    search are cosine, which is scale-invariant, so micro-grid
    centroids bucket vectors exactly like unit-scale ones."""
    return spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    )
