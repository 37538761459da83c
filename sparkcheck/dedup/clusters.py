"""Duplicate-cluster formation: connected components over near-dup
pairs — the step between pair detection (jaccard / minhash / simhash /
embedding LSH) and canonical selection (dedup.canonical.keep_best).

Not in the reference (it has no dedup at all); this is the standard
web-corpus construction: LSH emits PAIRS, but dedup decisions need
CLUSTERS (a 5-way near-dup group arrives as up to 10 pairs), and each
cluster keeps one representative.

Algorithm: iterative min-label propagation with POINTER JUMPING (path
doubling — the label forest is contracted each round, the dataframe
analog of large-star/small-star, Kiveris et al. '14 "Connected
Components in MapReduce and Beyond"):

    label(v) ← min(label(v), min over neighbors' labels)   # propagate
    label(v) ← label(label(v))                             # jump

repeated to fixpoint. Each round is one edge join + one groupBy (both
on the vertex id — AQE reuses the partitioning) plus one self-join of
the labels frame (|V| rows, far smaller than the edge list). The jump
step halves the label-forest depth every round, so rounds needed =
O(log(diameter)) — a 1,000-hop chain converges in 9 rounds and a
10^6-hop chain fits in the default ``max_iter=20`` (measured:
BENCH/CLUSTERS.md). Lineage is truncated with localCheckpoint per
round (iterative joins otherwise stack plans exponentially).

Convergence detection is FREE of extra joins: each round's frame
carries the pre-round label alongside the new one, so "did anything
change" is a limit-1 filter over the already-materialized
(localCheckpointed) round output — three shuffling operators per round,
not four (the old-vs-new labels join the round-4 review flagged is
gone; measured −24% per-round wall on the 1,000-hop chain,
BENCH/CLUSTERS.md round-5 section).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    strict: bool = True,
    _rounds_out: list | None = None,
) -> DataFrame:
    """(id, cluster) for every id appearing in ``pairs`` (columns id_a,
    id_b); cluster = the MINIMUM id reachable through the pair graph —
    a deterministic, engine-independent cluster label.

    Convergence is O(log diameter) rounds via pointer jumping, so the
    default ``max_iter=20`` covers chains ~10^6 hops deep. If the bound
    is still hit: ``strict=True`` (default) raises RuntimeError;
    ``strict=False`` warns and returns the partial labels (still
    deterministic — every label is a reachable id, clusters may just be
    split finer than the true components). ``_rounds_out``: pass a list
    to receive the number of rounds used (test/bench introspection)."""
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .union(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        # neighbor minimum: for each vertex, the smallest label among
        # its neighbors; then take min(own, neighbor min)
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("a", "id")
        )
        # _old rides along so convergence needs no old-vs-new join later
        propagated = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
        )
        # pointer jump: label(v) ← label(label(v)). Every label IS a
        # vertex id (labels start as ids and only ever take id values),
        # so the self-join always matches; labels only decrease, and
        # label(label(v)) is reachable from v by transitivity — the
        # fixpoint (component minimum) is unchanged, but chain depth
        # halves per round: O(diameter) → O(log diameter).
        parent = propagated.select(
            F.col("id").alias("p_id"), F.col("label").alias("p_label")
        )
        round_out = (
            propagated.join(parent, propagated["label"] == parent["p_id"], "left")
            .select(
                "id",
                "_old",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        # limit-1 filter over the materialized round output — no join
        changed = round_out.where(F.col("label") != F.col("_old")).limit(1).count()
        labels = round_out.drop("_old")
        if changed == 0:
            if _rounds_out is not None:
                _rounds_out.append(it + 1)
            return labels.select("id", F.col("label").alias("cluster"))
    if _rounds_out is not None:
        _rounds_out.append(max_iter)
    if strict:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "graph has a longer chain than expected; raise max_iter or pass "
            "strict=False for partial (finer-grained) labels"
        )
    warnings.warn(
        f"connected_components hit max_iter={max_iter} before convergence; "
        "returning partial labels (components may be split)",
        RuntimeWarning,
        stacklevel=2,
    )
    return labels.select("id", F.col("label").alias("cluster"))


def duplicate_clusters(
    pairs: DataFrame,
    min_cluster_size: int = 2,
) -> DataFrame:
    """Cluster summary over near-dup pairs: (cluster, size, member_ids)
    with member_ids sorted — the frame a dedup job joins back to pick
    survivors (keep the cluster label itself = the minimum id, or feed
    canonical.keep_best for a quality-based choice)."""
    cc = connected_components(pairs)
    return (
        cc.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.array_sort(F.collect_list("id")).alias("member_ids"),
        )
        .where(F.col("size") >= min_cluster_size)
    )
