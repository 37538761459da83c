"""Duplicate-cluster formation: connected components over near-dup
pairs — the step between pair detection (jaccard / minhash / simhash /
embedding LSH) and canonical selection (dedup.canonical.keep_best).

Not in the reference (it has no dedup at all); this is the standard
web-corpus construction: LSH emits PAIRS, but dedup decisions need
CLUSTERS (a 5-way near-dup group arrives as up to 10 pairs), and each
cluster keeps one representative.

Algorithm: iterative min-label propagation (the dataframe form of
large-star/small-star, Kiveris et al. '14 "Connected Components in
MapReduce and Beyond"):

    label(v) ← min(label(v), min over neighbors' labels)

repeated to fixpoint. Each round is one join + one groupBy (both on
the vertex id — AQE reuses the partitioning); rounds needed =
O(log(diameter)) with path-doubling, O(diameter) with plain
propagation. Near-dup clusters are dense and tiny (diameter ≤ ~3 for
transitively-similar docs), so plain propagation converges in a few
rounds — ``max_iter`` guards pathological chains. Lineage is truncated
with localCheckpoint per round (iterative joins otherwise stack plans
exponentially); convergence is detected with a one-row count of
changed labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster) for every id appearing in ``pairs`` (columns id_a,
    id_b); cluster = the MINIMUM id reachable through the pair graph —
    a deterministic, engine-independent cluster label.

    Raises RuntimeError if ``max_iter`` rounds don't converge (a chain
    longer than max_iter — raise the bound or pre-bucket the input)."""
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
    for _ in range(max_iter):
        # neighbor minimum: for each vertex, the smallest label among
        # its neighbors; then take min(own, neighbor min)
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph has a longer chain than expected; raise max_iter"
    )


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
