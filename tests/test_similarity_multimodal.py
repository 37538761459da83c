"""Tests for ANN search and multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkcheck.multimodal import (
    decode_image_features,
    fake_media_table,
    media_metadata,
    sample_frames,
)
from sparkcheck.similarity import cosine_topk_bruteforce, cosine_topk_bucketed


@pytest.fixture(scope="module")
def vecs(spark):
    # ring of 2-D unit vectors — exact neighbors are adjacent angles
    rows = [(i, [math.cos(i * 0.4), math.sin(i * 0.4)]) for i in range(12)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_bruteforce_topk_exact_neighbors(vecs):
    queries = vecs.where(F.col("vec_id") == 5)
    out = cosine_topk_bruteforce(vecs, queries, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [4, 6]
    assert all(abs(r["cosine"] - math.cos(0.4)) < 1e-3 for r in out)


def test_bruteforce_excludes_self_and_ranks_desc(vecs):
    out = cosine_topk_bruteforce(vecs, vecs.limit(3), k=5).collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert all(rs[i]["cosine"] >= rs[i + 1]["cosine"] for i in range(len(rs) - 1))


def test_bucketed_recall_vs_bruteforce(vecs):
    queries = vecs.where(F.col("vec_id").isin(0, 5))
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             cosine_topk_bruteforce(vecs, queries, k=1).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              cosine_topk_bucketed(vecs, queries, k=1, bucket_dims=2,
                                   probe_flips=1).collect()}
    # with 1-flip probing on 2 bucket bits, nearest (adjacent angle) found
    assert exact <= approx | exact and len(approx) == 2


def test_media_metadata_and_decode(spark):
    media = fake_media_table(spark, 30, num_partitions=3)
    meta = media_metadata(media)
    assert meta.where(~F.col("meta_bytes_match")).count() == 0
    feats = decode_image_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["decode_ok"] and len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # deterministic fake: same id → same features
    again = {r["media_id"]: r["features"] for r in decode_image_features(media).collect()}
    assert again[0] == [r["features"] for r in feats if r["media_id"] == 0][0]


def test_sample_frames_plan(spark):
    media = fake_media_table(spark, 9)
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    # only video rows (id % 3 == 2)
    assert {r["media_id"] % 3 for r in rows} == {2}


def test_ivf_topk_recall_and_determinism(spark):
    """IVF with a KMeans coarse quantizer: probing more lists raises
    recall vs brute force; fixed seed ⇒ deterministic centroids."""
    from pyspark.sql import functions as F
    from sparkcheck.similarity.ivf import ivf_topk, train_centroids

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    cents = train_centroids(emb, k=8, seed=7)
    cents2 = train_centroids(emb, k=8, seed=7)
    assert sorted(map(tuple, (r["centroid"] for r in cents.collect()))) == \
           sorted(map(tuple, (r["centroid"] for r in cents2.collect())))

    from sparkcheck.similarity import cosine_topk_bruteforce

    exact = {}
    for r in cosine_topk_bruteforce(emb, queries, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(nprobe):
        got = {}
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=nprobe).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1  # more probes never hurt
    assert r4 >= 0.3  # measured floor on these near-orthogonal vectors


def test_ivf_corpus_assignment_is_map_only(spark):
    """n_lists=1 centroid assignment must not shuffle the corpus: the
    executed plan contains NO Exchange (round-1 advice: the old window
    shape exchanged the whole corpus×k frame on vector id)."""
    from pyspark.sql import functions as F

    from sparkcheck.similarity.ivf import _assign

    corpus = spark.range(1000).select(
        F.col("id").alias("neighbor_id"),
        F.array(*[(F.pmod(F.xxhash64("id", F.lit(i)), F.lit(100)) / 50.0 - 1.0)
                  for i in range(4)]).alias("neighbor_v"),
    ).withColumn("_n", F.lit(1.0))
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id int, centroid array<double>",
    )
    assigned = _assign(corpus, centroids, "neighbor_v", "neighbor_id", n_lists=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    # broadcast of the packed centroid row is fine; a hash/range exchange
    # of the corpus is not
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    # every vector got exactly one centroid
    assert assigned.count() == 1000
    assert assigned.where(F.col("centroid_id").isNull()).count() == 0
