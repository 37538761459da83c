"""Golden + property tests for the round-6 additions: corpus snapshot
versioning (sparkcheck/versioning.py) and hashed n-gram classifier
inference (sparkcheck/textstats/classifier.py)."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from sparkcheck.textstats.classifier import (
    SCALE,
    classifier_score,
    classifier_score_joined,
    quantize_weights,
    term_bucket,
)
from sparkcheck.versioning import (
    content_fingerprint,
    diff_summary,
    revalidate_targets,
    snapshot_diff,
)


# ------------------------------------------------------------ versioning


def _snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "same", "p1"),
            (2, "before", "p1"),
            (3, "gone", "p2"),
            (5, "same-but-moved", "p3"),
            (6, None, "p4"),
            (None, "null-id", "p4"),
        ],
        "doc_id long, text string, part string",
    )
    new = spark.createDataFrame(
        [
            (1, "same", "p1"),
            (2, "after", "p1"),
            (4, "fresh", "p2"),
            (5, "same-but-moved", "p9"),
            (6, None, "p4"),
            (None, "null-id-too", "p5"),
        ],
        "doc_id long, text string, part string",
    )
    return old, new


def test_snapshot_diff_statuses(spark):
    old, new = _snaps(spark)
    d = snapshot_diff(old, new, carry_cols=("part",))
    got = {r.doc_id: r.status for r in d.collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",
        6: "unchanged",  # NULL == NULL content on both sides
    }
    # NULL ids are dropped from BOTH sides, not matched to each other
    assert None not in got


def test_content_fingerprint_null_vs_empty_and_order(spark):
    # (NULL,'a') vs ('a',NULL) vs ('','a') must all differ: the NULL
    # sentinel and the separator make column positions unambiguous
    df = spark.createDataFrame(
        [(1, None, "a"), (2, "a", None), (3, "", "a")],
        "id long, x string, y string",
    )
    fps = [
        r.fp
        for r in df.orderBy("id")
        .select(content_fingerprint(("x", "y")).alias("fp"))
        .collect()
    ]
    assert len(set(fps)) == 3


def test_diff_summary_counts(spark):
    old, new = _snaps(spark)
    d = snapshot_diff(old, new, carry_cols=("part",))
    got = {r.status: r.n_docs for r in diff_summary(d).collect()}
    assert got == {"unchanged": 3, "changed": 1, "removed": 1, "added": 1}


def test_revalidate_targets_includes_both_sides_of_a_move(spark):
    old, new = _snaps(spark)
    got = {
        r.part for r in revalidate_targets(old, new, "part").collect()
    }
    # p1: changed doc 2; p2: removed doc 3 (old side) + added doc 4
    # (new side); p3 AND p9: doc 5 moved partitions with unchanged
    # content — both must be revisited. p4 is untouched (doc 6
    # unchanged in place) and must NOT appear. p5 only held a NULL-id
    # row, which is outside the diff contract.
    assert got == {"p1", "p2", "p3", "p9"}


def test_snapshot_diff_single_join_plan(spark):
    # scale shape: map-only fingerprint projections + exactly ONE join
    old, new = _snaps(spark)
    plan = (
        snapshot_diff(old, new)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1


# ------------------------------------------------------------ classifier


_W = [((i * 37) % 101) / 100.0 - 0.5 for i in range(64)]


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "Hello world hello"),
            (2, ""),
            (3, None),
            (4, "a b  c\td\ne"),
            (5, "one"),
        ],
        "doc_id long, text string",
    )


def test_classifier_score_matches_python_model(spark):
    # independent python re-implementation of the advertised math
    import hashlib

    def bucket(term: str) -> int:
        h = hashlib.md5(f"0|{term}".encode()).hexdigest()
        return int(h[:13], 16) % 64

    wq = quantize_weights(_W)

    def score(text: str | None, bias: float, bigrams: bool) -> float:
        toks = [t for t in (text or "").lower().split() if t]
        terms = list(toks)
        if bigrams:
            terms += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        acc = sum(wq[bucket(t)] for t in terms)
        return 1.0 / (1.0 + math.exp(-(bias + acc / SCALE)))

    out = classifier_score(_docs(spark), _W, bias=0.25, bigrams=True)
    for r in out.collect():
        assert r.clf_score == score(r.text, 0.25, True), r


def test_classifier_empty_and_null_text_score_bias(spark):
    out = {
        r.doc_id: r.clf_score
        for r in classifier_score(_docs(spark), _W, bias=-1.5).collect()
    }
    expect = 1.0 / (1.0 + math.exp(1.5))
    assert out[2] == expect and out[3] == expect


def test_classifier_joined_bit_identical_and_sparse_zero_fill(spark):
    docs = _docs(spark)
    dense = {
        r.doc_id: r.clf_score
        for r in classifier_score(docs, _W, bias=0.1).collect()
    }
    wdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_W)], "bucket long, weight double"
    )
    joined = {
        r.doc_id: r.clf_score
        for r in classifier_score_joined(docs, wdf, 64, bias=0.1).collect()
    }
    assert dense == joined
    # sparse model: dropping the zero-ish rows must equal zeroing them
    w0 = list(_W)
    zeroed = {i for i in range(0, 64, 3)}
    for i in zeroed:
        w0[i] = 0.0
    dense0 = {
        r.doc_id: r.clf_score
        for r in classifier_score(docs, w0, bias=0.1).collect()
    }
    wdf_sparse = spark.createDataFrame(
        [(i, w) for i, w in enumerate(w0) if i not in zeroed],
        "bucket long, weight double",
    )
    joined0 = {
        r.doc_id: r.clf_score
        for r in classifier_score_joined(
            docs, wdf_sparse, 64, bias=0.1
        ).collect()
    }
    assert dense0 == joined0


def test_classifier_literal_path_is_map_only(spark):
    plan = (
        classifier_score(_docs(spark), _W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no per-row python anywhere


def test_classifier_joined_broadcasts_weights(spark):
    wdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_W)], "bucket long, weight double"
    )
    plan = (
        classifier_score_joined(_docs(spark), wdf, 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_term_bucket_range_and_unigram_only(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    out = df.select(
        F.transform(
            F.split(F.col("text"), " "), lambda t: term_bucket(t, 7, seed=3)
        ).alias("b")
    ).collect()[0].b
    assert all(0 <= b < 7 for b in out)
    # bigrams=False yields exactly the unigram terms
    one = classifier_score(
        spark.createDataFrame([(1, "q")], "doc_id long, text string"),
        _W,
        bigrams=False,
    ).collect()[0]
    two = classifier_score(
        spark.createDataFrame([(1, "q q")], "doc_id long, text string"),
        _W,
        bigrams=False,
    ).collect()[0]
    import hashlib

    b = int(hashlib.md5(b"0|q").hexdigest()[:13], 16) % 64
    wq = quantize_weights(_W)
    assert one.clf_score == 1.0 / (1.0 + math.exp(-(wq[b] / SCALE)))
    assert two.clf_score == 1.0 / (1.0 + math.exp(-(2 * wq[b] / SCALE)))


# ------------------------------------------------------- embedding QA


def _vecs(spark):
    nan = float("nan")
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),       # valid, norm 1
            (2, [3.0, 4.0, 0.0]),       # valid, norm 5
            (3, None),                   # NULL vector
            (4, [1.0, 2.0]),             # wrong dim
            (5, [nan, 1.0, 1.0]),        # NaN element
            (6, [0.0, 0.0, 0.0]),        # zero vector (valid but flagged)
            (7, [1.0, None, 1.0]),       # NULL element
        ],
        "vec_id long, embedding array<float>",
    )


def test_embedding_violations_flags_and_norms(spark):
    from sparkcheck.profile import embedding_violations

    rows = {
        r.vec_id: r
        for r in embedding_violations(_vecs(spark), expected_dim=3).collect()
    }
    assert rows[1].norm == 1.0 and not rows[1].is_zero
    assert rows[2].norm == 5.0
    assert rows[3].is_null and rows[3].dim is None and rows[3].norm is None
    assert rows[4].bad_dim and rows[4].dim == 2
    assert rows[5].has_nan and rows[5].norm is None
    assert rows[6].is_zero and rows[6].norm == 0.0
    assert rows[7].has_null_elem and rows[7].norm is None
    # no expected_dim declared -> bad_dim is NULL (nothing to conform to)
    nod = {
        r.vec_id: r.bad_dim
        for r in embedding_violations(_vecs(spark)).collect()
    }
    assert nod[4] is None and nod[1] is None


def test_embedding_profile_counts_and_valid_only_norm_stats(spark):
    from sparkcheck.profile import embedding_profile

    p = embedding_profile(_vecs(spark), expected_dim=3).collect()[0]
    assert p.n_rows == 7
    assert p.null_vecs == 1 and p.bad_dim_vecs == 1
    assert p.nan_vecs == 1 and p.null_elem_vecs == 1
    assert p.zero_vecs == 1
    assert p.valid_vecs == 3  # ids 1, 2, 6
    assert p.norm_min == 0.0 and p.norm_max == 5.0
    assert p.norm_mean == (1.0 + 5.0 + 0.0) / 3


def test_embedding_dim_profile_means_and_validity_mask(spark):
    from sparkcheck.profile import embedding_dim_profile

    out = {
        r.dim_idx: r
        for r in embedding_dim_profile(
            _vecs(spark), expected_dim=3
        ).collect()
    }
    # valid vectors: ids 1, 2, 6 -> dim 0 values (1, 3, 0)
    assert set(out) == {0, 1, 2}
    assert out[0].n == 3 and out[0].mean == (1.0 + 3.0 + 0.0) / 3
    assert out[1].mean == (0.0 + 4.0 + 0.0) / 3


def test_embedding_paths_stay_jvm_side(spark):
    from sparkcheck.profile import embedding_profile

    plan = (
        embedding_profile(_vecs(spark), expected_dim=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan  # no per-row python


def test_classifier_logits_col_is_exact_preimage(spark):
    # the logit output is the exact-integer-derived preimage of the
    # sigmoid: score == 1/(1+exp(-logit)), and thresholding on it is
    # monotone-equivalent to thresholding on the score
    out = classifier_score(
        _docs(spark), _W, bias=0.3, bigrams=True, logits_col="logit"
    ).collect()
    for r in out:
        assert r.clf_score == 1.0 / (1.0 + math.exp(-r.logit))
    ordered = sorted(out, key=lambda r: r.logit)
    assert [r.doc_id for r in ordered] == [
        r.doc_id for r in sorted(out, key=lambda r: r.clf_score)
    ]


# ------------------------------------------------ in-engine NB training


def test_train_nb_classifier_matches_python_mirror_and_separates(spark):
    import math
    from collections import Counter

    from sparkcheck.textstats.classifier import (
        SCALE,
        classifier_score,
        train_nb_classifier,
    )
    from sparkcheck.sampling import fold_hex52  # noqa: F401 (import check)

    pos_txt = "the cat sat on the mat today"
    neg_txt = "zzz spam buy now cheap pills"
    rows = (
        [(i, 1, pos_txt) for i in range(20)]
        + [(100 + i, 0, neg_txt) for i in range(20)]
        + [(200, None, "dropped"), (201, 1, None)]  # NULL label / NULL text
    )
    df = spark.createDataFrame(rows, "doc_id long, y int, text string")
    dim, seed = 32, 5
    w, b = train_nb_classifier(df, "y", dim=dim, bigrams=False, seed=seed)

    # python mirror: same hashing (via spark one-row probe is overkill —
    # reuse the trained model's own separation + exact priors)
    # bias: 21 positive docs (incl. the NULL-text one) vs 20 negative
    assert b == round(math.log(21 / 20) * SCALE) / SCALE
    # token mass: weights must be positive on pos-only buckets and
    # negative on neg-only ones
    import hashlib

    def bucket(t):
        h = hashlib.md5(f"{seed}|{t}".encode()).hexdigest()
        return int(h[:13], 16) % dim

    pos_counts: Counter = Counter()
    neg_counts: Counter = Counter()
    for _ in range(20):
        for t in pos_txt.split():
            pos_counts[bucket(t)] += 1
        for t in neg_txt.split():
            neg_counts[bucket(t)] += 1
    tp, tn = sum(pos_counts.values()), sum(neg_counts.values())
    exp_w = [
        round(
            (
                math.log((pos_counts.get(bb, 0) + 1.0) / (tp + dim))
                - math.log((neg_counts.get(bb, 0) + 1.0) / (tn + dim))
            )
            * SCALE
        )
        / SCALE
        for bb in range(dim)
    ]
    assert w == exp_w

    scored = classifier_score(
        df.where("y is not null and text is not null"),
        w, bias=b, bigrams=False, seed=seed,
    ).collect()
    pos_s = [r["clf_score"] for r in scored if r["y"] == 1]
    neg_s = [r["clf_score"] for r in scored if r["y"] == 0]
    assert min(pos_s) > 0.9 and max(neg_s) < 0.1


def test_train_nb_classifier_requires_both_classes(spark):
    from sparkcheck.textstats.classifier import train_nb_classifier

    df = spark.createDataFrame(
        [(1, 1, "only positives here")], "doc_id long, y int, text string"
    )
    with pytest.raises(ValueError, match="both classes"):
        train_nb_classifier(df, "y", dim=8)
