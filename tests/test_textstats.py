"""Golden tests for text-analysis operators (pattern 2 of SURVEY §5:
deterministic rows with planted cases ⇒ exact expected outputs)."""

from __future__ import annotations

import hashlib

import pytest

from sparkcheck.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    rolling_fingerprints,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "el perro de la casa que ladra"),
        (2, "xyzzy plugh"),
        (3, "a a a a"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_stats(docs):
    out = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert out[0]["n_tokens"] == 6
    assert out[0]["n_distinct_tokens"] == 5  # 'the' twice
    assert out[3]["n_distinct_tokens"] == 1
    assert out[0]["n_subtokens"] == 6  # pure letter runs


def test_quality_score_bounds_and_stopwords(docs):
    out = {r["doc_id"]: r for r in quality_score(docs).collect()}
    for r in out.values():
        assert 0.0 <= r["quality"] <= 1.0
    assert out[0]["stop_ratio"] > 0  # 'the' x2, 'on'? no — the,the => 2/6
    assert out[2]["stop_ratio"] == 0.0
    assert out[3]["diversity"] == 0.25


def test_lang_id(docs):
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "und"  # no markers at all
    assert out[3] == "en"   # 'a' is an en marker


def test_fingerprint_matches_hashlib(docs):
    out = {r["doc_id"]: r for r in fingerprint(docs).collect()}
    assert out[0]["fp_raw"] == hashlib.md5(b"the cat sat on the mat").hexdigest()
    # normalization: case + whitespace collapse
    assert out[0]["fp_norm"] == out[0]["fp_raw"]  # already normalized


def test_rolling_fingerprints_deterministic_and_shift_robust(spark):
    base = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(0, base), (1, "PREFIX " + base), (2, "totally different content here")],
        ["doc_id", "text"],
    )
    rows = rolling_fingerprints(df, k=5, window=3).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    # winnowing is position-robust: shifted doc shares most fingerprints
    inter01 = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    inter02 = len(fps[0] & fps[2]) / len(fps[0] | fps[2])
    assert inter01 > 0.5
    assert inter02 < 0.2
    # deterministic across invocations
    again = rolling_fingerprints(df, k=5, window=3).collect()
    fps2 = {}
    for r in again:
        fps2.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps == fps2


def test_gopher_quality_flags(spark):
    from sparkcheck.textstats.analysis import gopher_quality_flags

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),   # clean → keep
        (1, "too short"),                                     # word count
        (2, "# # # # # # # the a"),                           # symbol ratio
        (3, "xyzzy plugh quux foobar bazqux"),                # no stopword
        (4, "a b c d e f g h i j"),                           # mean word len < 2
        (5, None),                                            # NULL text skipped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert out[0]["keep"] == 1
    assert out[1]["f_word_count"] == 1 and out[1]["keep"] == 0
    assert out[2]["f_symbol_ratio"] == 1 and out[2]["keep"] == 0
    assert out[3]["f_no_stopword"] == 1 and out[3]["keep"] == 0
    assert out[4]["f_mean_word_len"] == 1 and out[4]["keep"] == 0
    assert 5 not in out  # NULL-skip contract: pair with null_check to reject


def test_rolling_fingerprints_bit_identical_to_scalar_reference(spark):
    """The vectorized Mersenne-modular gram hash must reproduce the
    scalar rolling recurrence h = (h*B + byte) mod M byte-for-byte
    (round-1 implementation semantics), including the winnowed pick set."""
    import random

    B, M = 257, (1 << 61) - 1

    def scalar_winnow(s: str, k: int, window: int) -> list[int]:
        from collections import deque

        b = s.encode("utf-8", "surrogatepass")
        if len(s) < k or len(b) < k:
            return []
        n = len(b) - k + 1
        h = []
        cur = 0
        bk = pow(B, k - 1, M)
        for i in range(k):
            cur = (cur * B + b[i]) % M
        h.append(cur)
        for i in range(1, n):
            cur = ((cur - b[i - 1] * bk) * B + b[i + k - 1]) % M
            h.append(cur)
        if n <= window:
            return [min(h)]
        picks = set()
        dq: deque[int] = deque()
        for i in range(n):
            while dq and h[dq[-1]] >= h[i]:
                dq.pop()
            dq.append(i)
            if dq[0] <= i - window:
                dq.popleft()
            if i >= window - 1:
                picks.add(h[dq[0]])
        return sorted(picks)

    rng = random.Random(7)
    docs = [
        "",
        "short",
        "a" * 50,                                  # degenerate: equal hashes
        "the quick brown fox jumps over the lazy dog",
        "héllo wörld — unicode ✓ bytes beyond ascii " * 3,
        "".join(chr(rng.randrange(32, 0x2FF)) for _ in range(400)),
        "".join(chr(rng.randrange(97, 123)) for _ in range(1000)),
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               ["doc_id", "text"])
    for k, window in [(8, 4), (5, 3), (4, 10)]:
        got: dict[int, list[int]] = {i: [] for i in range(len(docs))}
        for r in rolling_fingerprints(df, k=k, window=window).collect():
            got[r["doc_id"]].append(r["fingerprint"])
        for i, d in enumerate(docs):
            assert sorted(got[i]) == scalar_winnow(d, k, window), (i, k, window)


def test_pii_stats_and_redact(spark):
    from sparkcheck.textstats import pii_redact, pii_stats

    rows = [
        (0, "mail me at a.b+c@ex-site.org or x@y.io thanks"),
        (1, "ssn is 123-45-6789 and phone (415) 555-0101"),
        (2, "server 192.168.0.1 clean text"),
        (3, "nothing sensitive here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert set(s) == {0, 1, 2, 3}  # NULL skipped
    assert s[0]["n_email"] == 2 and s[0]["any_pii"] == 1
    assert s[1]["n_ssn"] == 1 and s[1]["n_phone_us"] == 1
    assert s[2]["n_ip_address"] == 1
    assert s[3]["n_pii_total"] == 0 and s[3]["any_pii"] == 0

    red = {r["doc_id"]: r["redacted_text"] for r in pii_redact(df).collect()}
    assert red[0] == "mail me at [PII] or [PII] thanks"
    assert red[1] == "ssn is [PII] and phone [PII]"
    assert red[2] == "server [PII] clean text"
    assert red[3] == "nothing sensitive here"


def test_repetition_and_duplicate_segments(spark):
    from sparkcheck.textstats import duplicate_segment_stats, repetition_stats

    rows = [
        (0, "buy now buy now buy now buy now"),   # bigram "buy now" dominates
        (1, "each of these twelve little words appears exactly once in this sentence"),
        (2, "short"),                              # < n words -> whole text gram
        (3, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = {x["doc_id"]: x for x in repetition_stats(df, n=2).collect()}
    assert set(r) == {0, 1, 2}
    assert r[0]["top_gram_n"] == 4 and r[0]["f_repetitive"] == 1  # 4/7 "buy now"
    assert r[1]["top_gram_n"] == 1 and r[1]["f_repetitive"] == 0
    assert r[2]["n_grams"] == 1 and r[2]["top_gram_frac"] == 1.0

    seg = [
        (0, "line a\nline b\nline a\nline c"),
        (1, "u1\nu2\nu3"),
    ]
    sdf = spark.createDataFrame(seg, ["doc_id", "text"])
    d = {x["doc_id"]: x for x in duplicate_segment_stats(sdf).collect()}
    assert d[0]["n_segments"] == 4 and abs(d[0]["dup_segment_frac"] - 0.25) < 1e-9
    assert d[1]["dup_segment_frac"] == 0.0


def test_winnow_near_duplicates(spark):
    from sparkcheck.textstats import winnow_near_duplicates

    base = "the quick brown fox jumps over the lazy dog while rain falls on rooftops"
    rows = [
        (0, base),
        (1, "INTRO ADDED " + base),             # shifted copy: shares fingerprints
        (2, "totally different content about spark shuffles, joins and caches"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["shared_fingerprints"]
             for r in winnow_near_duplicates(df, min_shared=2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(p == (0, 1) for p in pairs), pairs
    # the hot-fingerprint guard drops ubiquitous fingerprints
    many = spark.createDataFrame(
        [(i, base) for i in range(20)], ["doc_id", "text"])
    none = winnow_near_duplicates(many, min_shared=1, max_fingerprint_freq=5)
    assert none.count() == 0  # every fingerprint is in all 20 docs -> dropped


def test_cross_doc_span_stats_golden(spark):
    """Hand-checked cross-doc span dedup (k=2 blocks, min_docs=2):
    docs 0/1 share their first block; doc 2 shares nothing; a doc
    shorter than k words drops out (no spans)."""
    from sparkcheck.textstats import cross_doc_span_stats

    df = spark.createDataFrame(
        [
            (0, "shared pair unique zero"),     # blocks: 'shared pair', 'unique zero'
            (1, "shared pair other one"),       # blocks: 'shared pair', 'other one'
            (2, "totally different words here"),
            (3, "short"),                       # < k words -> no spans
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cross_doc_span_stats(df, k=2).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_spans"] == 2 and rows[0]["shared_spans"] == 1
    assert rows[0]["shared_frac"] == 0.5
    assert rows[1]["shared_frac"] == 0.5
    assert rows[2]["shared_spans"] == 0 and rows[2]["shared_frac"] == 0.0


def test_cross_doc_span_stats_within_doc_repeat_not_shared(spark):
    """A block repeated WITHIN one doc only is not cross-doc shared
    (array_distinct dedups in-row before counting docs)."""
    from sparkcheck.textstats import cross_doc_span_stats

    df = spark.createDataFrame(
        [(0, "rep rep rep rep"), (1, "other stuff here too")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cross_doc_span_stats(df, k=2).collect()}
    assert rows[0]["n_spans"] == 1  # 'rep rep' twice in-doc -> one distinct span
    assert rows[0]["shared_spans"] == 0


def test_span_contamination_golden(spark):
    """Hand-checked decontamination: doc sharing one of two spans with
    the benchmark scores 0.5; clean doc scores 0."""
    from sparkcheck.textstats import span_contamination

    corpus = spark.createDataFrame(
        [(1, "leaked pair own words"), (2, "fully clean text body")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "leaked pair something else entirely")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            span_contamination(corpus, bench, k=2).collect()}
    assert rows[1]["n_spans"] == 2 and rows[1]["contaminated_spans"] == 1
    assert rows[1]["contamination_frac"] == 0.5
    assert rows[2]["contaminated_spans"] == 0 and rows[2]["contamination_frac"] == 0.0


def test_cross_doc_span_stats_hash_blocks_parity(spark):
    """The 64-bit-hashed scale path returns identical results to the
    exact-string path (collisions need ~2^32 distinct blocks)."""
    from sparkcheck.textstats import cross_doc_span_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = cross_doc_span_stats(docs, k=6)
    hashed = cross_doc_span_stats(docs, k=6, hash_blocks=True)
    assert exact.exceptAll(hashed).count() == 0
    assert hashed.exceptAll(exact).count() == 0


def test_cross_doc_span_stats_duplicate_ids_not_double_counted(spark):
    """A duplicated doc_id (same url crawled m times, hashed to one id)
    must collapse to ONE logical document: one output row, distinct
    blocks counted once, and — critically — its own copies must NOT
    make its spans 'cross-document' shared (no other doc has them).
    The naive per-copy count would inflate quadratically in m AND call
    every re-crawled doc 100% boilerplate."""
    from sparkcheck.textstats import cross_doc_span_stats

    rows = [(7, "dup pair text body")] * 3 + [(1, "other words go here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cross_doc_span_stats(df, k=2).collect()}
    assert len(out) == 2
    assert out[7]["n_spans"] == 2 and out[7]["shared_spans"] == 0
    assert out[1]["shared_spans"] == 0
    # a block shared by two DISTINCT docs still counts
    df2 = spark.createDataFrame(
        [(7, "dup pair text body")] * 2 + [(8, "dup pair more words")],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r for r in cross_doc_span_stats(df2, k=2).collect()}
    assert out2[7]["shared_spans"] == 1 and out2[8]["shared_spans"] == 1


def test_remove_duplicate_spans_golden(spark):
    """Rewrite half of span dedup: a 6-word block shared by 2+ docs is
    removed from every doc; unique blocks and the <k trailing remainder
    survive; short docs pass through; a fully-boilerplate doc empties."""
    from sparkcheck.textstats import remove_duplicate_spans

    boiler = "please accept cookies to continue reading"        # 6 words
    a_rest = "unique alpha content words here one"              # 6 words
    b_rest = "different beta content words here two"            # 6 words
    rows = [
        (1, f"{boiler} {a_rest} tail bit"),   # boiler + unique + 2-word remainder
        (2, f"{boiler} {b_rest}"),            # boiler + unique
        (3, boiler),                          # all boilerplate -> empties
        (4, "short doc"),                     # < k words: unchanged
        (5, None),                            # NULL skipped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, k=6, min_docs=2).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["clean_text"] == f"{a_rest} tail bit"
    assert (out[1]["n_spans"], out[1]["removed_spans"]) == (2, 1)
    assert out[2]["clean_text"] == b_rest
    assert out[3]["clean_text"] == "" and out[3]["removed_spans"] == 1
    assert out[4]["clean_text"] == "short doc" and out[4]["n_spans"] == 0

    # min_docs above the block's 3-doc spread -> nothing removed
    out4 = {r["doc_id"]: r["removed_spans"] for r in
            remove_duplicate_spans(df, k=6, min_docs=4).collect()}
    assert all(v == 0 for v in out4.values())

    # a doc repeating the shared block twice loses BOTH positions
    df2 = spark.createDataFrame(
        [(1, f"{boiler} {boiler} {a_rest}"), (2, boiler)],
        "doc_id long, text string")
    r1 = {r["doc_id"]: r for r in
          remove_duplicate_spans(df2, k=6, min_docs=2).collect()}
    assert r1[1]["clean_text"] == a_rest and r1[1]["removed_spans"] == 2


def test_remove_duplicate_spans_persisted_path_identical(spark):
    """storage_level= persists the tokenized base (one tokenize pass);
    output must be identical to the default re-scan path."""
    from pyspark import StorageLevel

    from sparkcheck.textstats import remove_duplicate_spans

    boiler = "please accept cookies to continue reading"
    rows = [(1, f"{boiler} unique alpha text body words here"),
            (2, f"{boiler} other beta text body words there")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, remove_duplicate_spans(df, k=6, min_docs=2).collect()))
    b = sorted(map(tuple, remove_duplicate_spans(
        df, k=6, min_docs=2,
        storage_level=StorageLevel.MEMORY_AND_DISK).collect()))
    assert a == b
    spark.catalog.clearCache()


# ----------------------------------------------------- LM perplexity (CCNet)


def _sb_mirror(train_texts, n=3, alpha=0.4, min_count=1):
    """Pure-python stupid-backoff reference (counts + scorer)."""
    from collections import Counter

    cnt: Counter = Counter()
    N = 0
    for d in train_texts:
        t = [x for x in d.split(" ") if x]
        N += len(t)
        for o in range(1, n + 1):
            for i in range(o, len(t) + 1):
                cnt[" ".join(t[i - o : i])] += 1
    if min_count > 1:
        cnt = Counter(
            {g: c for g, c in cnt.items()
             if " " not in g or c >= min_count}
        )

    def score(t, i):
        s = cnt[t[i]] / N if t[i] in cnt else 1.0 / N
        for o in range(2, n + 1):
            if i - o + 1 < 0:
                continue
            g = " ".join(t[i - o + 1 : i + 1])
            c = " ".join(t[i - o + 1 : i])
            if g in cnt and c in cnt:
                s = cnt[g] / cnt[c]
            else:
                s = alpha * s
        return s

    return cnt, N, score


_LM_TRAIN = ["the cat sat on the mat", "the cat ate the fish"]


@pytest.fixture(scope="module")
def lm_counts(spark):
    from sparkcheck.textstats import train_ngram_counts

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_LM_TRAIN)], ["doc_id", "text"]
    )
    return train_ngram_counts(train, n=3)


def test_train_ngram_counts_golden(lm_counts):
    got = {r["gram"]: (r["ord"], r["cnt"]) for r in lm_counts.collect()}
    mirror, n_tok, _ = _sb_mirror(_LM_TRAIN)
    assert got == {
        g: (g.count(" ") + 1, c) for g, c in mirror.items()
    }
    assert sum(c for (o, c) in got.values() if o == 1) == n_tok == 11


def test_perplexity_scores_match_python_mirror(spark, lm_counts):
    import math

    from sparkcheck.textstats import perplexity_scores
    from sparkcheck.textstats.lm import MICRO

    texts = {
        10: "the cat sat",          # all orders hit
        11: "the dog sat on the mat",  # OOV mid-doc
        12: "zebra",                 # single OOV token
    }
    score_df = spark.createDataFrame(
        list(texts.items()) + [(13, ""), (14, None)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in perplexity_scores(score_df, lm_counts, n=3).collect()
    }
    # empty / NULL text docs have no positions and are absent
    assert set(out) == set(texts)
    _, _, sb = _sb_mirror(_LM_TRAIN)
    for did, text in texts.items():
        t = text.split(" ")
        lp = sum(round(math.log(sb(t, i)) * MICRO) for i in range(len(t)))
        assert out[did]["n_tokens"] == len(t)
        assert out[did]["logprob_micro"] == lp
        avg = lp / MICRO / len(t)
        assert out[did]["avg_logprob"] == pytest.approx(round(avg, 6))
        assert out[did]["perplexity"] == pytest.approx(
            round(math.exp(-avg), 3)
        )
    # the OOV-heavy doc must look worse than the in-domain one
    assert out[11]["perplexity"] > out[10]["perplexity"]


def test_min_count_prunes_higher_orders_only(spark):
    from pyspark.sql import functions as F

    from sparkcheck.textstats import train_ngram_counts

    train = spark.createDataFrame(
        [(0, "a b a b c")], ["doc_id", "text"]
    )
    pruned = train_ngram_counts(train, n=2, min_count=2)
    got = {r["gram"]: r["cnt"] for r in pruned.collect()}
    # 'a b' seen twice survives; 'b a' / 'b c' seen once are pruned
    assert got["a b"] == 2 and "b a" not in got and "b c" not in got
    # unigrams are NEVER pruned: N stays the true token count
    n = (
        pruned.where(F.col("ord") == 1)
        .agg(F.sum("cnt").alias("n"))
        .collect()[0]["n"]
    )
    assert n == 5 and got["c"] == 1


def test_pruned_bigram_falls_back_with_alpha(spark):
    import math

    from sparkcheck.textstats import perplexity_scores, train_ngram_counts
    from sparkcheck.textstats.lm import MICRO

    train = spark.createDataFrame([(0, "a b a b c")], ["doc_id", "text"])
    full = train_ngram_counts(train, n=2)
    pruned = train_ngram_counts(train, n=2, min_count=2)
    doc = spark.createDataFrame([(1, "b c")], ["doc_id", "text"])
    lp_full = perplexity_scores(doc, full, n=2).collect()[0]["logprob_micro"]
    lp_pruned = perplexity_scores(doc, pruned, n=2).collect()[0][
        "logprob_micro"
    ]
    # full: P(b)=2/5, P(c|b)=1/2; pruned: 'b c' gone -> 0.4 * P(c)=0.4/5
    assert lp_full == round(math.log(2 / 5) * MICRO) + round(
        math.log(1 / 2) * MICRO
    )
    assert lp_pruned == round(math.log(2 / 5) * MICRO) + round(
        math.log(0.4 * 1 / 5) * MICRO
    )


def test_perplexity_broadcast_plan(spark, lm_counts):
    from sparkcheck.textstats import perplexity_scores

    doc = spark.createDataFrame([(1, "the cat sat")], ["doc_id", "text"])
    plan = (
        perplexity_scores(doc, lm_counts, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all five count lookups broadcast; nothing falls to a sort-merge join
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_perplexity_buckets_terciles(spark, lm_counts):
    from sparkcheck.textstats import perplexity_buckets, perplexity_scores

    rows = [
        (i, lang, f"w{i % 7} w{(i + 1) % 5} w{(i + 2) % 3}")
        for i, lang in enumerate(["en"] * 9 + ["fr"] * 6)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    scored = perplexity_scores(docs, lm_counts, n=3, keep_cols=("lang",))
    out = perplexity_buckets(scored, by="lang").collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert sorted(
        sum(1 for r in by_lang["en"] if r["ppl_bucket"] == b)
        for b in (1, 2, 3)
    ) == [3, 3, 3]
    assert sorted(
        sum(1 for r in by_lang["fr"] if r["ppl_bucket"] == b)
        for b in (1, 2, 3)
    ) == [2, 2, 2]
    # bucket order follows perplexity order within each lang
    for rs in by_lang.values():
        rs.sort(key=lambda r: (r["perplexity"], r["doc_id"]))
        assert [r["ppl_bucket"] for r in rs] == sorted(
            r["ppl_bucket"] for r in rs
        )


def test_distinctive_terms_tfidf_golden(spark):
    import math

    from sparkcheck.textstats.analysis import distinctive_terms

    rows = [
        (0, "a", "cat cat cat shared"),
        (1, "a", "cat shared"),
        (2, "b", "dog dog shared"),
        (3, "b", "dog shared shared"),
        (4, None, "noise noise"),   # NULL group dropped
        (5, "a", None),             # NULL text dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = {
        (r["src"], r["term"]): (r["tf"], r["df"], r["tfidf_micro"], r["rank"])
        for r in distinctive_terms(df, "src", top_k=2).collect()
    }
    # N = 4 group-and-text docs; df: cat 2, dog 2, shared 4
    idf_cat = round(math.log(4 / 2) * 1e6)
    assert out[("a", "cat")] == (4, 2, 4 * idf_cat, 1)
    assert out[("b", "dog")] == (3, 2, 3 * idf_cat, 1)
    # ubiquitous term scores exactly zero (ln 1) but still ranks 2nd
    assert out[("a", "shared")][2] == 0 and out[("a", "shared")][3] == 2
    assert all(r[3] <= 2 for r in out.values())
    assert not any(g is None for g, _ in out)


def test_perplexity_empty_model_fails_at_call_time(spark):
    from sparkcheck.textstats import perplexity_scores, train_ngram_counts

    empty = spark.createDataFrame([(1, None)], "doc_id int, text string")
    counts = train_ngram_counts(empty, n=2)
    doc = spark.createDataFrame([(2, "hello world")], "doc_id int, text string")
    with pytest.raises(ValueError, match="empty"):
        perplexity_scores(doc, counts, n=2)


def test_chunk_documents_windows_and_coverage(spark):
    from sparkcheck.textstats.analysis import chunk_documents

    rows = [
        (0, "a b c d e f g h i j"),  # 10 tokens
        (1, "x y"),                  # shorter than the window
        (2, ""),                     # empty: no chunks
        (3, None),                   # NULL: no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=4, overlap=1).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    assert set(by) == {0, 1}
    # starts 0, 3, 6 (stride 3): every token covered, final chunk has
    # new content (no pure-suffix duplicate)
    chunks = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in by[0]
    )
    assert chunks == [(0, "a b c d"), (1, "d e f g"), (2, "g h i j")]
    assert all(r["n_chunk_tokens"] == len(r["chunk_text"].split()) for r in out)
    assert by[1] == [by[1][0]] and by[1][0]["chunk_text"] == "x y"

    # coverage property on a longer doc: concatenated non-overlap
    # prefixes reproduce the original token stream
    long = spark.createDataFrame(
        [(9, " ".join(f"t{i}" for i in range(53)))], "doc_id long, text string"
    )
    got = sorted(
        (r["chunk_id"], r["chunk_text"].split())
        for r in chunk_documents(long, max_tokens=8, overlap=3).collect()
    )
    stream = []
    for cid, toks in got:
        stream.extend(toks if cid == 0 else toks[3:])
    assert stream == [f"t{i}" for i in range(53)]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)
    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, max_tokens=0)


def test_perplexity_buckets_threshold_mode_scales_without_group_sort(spark, lm_counts):
    from pyspark.sql import functions as F

    from sparkcheck.textstats import perplexity_buckets, perplexity_scores

    # vary both composition and length so perplexities take many
    # distinct values — threshold cuts on heavily-tied scores can
    # legitimately empty a middle bucket (documented semantics)
    rows = [
        (
            i,
            "en",
            " ".join(
                (["the", "cat", "sat"] * (i % 5 + 1))[: 3 + i % 17]
                + [f"w{j % (2 + i % 7)}" for j in range(i % 11)]
            ),
        )
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    scored = perplexity_scores(docs, lm_counts, n=3, keep_cols=("lang",))
    out = perplexity_buckets(scored, by="lang", method="threshold").collect()
    sizes = {b: sum(1 for r in out if r["ppl_bucket"] == b) for b in (1, 2, 3)}
    assert set(sizes) == {1, 2, 3} and all(v > 0 for v in sizes.values())
    # monotone: every head doc scores <= every tail doc
    head_max = max(r["perplexity"] for r in out if r["ppl_bucket"] == 1)
    tail_min = min(r["perplexity"] for r in out if r["ppl_bucket"] == 3)
    assert head_max <= tail_min
    # no per-group sort: the plan must not contain a window at all
    plan = (
        perplexity_buckets(scored, by="lang", method="threshold")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # no Window physical operator (the ntile path's per-group sort);
    # bare substring checks trip on 'perceNTILE_approx'
    assert not re.search(r"\bWindow\s*\[", plan)
    assert "ntile(" not in plan
    import pytest as _pytest
    with _pytest.raises(ValueError, match="method"):
        perplexity_buckets(scored, method="median")


def test_distinctive_terms_min_df_prunes_hapaxes(spark):
    from sparkcheck.textstats.analysis import distinctive_terms

    rows = [(0, "a", "rare cat cat"), (1, "a", "cat dog"), (2, "b", "dog")]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out = {r["term"] for r in distinctive_terms(df, "src", min_df=2).collect()}
    assert "rare" not in out and "cat" in out and "dog" in out


def test_punct_translate_count_equals_regex(spark):
    """Round-7 pin: quality_score's translate-based punct count is
    exactly regexp_count(text, '[^A-Za-z0-9\\s]') — incl. accents,
    non-BMP emoji, every Java \\s member, empty and NULL text."""
    from pyspark.sql import functions as F

    from sparkcheck.textstats.analysis import _ALNUM_WS

    rows = [
        ("a b,c!",), ("héllo wörld...",), ("emoji \U0001F600 ok?",),
        ("\ttabs\nnew\x0b\x0c\r",), ("",), (None,), ("....",),
    ]
    df = spark.createDataFrame(rows, "text string")
    bad = df.select(
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).alias("re"),
        F.length(F.translate(F.col("text"), _ALNUM_WS, "")).alias("tr"),
    ).where(
        F.col("re").eqNullSafe(F.col("tr")) == False  # noqa: E712
    ).count()
    assert bad == 0


def test_gopher_mean_word_len_closed_form(spark):
    """Round-7 pin: length(text) - size(tokens) + 1 equals the summed
    token lengths for split-on-space semantics, incl. leading/trailing/
    double spaces and empty text."""
    from pyspark.sql import functions as F

    rows = [("a bb ccc",), (" lead",), ("trail ",), ("two  gaps",), ("",), ("   ",)]
    df = spark.createDataFrame(rows, "text string")
    toks = F.split(F.col("text"), " ")
    bad = df.select(
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).alias("s"),
        (F.length(F.col("text")) - F.size(toks) + 1).alias("c"),
    ).where("s <> c").count()
    assert bad == 0
