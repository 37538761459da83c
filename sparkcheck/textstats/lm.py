"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. '20, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document against an n-gram
LM trained on a trusted reference corpus, then keep/weight by
perplexity (CCNet buckets each language into head/middle/tail
terciles). The smoothing is stupid backoff (Brants et al. '07, "Large
Language Models in Machine Translation"):

    S(w | ctx)  =  count(ctx w) / count(ctx)      if count(ctx w) > 0
                =  alpha * S(w | shorter ctx)      otherwise
    S(w)        =  count(w) / N                    (unigram base)
                =  1 / N                           (OOV floor)

— chosen over Kneser-Ney deliberately: it needs only raw counts (one
groupBy per order, no discount estimation pass), its scores are pure
ratios of BIGINT counts (bit-identical across engines, which is what
makes the DuckDB oracle possible), and at web scale it is the
smoothing the original paper used precisely because it distributes.

Execution shape (design-for-10^12-docs):

  - ``train_ngram_counts``: tokens arrays stay unexploded until ONE
    explode over all orders at once, then ONE groupBy(gram) with
    map-side partial counts — shuffle volume is O(distinct grams),
    not O(corpus positions). ``min_count`` pruning (orders >= 2 only,
    so the unigram total N stays the true token count) is what turns
    a web-scale count table into a broadcastable model, exactly like
    KenLM pruning in CCNet.
  - ``perplexity_scores``: one explode to O(positions) rows carrying
    the 2n-1 lookup strings, then 2n-1 LEFT joins against the counts
    frame — broadcast-hash joins when ``broadcast_counts=True`` (the
    pruned-LM deployment; all 2n-1 joins fuse into the scan stage with
    zero shuffle), shuffle joins otherwise — and ONE groupBy(doc) whose
    map-side partials shrink the result back to O(docs).

Determinism contract: every per-position score is a ratio of BIGINTs
(IEEE double division is correctly rounded, so Spark and DuckDB agree
bit-for-bit); the only libm call per position is ln(), absorbed by
rounding to integer MICRO-NATS before the exact BIGINT per-doc sum —
an engine ln() discrepancy of ~1 ulp moves the rounded micro-nat value
only if the true value sits within ~1e-10 of a rounding boundary.
``logprob_micro`` is therefore exact and hashable; the floating
``avg_logprob`` / ``perplexity`` are rounded once at the end.

No reference analog — the reference validates structured rows; this is
the corpus-quality operator the north-star pipeline runs between
heuristic rules (gopher_quality) and model-based filtering
(textstats/classifier.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# log-probabilities are accumulated in integer micro-nats so the
# per-document sum is an EXACT BIGINT (order-proof, engine-portable);
# one division by MICRO at the end turns it back into nats
MICRO = 1_000_000


def _tokens(text_col: Column) -> Column:
    """Space-tokenize, dropping empty tokens — the corpus convention
    shared with dedup.jaccard.shingle_expr (synthetic webtext is
    single-line space-joined; real text should be pre-normalized)."""
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def _gram_ending_at(toks: Column, i: Column, order: int) -> Column:
    """The ``order``-gram ending at 1-based position ``i`` (space-
    joined), NULL when the position is too early for the order."""
    return F.when(
        i >= order, F.array_join(F.slice(toks, i - (order - 1), order), " ")
    )


def train_ngram_counts(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Raw n-gram counts of every order 1..n over a reference corpus:
    (gram string, ord int, cnt bigint). Orders never collide textually
    (an order-o gram contains exactly o-1 spaces and tokens contain
    none), so one flat table serves both the gram and the context
    lookups of stupid backoff.

    ``min_count`` drops grams of order >= 2 seen fewer times (they
    fall to the backoff path at scoring time) — the pruning that makes
    a web-scale model broadcast-sized. Unigrams are NEVER pruned: their
    sum is the token total N, and pruning them would silently deflate
    every base probability.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.col("_toks")
    sz = F.size(toks)
    # per order: all grams of that order as an array (empty when the
    # doc is shorter than the order); concat + ONE explode for all
    # orders. sequence() is guarded — Spark's sequence(1, 0) counts
    # DOWN, it is not empty. The lambda MUST be single-argument: a
    # two-arg lambda makes F.transform pass the element INDEX as the
    # second argument, silently shadowing any default-bound loop var.
    # The token array is MATERIALIZED as a column first: higher-order
    # lambdas are interpreted and re-evaluate any non-column expression
    # they reference once per element — an inline split() makes gram
    # generation O(tokens²) per doc (dedup.jaccard.shingles_from_tokens).
    def _grams_of_order(o: int) -> Column:
        return F.when(
            sz >= o,
            F.transform(
                F.sequence(F.lit(o), sz),
                lambda i: _gram_ending_at(toks, i, o),
            ),
        ).otherwise(F.array().cast("array<string>"))

    per_order = [_grams_of_order(o) for o in range(1, n + 1)]
    grams = docs.where(F.col(text_col).isNotNull()).select(
        _tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.explode(F.concat(*per_order)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn(
        "ord", (F.size(F.split(F.col("gram"), " "))).cast("int")
    )
    if min_count > 1:
        counts = counts.where(
            (F.col("ord") == 1) | (F.col("cnt") >= min_count)
        )
    return counts.select("gram", "ord", "cnt")


def perplexity_scores(
    docs: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    alpha: float = 0.4,
    broadcast_counts: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document stupid-backoff perplexity against a
    ``train_ngram_counts`` model. Returns one row per non-empty doc:
    (id_col, *keep_cols, n_tokens, logprob_micro, avg_logprob,
    perplexity) — ``logprob_micro`` is the exact BIGINT sum of
    per-position ln-scores in micro-nats (see module docstring),
    ``avg_logprob`` = logprob_micro / 1e6 / n_tokens (round 6),
    ``perplexity`` = exp(-avg logprob) (round 3). Docs with NULL or
    empty text have no positions and are absent from the output.

    ``keep_cols`` ride through the per-doc groupBy (they must be
    functionally determined by the id, e.g. lang) so downstream
    bucketing needs no join back to the corpus.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = _tokens(F.col(text_col))
    sz = F.size(toks)
    lookup_names = _position_field_names(n)
    # one explode to O(positions) rows; the exploded row carries the
    # token array and slices its grams afterwards. (The tempting
    # alternative — build per-position structs INSIDE the array and
    # explode those — measured 3-5x SLOWER at 1M docs: materializing
    # a positions x 5-string struct array per document is one giant
    # UnsafeArrayData cell per row, while the carried token array is
    # sliced lazily inside codegen.) sequence() is guarded because
    # Spark's sequence(1, 0) counts DOWN, it is not empty.
    pos = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            F.explode(
                F.when(sz >= 1, F.sequence(F.lit(1), sz)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("i"),
            toks.alias("_toks"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            *_position_fields(F.col("_toks"), F.col("i"), n),
        )
    )
    # each of the 2n-1 joins carries its own aliased select of the
    # model, so each BroadcastExchange has a DISTINCT subplan and
    # ReuseExchange cannot dedup them — without materialization the
    # whole counts aggregation re-runs once per join (measured ~5x the
    # model-build cost at n=3), plus once more for the token total N.
    # Broadcast path: the model is broadcast-sized by contract, so
    # materialize it to a driver-local relation once (eager at call
    # time, stated) and fold N into a plan literal. Shuffle path (big
    # models): persist, so the first consumer computes and the rest
    # read cache.
    if broadcast_counts:
        spark = docs.sparkSession
        rows = counts.select("gram", "ord", "cnt").collect()
        # exact: BIGINT total < 2^53 holds to ~9e15 training tokens
        n_literal = float(sum(r["cnt"] for r in rows if r["ord"] == 1))
        if n_literal == 0.0:
            # an empty model would make the OOV floor 1/N infinite and
            # fail mid-job as a cryptic DIVIDE_BY_ZERO / cast overflow —
            # fail at call time with the actual cause instead
            raise ValueError(
                "the n-gram model is empty (no unigrams) — train it on a "
                "corpus with at least one non-empty document"
            )
        lut = F.broadcast(
            spark.createDataFrame(
                [(r["gram"], r["cnt"]) for r in rows],
                "gram string, cnt bigint",
            )
        )
        pos = pos.withColumn("_N", F.lit(n_literal))
    else:
        # caller-owned lifetime: the cached model stays persisted for
        # the session (repeated scoring reuses it); long-running drivers
        # scoring many disposable models should unpersist via
        # spark.catalog.clearCache() between models
        counts = counts.persist()
        lut = counts.select("gram", "cnt")
        n_total = counts.where(F.col("ord") == 1).agg(
            F.sum("cnt").cast("double").alias("_N")
        )
        pos = pos.crossJoin(F.broadcast(n_total))
    for name in lookup_names:
        pos = pos.join(
            lut.select(
                F.col("gram").alias(name), F.col("cnt").alias(f"cnt_{name}")
            ),
            on=name,
            how="left",
        )
    # stupid-backoff fold, order 1 up — see module docstring
    s = F.when(
        F.col("cnt_g1").isNull(), F.lit(1.0) / F.col("_N")
    ).otherwise(F.col("cnt_g1").cast("double") / F.col("_N"))
    for o in range(2, n + 1):
        hit = F.col(f"cnt_g{o}").isNotNull() & F.col(f"cnt_c{o}").isNotNull()
        s = F.when(F.col(f"g{o}").isNull(), s).otherwise(
            F.when(
                hit,
                F.col(f"cnt_g{o}").cast("double")
                / F.col(f"cnt_c{o}").cast("double"),
            ).otherwise(F.lit(alpha) * s)
        )
    lp_micro = F.round(F.log(s) * MICRO, 0).cast("bigint")
    avg_lp = F.col("logprob_micro") / MICRO / F.col("n_tokens")
    return (
        pos.groupBy(F.col(id_col), *[F.col(c) for c in keep_cols])
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(lp_micro).alias("logprob_micro"),
        )
        .withColumn("avg_logprob", F.round(avg_lp, 6))
        .withColumn("perplexity", F.round(F.exp(-avg_lp), 3))
    )


def _position_field_names(n: int) -> list[str]:
    out = []
    for o in range(1, n + 1):
        out.append(f"g{o}")
        if o >= 2:
            out.append(f"c{o}")
    return out


def _position_fields(toks: Column, i: Column, n: int) -> list[Column]:
    """Projection of one exploded position: the order-1..n grams ending
    at i and their contexts (the (o-1)-gram ending at i-1)."""
    out = []
    for o in range(1, n + 1):
        out.append(_gram_ending_at(toks, i, o).alias(f"g{o}"))
        if o >= 2:
            out.append(_gram_ending_at(toks, i - 1, o - 1).alias(f"c{o}"))
    return out


def perplexity_buckets(
    scored: DataFrame,
    by: str = "lang",
    ppl_col: str = "perplexity",
    id_col: str = "doc_id",
    buckets: int = 3,
    method: str = "ntile",
) -> DataFrame:
    """CCNet's head/middle/tail assignment — adds ``ppl_bucket``
    (1 = head = lowest perplexity = most reference-like). Two methods,
    same contract, different scale ceilings:

      - ``"ntile"`` (default): ntile(buckets) over each ``by``
        partition ordered by (perplexity, id) — EXACTLY equal bucket
        counts, deterministic via the id tie-break, and the oracle-
        parity form. Scale ceiling: Window.partitionBy(lang) sends a
        language's ENTIRE row set to one reducer — fine per corpus
        slice, wrong for 10^11 'en' rows.
      - ``"threshold"``: per-group approx-percentile boundaries (one
        agg with map-side partials, O(groups x buckets) rows) joined
        back broadcast, bucket = a CASE over the thresholds —
        map-only on the corpus, no per-group reducer. Bucket counts
        are equal only up to percentile-estimation error and ties at
        the boundaries (CCNet itself cuts at fixed thresholds).
    """
    if method == "ntile":
        w = Window.partitionBy(by).orderBy(
            F.col(ppl_col).asc(), F.col(id_col).asc()
        )
        return scored.withColumn("ppl_bucket", F.ntile(buckets).over(w))
    if method != "threshold":
        raise ValueError(
            f"method must be 'ntile' or 'threshold', got {method!r}"
        )
    qs = [i / buckets for i in range(1, buckets)]
    bounds = scored.groupBy(by).agg(
        F.percentile_approx(ppl_col, qs).alias("_ppl_bounds")
    )
    joined = scored.join(F.broadcast(bounds), on=by)
    bucket = F.lit(1)
    for i in range(len(qs)):
        bucket = F.when(
            F.col(ppl_col) > F.element_at("_ppl_bounds", i + 1), F.lit(i + 2)
        ).otherwise(bucket)
    return joined.withColumn(
        "ppl_bucket", bucket.cast("int")
    ).drop("_ppl_bounds")
