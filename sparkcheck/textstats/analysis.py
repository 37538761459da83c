"""Text-analysis operators for training-data pipelines.

Not present in the reference (it validates tabular SQL data); these are
the web-corpus analogs of its per-column statistics (profiler/analyzer.py
string stats + pattern detection), applied to a document `text` column:

- token counting   — whitespace split + a BPE-ish sub-token regex count
- quality scoring  — length / punctuation / stopword-ratio heuristics
- language ID      — marker-stopword n-gram heuristic
- fingerprinting   — md5 content fingerprint + rolling-hash (winnowing)

Every function is a pure Column pipeline (whole-stage codegen, no Python)
except ``rolling_fingerprints`` (winnowing needs a per-doc loop → Arrow
pandas UDF). All md5-based hashing is hex-string based so the DuckDB
oracle computes byte-identical values.

Scale: each op is a map-only projection over the documents table — no
shuffle at all; at 10^12 docs it parallelizes linearly with partitions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

# Marker stopwords per language for the n-gram language-ID heuristic.
# Deliberately tiny + deterministic; order of dict = tie-break priority.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "fr": ("le", "la", "les", "des", "une"),
    "de": ("der", "die", "das", "und", "ein"),
    "zh": ("的", "是", "了", "在", "我"),
}

# BPE-ish sub-token splitter: runs of letters, runs of digits, or a
# single non-space symbol — a cheap proxy for byte-pair tokenizers.
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# the exact complement of the regex class [^A-Za-z0-9\s]: ASCII
# alphanumerics plus Java \s = [ \t\n\x0B\f\r]
_ALNUM_WS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    " \t\n\x0b\f\r"
)


def _tokens(col: Column) -> Column:
    """Whitespace tokens; identical to DuckDB string_split(text, ' ')."""
    return F.split(col, " ")


def _stop_hits(toks: Column, lang: str = "en") -> Column:
    """Count of tokens in the language's marker set (shared by
    quality_score, lang_id, and gopher_quality_flags)."""
    return F.size(F.filter(toks, lambda x: x.isin(*[F.lit(s) for s in STOPWORDS[lang]])))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts: whitespace tokens, BPE-ish sub-tokens,
    distinct whitespace tokens, mean token length (rounded)."""
    t = F.col(text_col)
    toks = _tokens(t)
    # NULL text is skipped (engine-wide NULL-skip contract); this also
    # de-couples the result from spark.sql.ansi.enabled — pre-ANSI Spark
    # returns size(split(NULL))=-1 which would corrupt the counts.
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        # regexp_count, not size(regexp_extract_all(...)): identical
        # non-overlapping-match count without materializing an array of
        # every match string per row
        F.regexp_count(t, F.lit(BPE_ISH)).alias("n_subtokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.length(t).cast("double") / F.size(toks), 4).alias("mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1] from length, punctuation
    density, stopword ratio, and lexical diversity — the standard cheap
    pre-filters of web-corpus pipelines (C4/Gopher-style rules), each a
    codegen'd expression:

        len_score   = least(n_chars/500, 1)
        punct_ratio = punct_chars / n_chars
        stop_ratio  = english stopword tokens / tokens
        diversity   = distinct tokens / tokens
        score       = 0.25*len + 0.25*(1-min(punct*5,1)) + 0.25*min(stop*5,1) + 0.25*diversity
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t).cast("double")
    # translate-based complement count, not a regex: for the 1-char
    # class [^A-Za-z0-9\s] the match count equals the length after
    # deleting the class complement, and translate is a per-char table
    # lookup — measured 18x the regex engine (3.18 -> 0.17 s on a
    # 2M-doc pass). Exact for ALL input: both length() and Java regex
    # count code points (incl. non-BMP), equality corpus-verified and
    # pinned on emoji/accents/whitespace edge strings.
    punct = F.length(F.translate(t, _ALNUM_WS, "")).cast("double")
    stops = _stop_hits(toks).cast("double")
    distinct = F.size(F.array_distinct(toks)).cast("double")

    # Components are rounded FIRST and the composite score computed from
    # the rounded values — arithmetic over identical 4-dp doubles is
    # bit-identical across engines, so the oracle comparison is stable.
    len_score = F.round(F.least(n_chars / F.lit(500.0), F.lit(1.0)), 4)
    punct_ratio = F.round(punct / n_chars, 4)
    stop_ratio = F.round(stops / n_tok, 4)
    diversity = F.round(distinct / n_tok, 4)
    score = (
        F.lit(0.25) * len_score
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.25) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.25) * diversity
    )
    # NULL-skip contract (see token_stats) — keeps pre-ANSI Spark identical.
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        len_score.alias("len_score"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        diversity.alias("diversity"),
        # +1e-9: the sum of four 4-dp quarters is a multiple of 0.000025
        # and can land exactly on a .00005 decimal midpoint where engines'
        # round() disagree; the same nudge is applied in the oracle.
        F.round(score + F.lit(1e-9), 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language ID: per language, count tokens that are
    in its marker set; predict the argmax (ties broken by language code
    order, 'und' when no marker hits). One map-only pass. NULL text is
    skipped (NULL-skip contract; also keeps pre-ANSI Spark — where
    size(split(NULL)) is -1, not NULL — from misclassifying NULL as 'en')."""
    df = df.where(F.col(text_col).isNotNull())
    toks = _tokens(F.col(text_col))
    hits = {lang: _stop_hits(toks, lang) for lang in STOPWORDS}
    best_n = F.greatest(*hits.values())
    # argmax with dict-order tie-break (en > es > fr > de > zh) — a plain
    # CASE chain, trivially mirrored by the SQL oracle
    pred = F.when(best_n == 0, F.lit("und"))
    for lang in hits:
        pred = pred.when(hits[lang] == best_n, F.lit(lang))
    sel = [F.col(id_col)]
    sel += [hits[lang].alias(f"hits_{lang}") for lang in hits]
    sel += [pred.otherwise(F.lit("und")).alias("pred_lang")]
    return df.select(*sel)


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_words: int = 5, max_words: int = 100_000,
    min_mean_word_len: float = 2.0, max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 1,
) -> DataFrame:
    """Gopher-style quality filter battery (Rae et al. '21, §A1.1 rules,
    simplified): per-doc boolean flags + a keep verdict. All codegen'd
    Column work — at corpus scale this is THE pre-filter pass before any
    expensive dedup, so it must stay map-only (it does: no shuffle).

    Flags (True = rule violated):
      f_word_count     — words outside [min_words, max_words]
      f_mean_word_len  — mean word length outside [min, max]
      f_symbol_ratio   — #/ellipsis symbol chars / words > max
      f_no_stopword    — fewer than min_stop_hits english markers

    NULL text is skipped (the engine-wide NULL-skip contract — pair it
    with a null_check rule to reject null docs), which also keeps
    pre-ANSI Spark (3.5, where size(split(NULL))=-1) oracle-identical.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_words = F.size(toks)
    # Σ len(token) ≡ length(text) − (#separators), and split on a
    # single-char separator always yields #separators = size(toks) − 1
    # (leading/trailing/double separators produce empty tokens, which
    # split(limit=-1) keeps) — closed form instead of an INTERPRETED
    # aggregate() fold over every token (equality pytest-pinned on
    # edge spacings).
    mean_wl = F.round(
        (F.length(t) - n_words + 1).cast("double") / n_words, 4,
    )
    symbols = F.regexp_count(t, F.lit(r"#|\.\.\."))
    stops = _stop_hits(toks)
    f_wc = (n_words < min_words) | (n_words > max_words)
    f_mwl = (mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len)
    f_sym = F.round(symbols.cast("double") / n_words, 4) > max_symbol_ratio
    f_stop = stops < min_stop_hits
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        f_wc.cast("int").alias("f_word_count"),
        f_mwl.cast("int").alias("f_mean_word_len"),
        f_sym.cast("int").alias("f_symbol_ratio"),
        f_stop.cast("int").alias("f_no_stopword"),
        (~(f_wc | f_mwl | f_sym | f_stop)).cast("int").alias("keep"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_top_frac: float = 0.18,
) -> DataFrame:
    """Gopher repetition rules (Rae et al. '21, §A1.1 "repetition
    removal"): the fraction of a doc's n-grams taken by its single most
    frequent n-gram. Boilerplate/spam pages repeat one phrase; a doc is
    flagged when top_frac > max_top_frac (Gopher uses 0.18 for 2-grams).

    Shape: explode n-grams → count per (doc, gram) → per-doc max/total.
    Both shuffles are keyed by doc id (uniform), so this scales like any
    keyed agg; no all-pairs anything. Output:
    (id, n_grams, top_gram_n, top_gram_frac, f_repetitive)."""
    from sparkcheck.dedup.jaccard import shingles_from_tokens

    grams = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    ).select(
        F.col(id_col), F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("gram")
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"), F.max("c").alias("top_gram_n")
    )
    frac = F.round(F.col("top_gram_n") / F.col("n_grams"), 4)
    return per_doc.select(
        F.col(id_col),
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("top_gram_n").cast("long").alias("top_gram_n"),
        frac.alias("top_gram_frac"),
        (frac > max_top_frac).cast("int").alias("f_repetitive"),
    )


def duplicate_segment_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
) -> DataFrame:
    """Gopher duplicate-line/paragraph fraction: 1 − distinct segments /
    segments (segments = text split on ``delimiter``). Pure map-only
    Column work — no shuffle at all."""
    segs = F.split(F.col(text_col), delimiter)
    n = F.size(segs)
    dups = F.round(F.lit(1.0) - F.size(F.array_distinct(segs)) / n, 4)
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n.cast("long").alias("n_segments"),
        dups.alias("dup_segment_frac"),
    )


def cross_doc_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 6,
    min_docs: int = 2,
    hash_blocks: bool = False,
    dedup_ids: bool = True,
) -> DataFrame:
    """CROSS-document duplicated-span fraction — the corpus-level
    complement of ``duplicate_segment_stats`` (which is within-doc).
    Span-dedup signal in the style of Lee et al. '22 ("Deduplicating
    Training Data Makes Language Models Better"): text is cut into
    NON-overlapping ``k``-word blocks; a block appearing in
    ``min_docs``+ documents is corpus boilerplate (nav bars, cookie
    banners, license headers). Output per doc:
    (id, n_spans, shared_spans, shared_frac).

    "Shared" means the block appears in ≥ ``min_docs`` DISTINCT
    documents — duplicate rows of one doc_id (the same url crawled m
    times) collapse before counting, so a re-crawled doc cannot mark
    its own spans as boilerplate.

    Scale shape (measured at 8M docs, BENCH/SPANS.md):
      1. one distinct (id, block) frame — array_distinct dedups within
         each row map-side, the distinct only collapses duplicate ids
         (``dedup_ids=False`` skips this shuffle entirely — 2.2x faster
         at 8M docs — for pipelines that GUARANTEE unique doc ids;
         with duplicate ids that fast path self-shares re-crawled
         spans, so it is opt-in);
      2. per-doc totals = groupBy(id).count() over that frame;
      3. groupBy(block).count() — map-side partials absorb hot
         boilerplate blocks — filtered to the SHARED set
         (n_docs >= min_docs), typically a small fraction of blocks;
      4. inner join frame ⋈ shared set → per-doc shared count (1:N, no
         row blowup; AQE skew-split handles a block shared by millions
         of docs), left-joined back onto totals (docs with zero shared
         spans stay present at zero).

    ``hash_blocks=True`` (the scale path): shuffle 64-bit xxhash64 keys
    instead of ~40-char block strings — much less shuffle payload.
    Collisions can only over-count a shared span (two blocks colliding
    into one key) with probability ≈ n²/2⁶⁵ — negligible below ~10¹²
    distinct blocks; keep False where bit-exactness vs an oracle
    matters.

    Docs shorter than k words have no spans and drop out (same contract
    as the oracle SQL)."""
    # size >= k guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead
    # of returning empty — a doc shorter than k words must yield no
    # spans (matches DuckDB generate_series, which is empty there)
    toks = _tokens(F.col(text_col))
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("_toks"))
        .where(F.size(F.col("_toks")) >= k)
    )
    blocks = _span_blocks(F.col("_toks"), k)
    # .distinct(): the contract is "block appears in >= min_docs distinct
    # DOCUMENTS" (and the oracle SQL dedups (doc_id, block) likewise), so
    # duplicate rows of one id — the same url crawled m times hashed to
    # one doc_id — must collapse BEFORE counting: without it a doc
    # re-crawled min_docs times marks all its spans as cross-document
    # boilerplate with no other document involved. array_distinct already
    # dedups within a row, so this shuffle only collapses duplicate ids;
    # its Exchange is reused (ReusedExchange) by all three consumers.
    exploded = base.select(
        F.col(id_col).alias("id"), F.explode(blocks).alias("block")
    ).select(
        "id",
        (F.xxhash64(F.col("block")) if hash_blocks else F.col("block")).alias("bk"),
    )
    if dedup_ids:
        exploded = exploded.distinct()
    # Materialize ONCE: the frame has three consumers (totals, the
    # shared-block counts, and the join back), and although they look
    # identical, the inner join pushes isnotnull(bk)/isnotnull(id)
    # constraints into two of the subtrees, so their canonical plans
    # differ and ReuseExchange never fires — each consumer re-ran the
    # whole scan → tokenize → explode → distinct pipeline (plan-verified:
    # 3 separate scan subtrees, zero ReusedExchange nodes). One
    # localCheckpoint is the same discipline as minhash's band frame
    # (guide §5: cut lineage for multi-consumer intermediates); it holds
    # O(blocks) rows — the same order as the shuffle it already pays.
    exploded = exploded.localCheckpoint()
    totals = exploded.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_spans"))
    shared = (
        exploded.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("bk")
    )
    shared_per_doc = (
        exploded.join(shared, "bk")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_spans"))
    )
    return (
        totals.join(shared_per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_spans",
            F.coalesce(F.col("shared_spans"), F.lit(0)).cast("long").alias("shared_spans"),
        )
        .withColumn(
            "shared_frac", F.round(F.col("shared_spans") / F.col("n_spans"), 4)
        )
    )


def _span_blocks(toks: Column, k: int) -> Column:
    """Distinct non-overlapping k-word blocks of an ALREADY-MATERIALIZED
    token-array column (in-row array_distinct — no shuffle). The tokens
    must be a plain column reference: an expression referenced inside
    the interpreted transform lambda is re-evaluated once per element
    (see dedup.jaccard.shingles_from_tokens)."""
    nblk = F.floor(F.size(toks) / k).cast("int")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), nblk),
            lambda i: F.array_join(F.slice(toks, (i - 1) * k + 1, k), " "),
        )
    )


def span_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 6,
) -> DataFrame:
    """Benchmark-contamination check — the decontamination pass every
    training-data pipeline runs before a model ships: per corpus doc,
    the fraction of its k-word spans that appear ANYWHERE in the
    benchmark table. Output: (id, n_spans, contaminated_spans,
    contamination_frac); filter ``contamination_frac > 0`` for docs to
    drop/inspect.

    Scale shape: benchmark spans are a DISTINCT block set (benchmarks
    are small next to a crawl — typically broadcastable, and AQE makes
    that call at runtime); corpus spans left-join it and aggregate per
    doc. One scan of each table, no self-join anywhere; docs shorter
    than k words have no spans and drop out (sequence(1,0)-descends
    guard as in cross_doc_span_stats)."""
    toks = _tokens(F.col(text_col))
    corpus_spans = (
        corpus.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .where(F.size(F.col("_toks")) >= k)
        .select("id", F.explode(_span_blocks(F.col("_toks"), k)).alias("block"))
        # duplicate rows of one id collapse — n_spans counts a doc's
        # DISTINCT spans (array_distinct covers within-row; this covers
        # re-crawled ids), matching the oracle's DISTINCT (doc_id, block)
        .distinct()
    )
    bench_spans = (
        benchmark.where(F.col(text_col).isNotNull())
        .select(toks.alias("_toks"))
        .where(F.size(F.col("_toks")) >= k)
        .select(F.explode(_span_blocks(F.col("_toks"), k)).alias("block"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        corpus_spans.join(bench_spans, "block", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("contaminated_spans"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_spans",
            "contaminated_spans",
            F.round(F.col("contaminated_spans") / F.col("n_spans"), 4).alias(
                "contamination_frac"
            ),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 6,
    min_docs: int = 2,
    storage_level=None,
) -> DataFrame:
    """The REWRITE half of span dedup (Lee et al. '22 style):
    ``cross_doc_span_stats`` reports corpus boilerplate; this removes
    it. Text is cut into non-overlapping ``k``-word blocks; every block
    occurring in ≥ ``min_docs`` DISTINCT documents is dropped from
    every document, the survivors (plus the trailing < k-word
    remainder, always kept) are re-joined with single spaces. Output:
    (id, clean_text, n_spans, removed_spans).

    Whitespace contract: tokens re-join with ' ', so runs of spaces in
    the input are preserved as their empty-token placeholders — byte-
    deterministic and oracle-reproducible, not a normalizer.

    Scale shape:
      1. shared-block set = distinct (id, block) → groupBy(block) with
         map-side partials → filter n_docs ≥ min_docs. Boilerplate sets
         are small next to the corpus, so AQE broadcasts them;
      2. positioned blocks (id, pos, block) LEFT ANTI the shared set —
         map-only under that broadcast;
      3. per-doc reassembly: ONE groupBy(id) collecting (pos, block)
         structs, array_sort (pos is the leading struct field), join.
         This is the only O(text)-volume SHUFFLE — but the tokenize
         subtree appears in three consumers (shared set, anti-join
         probe, final remainder join) and Spark does not dedup common
         subplans, so by default the source is scanned+tokenized three
         times (the re-scan of a pruned columnar source usually beats
         caching decoded rows — BENCH/VERDICTS_SINK.md). Pass
         ``storage_level`` (e.g. ``StorageLevel.MEMORY_AND_DISK``) to
         persist the tokenized base ONCE instead — the right call when
         the source is remote/non-columnar or tokenization dominates;
         the frame stays persisted for the caller to release.

    Docs shorter than k words pass through with zero spans; NULL text
    is dropped (engine-wide NULL-skip contract)."""
    toks = _tokens(F.col(text_col))
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.floor(F.size(toks) / k).cast("int").alias("_nblk"),
    )
    if storage_level is not None:
        base = base.persist(storage_level)
    positioned = base.where(F.col("_nblk") >= 1).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("_nblk")),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(
                        F.slice(F.col("_toks"), (i - 1) * k + 1, k), " "
                    ).alias("block"),
                ),
            )
        ).alias("b"),
    ).select("id", F.col("b.pos").alias("pos"), F.col("b.block").alias("block"))
    shared = (
        positioned.select("id", "block").distinct()
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("block")
    )
    kept = positioned.join(shared, "block", "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "block"))),
                lambda s: s["block"],
            ),
            " ",
        ).alias("_kept"),
        F.count(F.lit(1)).cast("long").alias("_kept_n"),
    )
    remainder = F.array_join(
        F.slice(
            F.col("_toks"),
            F.col("_nblk") * k + 1,
            F.greatest(F.size(F.col("_toks")) - F.col("_nblk") * k, F.lit(0)),
        ),
        " ",
    )
    out = base.join(reassembled, "id", "left").select(
        F.col("id").alias(id_col),
        F.array_join(
            F.filter(
                F.array(F.col("_kept"), remainder),
                lambda x: x.isNotNull() & (x != ""),
            ),
            " ",
        ).alias("clean_text"),
        F.col("_nblk").cast("long").alias("n_spans"),
        (F.col("_nblk") - F.coalesce(F.col("_kept_n"), F.lit(0)))
        .cast("long")
        .alias("removed_spans"),
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of raw text and md5 of the normalized
    (lowercased, whitespace-collapsed, trimmed) text — the exact-dedup
    keys. Hex strings ⇒ identical in any engine."""
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(t).alias("fp_raw"),
        F.md5(norm).alias("fp_norm"),
    )


def rolling_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every k-char gram (polynomial rolling hash), keep the minimum
    in each sliding window of ``window`` hashes → a sparse, position-
    robust fingerprint set per doc.

    Fully VECTORIZED inside the Arrow batch (no per-byte Python): the
    k-gram polynomial hash is computed as k numpy passes of
    Mersenne-prime modular arithmetic (M = 2^61−1, so reduction is
    shift-and-add: 2^61 ≡ 1), and the window minimum uses a zero-copy
    sliding_window_view. Values are bit-identical to the scalar
    recurrence h = (h·B + byte) mod M — both evaluate the same
    polynomial Σ byte[i+j]·B^{k−1−j} mod M.
    """
    import numpy as np

    B, M = 257, (1 << 61) - 1
    POWS = [pow(B, k - 1 - j, M) for j in range(k)]  # B^{k-1-j} mod M
    LOW53 = (1 << 53) - 1

    def _gram_hashes(b: "np.ndarray") -> "np.ndarray":
        """h[i] = Σ_j b[i+j]·POWS[j] mod M, vectorized over all i.
        Each term b·p (b < 2^8, p < 2^61) is reduced without overflow by
        splitting p = p_hi·2^53 + p_lo and folding 2^61 ≡ 1 (mod M)."""
        n = len(b) - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        for j, p in enumerate(POWS):
            bj = b[j : j + n].astype(np.uint64)
            p_hi, p_lo = p >> 53, p & LOW53
            t = bj * np.uint64(p_hi)                    # < 2^16
            term = (
                bj * np.uint64(p_lo)                    # < 2^61
                + (t >> np.uint64(8))                   # t2: 2^61 folds to 1
                + ((t & np.uint64(0xFF)) << np.uint64(53))  # t1·2^53 < 2^61
            )
            acc += term                                 # ≤ ~3·2^61 + acc < 2^64
            acc = (acc >> np.uint64(61)) + (acc & np.uint64(M))
        acc = (acc >> np.uint64(61)) + (acc & np.uint64(M))
        acc[acc >= M] -= np.uint64(M)
        return acc

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        out = []
        for s in texts:
            if s is None or len(s) < k:
                out.append([])
                continue
            b = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8)
            if len(b) < k:
                out.append([])
                continue
            h = _gram_hashes(b)
            if len(h) <= window:
                out.append([int(h.min())])
                continue
            mins = sliding_window_view(h, window).min(axis=1)
            out.append(np.unique(mins).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(
        F.col(id_col), F.explode(_winnow(F.col(text_col))).alias("fingerprint")
    )


def winnow_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fingerprint_freq: int | None = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs by shared winnowing fingerprints
    (the MOSS construction, Schleimer et al. SIGMOD'03 §4): docs sharing
    ≥ ``min_shared`` fingerprints are byte-level near-dups — robust to
    reordering and insertion, complementary to word-shingle MinHash.

    Same scale shape as the shingle pipeline: explode fingerprints,
    drop boilerplate fingerprints shared by > ``max_fingerprint_freq``
    docs (the h² self-join guard), self-join on fingerprint, count per
    pair. Output: (id_a, id_b, shared_fingerprints)."""
    fps = rolling_fingerprints(df, text_col, id_col, k, window).distinct()
    if max_fingerprint_freq is not None:
        hot = (
            fps.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("f"))
            .where(F.col("f") > max_fingerprint_freq)
            .select("fingerprint")
        )
        fps = fps.join(F.broadcast(hot), "fingerprint", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fingerprint")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= min_shared)
    )


def distinctive_terms(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """TF-IDF distinctive terms per group — the corpus-inspection tool
    behind every "what is actually IN this source/domain/cluster"
    review (the C4-paper-style corpus analysis). Per (group, term):

        score = tf_group * ln(N_docs / df_term)

    with tf_group the term's occurrence count inside the group and
    df_term its corpus-wide document frequency. Returns the top_k
    terms per group: (group, term, tf, df, tfidf_micro, rank), ranked
    by (score desc, term asc). The single ln() per term is rounded to
    integer micro-units TIMES the exact BIGINT tf, so tfidf_micro is
    engine-portable (same discipline as textstats.lm).

    Plan: ONE explode feeds both aggregations (tf via groupBy(group,
    term) with map-side partials; df via groupBy(term) over distinct
    (doc, term) — the distinct is the one row-level shuffle); the join
    back is term-keyed (broadcast-able when the vocabulary is, which
    a pruned/real vocabulary at web scale is after a min-df cut); the
    ranking window partitions by group over the AGGREGATED frame —
    O(groups x vocab) rows, never corpus rows."""
    t = F.col(text_col)
    terms = df.where(t.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.explode(_tokens(t)).alias("term"),
    ).where(F.col("term") != "")
    n_docs = df.where(t.isNotNull() & F.col(group_col).isNotNull()).count()
    tf = terms.groupBy("_g", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        terms.select("_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    if min_df > 1:
        # web-scale vocabulary cut: hapaxes and typos dominate raw
        # vocabularies; pruning them bounds the join side (and is what
        # makes it broadcast-able). Pruned terms simply drop out of the
        # ranking — tf joins dfreq on the inner side.
        dfreq = dfreq.where(F.col("df") >= min_df)
    idf_micro = F.round(
        F.log(F.lit(float(n_docs)) / F.col("df").cast("double")) * 1_000_000, 0
    ).cast("bigint")
    scored = tf.join(dfreq, on="term").select(
        F.col("_g").alias(group_col),
        "term",
        "tf",
        "df",
        (F.col("tf") * idf_micro).alias("tfidf_micro"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("tfidf_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into overlapping token windows — the
    long-document step between cleaning and packing (context-window
    enforcement for pretraining; retrieval chunking for RAG corpora).
    One row per (doc, chunk): (id_col, chunk_id, n_chunk_tokens,
    chunk_text), whitespace-token windows of ``max_tokens`` with
    stride ``max_tokens - overlap``:

        n <= max_tokens          -> 1 chunk (the whole doc)
        otherwise                -> 1 + ceil((n - max_tokens)/stride)

    so the final chunk always contains at least one token the previous
    chunk did not (no pure-suffix duplicate chunks), and every token
    appears in at least one chunk. Empty/NULL docs produce no rows.
    Map-only: sequence + transform + ONE explode, all codegen'd; at
    corpus scale output rows ~ total_tokens/stride per doc with zero
    shuffle."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    stride = max_tokens - overlap
    t = F.col(text_col)
    toks = F.filter(_tokens(t), lambda x: x != "")
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        # ceil((n - max_tokens)/stride) in exact integer arithmetic
        F.lit(1)
        + F.floor((n - max_tokens + stride - 1) / F.lit(stride)).cast("int")
    )
    chunk = F.explode(
        F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("int").alias("chunk_id"),
                    F.slice(toks, i * stride + 1, max_tokens).alias("_w"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<chunk_id:int,_w:array<string>>>"))
    )
    return (
        df.where(t.isNotNull())
        .select(F.col(id_col), chunk.alias("_c"))
        .select(
            F.col(id_col),
            F.col("_c.chunk_id").alias("chunk_id"),
            F.size("_c._w").alias("n_chunk_tokens"),
            F.array_join("_c._w", " ").alias("chunk_text"),
        )
    )
