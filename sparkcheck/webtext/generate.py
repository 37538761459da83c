"""Deterministic synthetic Common-Crawl-style webtext table.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation is PURE column expressions over ``spark.range(n)`` — no
Python, no Faker, no wall clock, no RNG state (xxhash64 of the row id is
the only entropy source), so the table is bit-identical for a given n at
any parallelism and any scale. That matters twice: tests pin exact
violation positions, and the generator itself must scale to 10^12 rows
(it is embarrassingly parallel and shuffle-free).

Skew: host follows a Zipf-ish distribution (≈45% of rows on one hot
host) and lang is skewed toward 'en' — both exercise the salting / AQE
paths that the north rule requires.

Planted violations (all derived from ``id % 1000``, so expected counts
are exact functions of n):

    id%1000 == 7   → url duplicates the url of id−1   (uniqueness)
    id%1000 == 13  → url IS NULL                       (not_null)
    id%1000 == 17  → url lacks the https scheme        (regex)
    id%1000 == 23  → warc_ts in the far future         (range/not-future)
    id%1000 == 29  → text IS NULL                      (not_null/length)
    id%1000 == 31  → lang = 'xx' (invalid)             (enum)
    id%1000 == 37  → lang IS NULL                      (enum skips, null_check fails)
    id%1000 == 41  → html truncated (malformed)        (extraction mismatch)

Drift: rows with id%10 == 9 get systematically longer texts, giving a
shifted n_chars distribution for the PSI/KS tests (slice on id%10==9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# Small deterministic vocabulary; text = words joined by single spaces so
# the html→text byte-identity contract is trivially well-defined.
VOCAB = [
    "data", "web", "page", "crawl", "spark", "value", "table", "index",
    "query", "robot", "html", "text", "link", "host", "fast", "slow",
    "cache", "shard", "batch", "scan", "join", "group", "filter", "hash",
    "byte", "word", "lang", "site", "news", "blog", "shop", "wiki",
]

HOT_HOSTS = ["bighost.com", "popular.org", "midsite.net", "smallsite.io"]

PLANTED = {
    "dup_url": 7,
    "null_url": 13,
    "bad_url": 17,
    "future_ts": 23,
    "null_text": 29,
    "bad_lang": 31,
    "null_lang": 37,
    "bad_html": 41,
}

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
TS_SPAN = 180 * 24 * 3600  # warc_ts window: 180 days
FUTURE_OFFSET = 10 * 365 * 24 * 3600  # planted future timestamps

VALID_LANGS = ("en", "de", "fr", "es", "zh", "ru", "ja", "pt")


def _h(seed: int) -> Column:
    """Deterministic per-row uniform hash in [0, 2^63): xxhash64(id, seed)."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed)))


def _mod(seed: int, m: int) -> Column:
    return F.pmod(_h(seed), F.lit(m))


def _host() -> Column:
    """Zipf-ish host: ~45% hot host, ~20%, ~10%, ~5%, 20% long tail."""
    u = _mod(1, 100)
    return (
        F.when(u < 45, F.lit(HOT_HOSTS[0]))
        .when(u < 65, F.lit(HOT_HOSTS[1]))
        .when(u < 75, F.lit(HOT_HOSTS[2]))
        .when(u < 80, F.lit(HOT_HOSTS[3]))
        .otherwise(F.concat(F.lit("tail"), _mod(2, 2000).cast("string"), F.lit(".site")))
    )


def _url_for(id_col: Column) -> Column:
    """url as a pure function of an id (so duplicates can reuse id−1)."""
    u = F.pmod(F.abs(F.xxhash64(id_col, F.lit(1))), F.lit(100))
    host = (
        F.when(u < 45, F.lit(HOT_HOSTS[0]))
        .when(u < 65, F.lit(HOT_HOSTS[1]))
        .when(u < 75, F.lit(HOT_HOSTS[2]))
        .when(u < 80, F.lit(HOT_HOSTS[3]))
        .otherwise(
            F.concat(
                F.lit("tail"),
                F.pmod(F.abs(F.xxhash64(id_col, F.lit(2))), F.lit(2000)).cast("string"),
                F.lit(".site"),
            )
        )
    )
    return F.concat(F.lit("https://"), host, F.lit("/page/"), id_col.cast("string"))


def _text() -> Column:
    """5..54 vocab words (longer for the drifted id%10==9 slice), joined
    by single spaces — built with higher-order functions, zero Python."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_words = (
        F.lit(5)
        + _mod(3, 50)
        + F.when(F.col("id") % 10 == 9, F.lit(60)).otherwise(F.lit(0))
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    return F.array_join(words, " ")


def _lang() -> Column:
    u = _mod(4, 100)
    return (
        F.when(u < 55, F.lit("en"))
        .when(u < 70, F.lit("de"))
        .when(u < 80, F.lit("fr"))
        .when(u < 88, F.lit("es"))
        .when(u < 94, F.lit("zh"))
        .when(u < 97, F.lit("ru"))
        .when(u < 99, F.lit("ja"))
        .otherwise(F.lit("pt"))
    )


def webtext_table(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """Build the webtext table with planted violations. Deterministic in
    content regardless of partitioning."""
    df = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    k = F.col("id") % 1000

    url = F.when(k == PLANTED["null_url"], F.lit(None).cast("string")).otherwise(
        F.when(
            (k == PLANTED["dup_url"]) & (F.col("id") > 0),
            _url_for(F.col("id") - 1),
        ).otherwise(
            F.when(
                k == PLANTED["bad_url"],
                F.concat(F.lit("not-a-url-"), F.col("id").cast("string")),
            ).otherwise(_url_for(F.col("id")))
        )
    )

    ts_secs = (
        F.lit(BASE_EPOCH)
        + _mod(5, TS_SPAN)
        + F.when(k == PLANTED["future_ts"], F.lit(FUTURE_OFFSET)).otherwise(F.lit(0))
    )
    warc_ts = F.timestamp_seconds(ts_secs)

    text = F.when(k == PLANTED["null_text"], F.lit(None).cast("string")).otherwise(_text())

    lang = F.when(k == PLANTED["null_lang"], F.lit(None).cast("string")).otherwise(
        F.when(k == PLANTED["bad_lang"], F.lit("xx")).otherwise(_lang())
    )

    title = F.concat(F.lit("Page "), F.col("id").cast("string"))
    full_html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body><p>"),
        F.coalesce(text, F.lit("")),
        F.lit("</p></body></html>"),
    )
    html_str = F.when(
        k == PLANTED["bad_html"], F.substring(full_html, 1, 40)
    ).otherwise(full_html)
    html = F.encode(html_str, "UTF-8")

    return df.select(
        F.col("id").alias("doc_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def webtext_rules():
    """The flagship rule suite over the webtext table (the full-suite
    single pass the baseline metric times)."""
    from sparkcheck.rules import (
        EnumRule,
        LengthRule,
        NullCheckRule,
        RangeRule,
        RegexRule,
    )

    return [
        NullCheckRule(name="url_not_null", column="url"),
        RegexRule(name="url_scheme", column="url", pattern=r"https?://"),
        NullCheckRule(name="text_not_null", column="text"),
        LengthRule(name="text_length", column="text", min_length=10, max_length=100_000),
        EnumRule(name="lang_enum", column="lang", allowed_values=VALID_LANGS),
        NullCheckRule(name="lang_not_null", column="lang"),
        RangeRule(
            name="warc_ts_window",
            column="warc_ts_epoch",  # caller adds: unix_timestamp(warc_ts)
            min_value=float(BASE_EPOCH),
            max_value=float(BASE_EPOCH + TS_SPAN),
        ),
    ]
