"""URL-host analytics — the north rule's named skew surface ("skewed
url-host and lang partitions ... handled via salting").

Host extraction is an engine-portable regexp (DuckDB has no parse_url,
and the oracle must compute identical hosts); the per-host distinct-url
count rides the salted two-phase aggregation from integrity.uniqueness
so a Zipfian hot host (half the crawl behind one CDN domain) spreads
over ``salt_buckets`` reducers instead of melting one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def url_host(col: Column) -> Column:
    """Host part of a URL (empty string when the pattern misses —
    regexp_extract's no-match contract in both Spark and DuckDB)."""
    return F.regexp_extract(col, HOST_RE, 1)


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    k: int | None = 20,
    salted: bool = True,
    salt_buckets: int = 64,
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-host doc counts + distinct-url counts, top-k by volume:
    (host, n_docs, n_urls).

    ``approx=True`` (profiling mode): ``approx_count_distinct(rsd)`` —
    HLL sketches merge map-side, so the hot host reduces to one sketch
    per map partition and NO salting is needed; one straight
    aggregation, skew-proof by construction. Exactness stays the
    default for violation/gating paths.

    ONE scan, one aggregation tree for BOTH stats (a join of two
    per-host aggregates would rescan the input and re-run the regexp):

        salted:  phase 1 groupBy(host, salt=hash(url)%S)
                          → (partial count, partial count_distinct)
                 phase 2 groupBy(host) → sums
        plain:   groupBy(host) → (count, count_distinct)

    Both sums are exact: counts partition trivially; distinct urls
    partition because the salt is a function of the url, so a url never
    appears under two salts of the same host (same argument as
    integrity.uniqueness.distinct_count_by_key)."""
    # No per-row filter on the computed host: Catalyst inlines the alias
    # into a pushed-down filter and the regexp runs TWICE per row (seen
    # in the plan). Malformed-url groups ('' host) are dropped AFTER
    # aggregation, where the frame is #hosts rows.
    hosts = df.where(F.col(url_col).isNotNull()).select(
        url_host(F.col(url_col)).alias("host"), F.col(url_col).alias("_url")
    )
    if approx:
        out = hosts.groupBy("host").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.approx_count_distinct("_url", rsd).cast("long").alias("n_urls"),
        )
    elif salted:
        partial = hosts.groupBy(
            "host", F.pmod(F.xxhash64("_url"), F.lit(salt_buckets)).alias("_salt")
        ).agg(
            F.count(F.lit(1)).alias("_docs"),
            F.count_distinct("_url").alias("_ndv"),
        )
        out = partial.groupBy("host").agg(
            F.sum("_docs").cast("long").alias("n_docs"),
            F.sum("_ndv").cast("long").alias("n_urls"),
        )
    else:
        out = hosts.groupBy("host").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("_url").cast("long").alias("n_urls"),
        )
    out = out.where(F.col("host") != "")
    if k is not None:
        out = out.orderBy(F.desc("n_docs"), F.asc("host")).limit(k)
    return out


def host_reputation(
    df: DataFrame,
    quality_col: str,
    url_col: str = "url",
    min_docs: int = 1,
    min_avg_quality: float = 0.0,
) -> DataFrame:
    """Host-level curation verdicts — the C4/RefinedWeb-style move of
    judging WEB HOSTS, not documents: a host whose pages are uniformly
    low-quality (SEO farms, auto-generated mirrors) is dropped
    wholesale, catching pages a per-document filter scores as
    borderline. Output: (host, n_docs, avg_quality, keep) where
    ``keep = n_docs >= min_docs AND avg_quality >= min_avg_quality``
    — hosts with too few docs to judge are NOT kept by default
    (min_docs=1 keeps every judged host; raise it and un-judged hosts
    fall to the caller's policy via the keep flag).

    Unlike host_stats' distinct-url count, plain count/avg partials
    combine map-side, so a Zipfian hot host reduces to ONE partial per
    map task and needs no salting: this is a single skew-proof
    aggregation at any corpus size. Malformed URLs group under host ''
    and are KEPT in the output (host_stats drops them) — a gating
    surface must rule on them explicitly rather than silently pass
    whatever the URL parser cannot read. NULL urls/qualities: NULL url
    rows are excluded; NULL quality contributes to n_docs but not the
    average (both engines' avg-ignores-NULL contract)."""
    return (
        df.where(F.col(url_col).isNotNull())
        .groupBy(url_host(F.col(url_col)).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg(F.col(quality_col).cast("double")).alias("avg_quality"),
        )
        .select(
            "host", "n_docs", "avg_quality",
            (
                (F.col("n_docs") >= min_docs)
                & (F.col("avg_quality") >= min_avg_quality)
            ).alias("keep"),
        )
    )


def filter_by_host_reputation(
    df: DataFrame,
    reputation: DataFrame,
    url_col: str = "url",
    broadcast_drops: bool = True,
) -> DataFrame:
    """Apply a host_reputation verdict table to a corpus: drop every
    row whose url-host has ``keep = false``; hosts absent from the
    table pass (the verdict frame defines only what is KNOWN bad —
    an unjudged host is not a drop).

    SCALE: built as an anti-join against the DROP list, not a
    semi-join against the keep list — keep-lists are corpus-sized
    (most of the web's hosts are fine) but drop-lists are
    blocklist-sized, so the broadcast side is the small one by
    construction and the corpus never shuffles (map-side broadcast
    anti-join; ``broadcast_drops=False`` falls back to AQE's choice
    for a drop-list too large to ship)."""
    drops = reputation.where(~F.col("keep")).select("host")
    if broadcast_drops:
        drops = F.broadcast(drops)
    return df.join(
        drops,
        url_host(F.col(url_col)) == drops["host"],
        "left_anti",
    )
