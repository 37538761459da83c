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

from sparkcheck.integrity.uniqueness import distinct_count_by_key

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
) -> DataFrame:
    """Per-host doc counts + EXACT distinct-url counts, top-k by volume:
    (host, n_docs, n_urls).

    n_docs is a plain keyed count (map-side partials absorb any skew);
    n_urls is the skew-prone count_distinct → salted two-phase when
    ``salted``. The join between the two per-host frames is tiny
    (#hosts rows)."""
    hosts = (
        df.where(F.col(url_col).isNotNull())
        .select(url_host(F.col(url_col)).alias("host"), F.col(url_col).alias("_url"))
        .where(F.col("host") != "")
    )
    n_docs = hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    n_urls = distinct_count_by_key(
        hosts, "host", "_url", salted=salted, salt_buckets=salt_buckets
    ).withColumnRenamed("ndv", "n_urls")
    out = n_docs.join(n_urls, "host").select(
        "host",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_urls").cast("long").alias("n_urls"),
    )
    if k is not None:
        out = out.orderBy(F.desc("n_docs"), F.asc("host")).limit(k)
    return out
