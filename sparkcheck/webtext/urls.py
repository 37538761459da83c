"""URL canonicalization — the dedup-key normalizer every web-corpus
pipeline runs before exact URL dedup (re-crawls of one page differ only
in tracking params, fragment, host case, or a default port; without
canonicalization they count as distinct documents and URL-keyed joins
under-merge).

Engine-portable construction: the URL is decomposed with REGEXPS (not
``parse_url`` — DuckDB has none, and the oracle must produce identical
bytes) and rebuilt entirely from codegen'd Column work — split/filter/
array_sort/concat, zero Python. Map-only, no shuffle: at 10^12 rows
this is a free projection fused into whatever scan follows it.

Normalizations applied (the conservative, safe-by-default set):
- scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization)
- fragment stripped (never sent to the server)
- default ports removed (:80 for http, :443 for https)
- tracking params dropped (utm_*, gclid, fbclid, msclkid, ref) and the
  remaining query params SORTED for order-insensitivity
- empty path normalized (bare "https://host" and "https://host/" merge)
- optional "www." strip (``strip_www=True``) for dedup keys

NOT applied (lossy, left to the caller): percent-decoding, path
dot-segment resolution, IDN/punycode folding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# the query starts at the first '?' BEFORE any '#': a '?' inside the
# fragment (SPA routes like /#/route?x=1) is fragment content, not a
# query — [^#?]* forbids crossing a '#' to find one
QUERY_RE = r"^[^#?]*\?([^#]*)"
# a param is dropped when its NAME matches (with or without a value)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$"


def canonicalize_url(col: Column, strip_www: bool = False) -> Column:
    """Canonical form of a URL column (empty string when the value
    doesn't parse as scheme://... — same contract as
    ``hosts.url_host``)."""
    scheme = F.lower(F.regexp_extract(col, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(col, HOSTPORT_RE, 1))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        hostport = F.regexp_replace(hostport, r"^www\.", "")
    path = F.regexp_extract(col, PATH_RE, 1)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.regexp_extract(col, QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qnorm = F.array_join(params, "&")
    return F.when(
        scheme == "", F.lit("")
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            hostport,
            path,
            F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
        )
    )


def url_dedup_stats(
    df: DataFrame, url_col: str = "url", strip_www: bool = True
) -> DataFrame:
    """One-row summary of how much URL canonicalization merges:
    (total_urls, distinct_raw, distinct_canonical, merged) — the
    pre-flight a crawl dedup runs to size the win.

    Two-phase shape: ONE groupBy(url) with map-side combine reduces the
    corpus to its distinct URLs (canonical form rides along — it is a
    function of the url, so one per group), then a single-distinct agg
    over that much smaller frame. Two distinct aggregates over
    different expressions in one agg would plan an Expand that triples
    the shuffled row volume (the CLAUDE.md Expand-blowup class); this
    shuffles each distinct url once."""
    canon = canonicalize_url(F.col(url_col), strip_www=strip_www)
    per_url = (
        df.where(F.col(url_col).isNotNull())
        .groupBy(F.col(url_col).alias("_u"))
        .agg(F.count(F.lit(1)).alias("_n"), F.first(canon).alias("_c"))
    )
    return per_url.agg(
        F.sum("_n").cast("long").alias("total_urls"),
        F.count(F.lit(1)).cast("long").alias("distinct_raw"),
        F.count_distinct(F.col("_c")).alias("distinct_canonical"),
    ).select(
        "total_urls",
        "distinct_raw",
        "distinct_canonical",
        (F.col("distinct_raw") - F.col("distinct_canonical")).alias("merged"),
    )
