"""URL canonicalization + domain-level dedup — the CommonCrawl-style
curation step upstream of document dedup (a crawl sees the same page
as `http://WWW.Example.com:80/a/?utm_source=x` and
`https://example.com/a`): normalize scheme/host/port/path/query,
strip tracking parameters, and report per-domain crawl concentration.

Scale shape: every step is a chained JVM expression (regexp + array
HOFs) — no UDFs, no shuffle until the terminal groupBy on the
canonical key, which is map-side combinable. At 100 TB the canonical
key is exactly what you bucket/partition crawl stores by.
Reference analogue: none (X-family extension, SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that identify a CLICK, not a resource — dropped
#: during canonicalization (the standard tracking-param scrub list).
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "fbclid", "gclid", "msclkid", "ref", "mc_cid",
    "mc_eid",
)

#: second-level public suffixes the naive last-two-labels rule gets
#: wrong (a tiny, pinned stand-in for the Public Suffix List — the
#: full PSL would ship as a broadcast lookup table the same way).
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "co.in", "com.br", "com.cn", "co.nz",
)


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL, entirely in JVM expressions:

    - scheme and host lowercased; ``www.`` prefix and default ports
      (``:80`` http, ``:443`` https) stripped
    - fragment dropped
    - tracking query parameters (:data:`TRACKING_PARAMS`) dropped;
      surviving parameters SORTED so param order never splits a page
      into two keys; empty query drops its ``?``
    - trailing ``/`` stripped from the path (``/a/`` == ``/a``); a
      bare-host URL keeps no slash

    Non-URL strings (no scheme) pass through trimmed-and-lowercased —
    garbage in, stable garbage key out (never NULL, so a dedup
    groupBy cannot silently merge all malformed rows with real NULLs).
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(rest, r"^[^/?]*(/[^?]*)?", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(
                *TRACKING_PARAMS
            ),
        )
    )
    canon_query = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            canon_query != "", F.concat(F.lit("?"), canon_query)
        ).otherwise(F.lit("")),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(rebuilt)


def registered_domain(url: Column) -> Column:
    """Registered (pay-level) domain of a URL: the last two host
    labels, or the last THREE when the last two are a known
    second-level public suffix (``bbc.co.uk`` → ``bbc.co.uk``, not
    ``co.uk``). The per-domain key crawl-rate reports group by."""
    u = F.trim(url)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?:#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(*_SECOND_LEVEL_SUFFIXES), last3).otherwise(last2)
    )


def url_dedup(
    df: DataFrame, url_col: str, tie_break: str
) -> DataFrame:
    """Keep exactly one row per CANONICAL URL — the crawl-level exact
    dedup run before any content dedup. Survivor = smallest
    ``tie_break``, full-row-hash tie-broken — delegates to
    :func:`~asset_prices_parquet_saver_spark.operators.dedup.
    exact_dedup` on the canonical key, inheriting its determinism and
    its one-combinable-aggregate scale shape."""
    from asset_prices_parquet_saver_spark.operators.dedup import exact_dedup

    canon = df.withColumn("_canon", canonical_url(F.col(url_col)))
    return exact_dedup(canon, ["_canon"], tie_break).drop("_canon")


def domain_report(df: DataFrame, url_col: str) -> DataFrame:
    """Per-registered-domain crawl concentration: total URLs, distinct
    canonical URLs, and the duplication rate (1 − distinct/total,
    rounded to 6 decimals) — the per-provider number a crawl-curation
    run reports (which domains are being re-crawled into the corpus).
    Two map-side-combinable aggregates on the domain key."""
    canon = df.select(
        registered_domain(F.col(url_col)).alias("domain"),
        canonical_url(F.col(url_col)).alias("canon"),
    )
    return (
        canon.groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("canon").alias("n_canonical"),
        )
        .withColumn(
            "dup_rate",
            F.round(1 - F.col("n_canonical") / F.col("n_urls"), 6),
        )
    )
