"""Web-crawl URL curation: canonicalization, host extraction, and
canonical-URL dedup — the first step of every crawl-derived training
corpus (a crawl's URL list is full of scheme/case/port/tracking-param
variants of the same resource).

Canonical form (one deterministic spec, replicated verbatim by the DuckDB
oracle in queries_pipeline.url_canonicalize):

1. scheme and host lowercase
2. ``www.`` host prefix stripped
3. default ports stripped (``:80`` for http, ``:443`` for https)
4. fragment dropped
5. tracking params dropped (``utm_*``, ``gclid``, ``fbclid``, ``ref``)
6. remaining query params sorted bytewise
7. empty path → ``/``

Scale shape: parsing + rebuilding is ONE projection of JVM regexp /
array expressions — whole-stage codegen, zero Python, zero shuffles.
The dedup keeper (min doc id per canonical URL) is one map-side-combined
groupBy on the canonical string — the same single-shuffle shape as
pipeline/dedup.exact_dedup. At 100 TB the canonical string is the only
shuffled payload (~60 bytes/row).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# One URL regex shared (textually) with the DuckDB oracle: scheme,
# host, optional port, path, optional query, optional fragment.
URL_RE = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::(\d+))?([^?#]*)"
    r"(?:\?([^#]*))?(?:#.*)?$"
)

# Tracking params dropped during canonicalization (CCNet/C4-style lists).
TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$"


def canonicalize_urls(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """(id, url) → (id, url, canon, host, keep): canonical form, bare
    host, and the exact-dedup keep flag (first id per canonical URL)."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, URL_RE, 1))
    rawhost = F.lower(F.regexp_extract(u, URL_RE, 2))
    host = F.regexp_replace(rawhost, r"^www\.", "")
    port = F.regexp_extract(u, URL_RE, 3)
    path = F.regexp_extract(u, URL_RE, 4)
    query = F.regexp_extract(u, URL_RE, 5)

    keep_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    norm_query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    canon = F.when(
        scheme == "", F.lit(None).cast("string")  # unparseable
    ).otherwise(
        F.concat(scheme, F.lit("://"), host, keep_port, norm_path, norm_query)
    )
    out = df.select(
        F.col(id_col),
        u.alias("url"),
        canon.alias("canon"),
        host.alias("host"),
    )
    # Null-safe dedup key: unparseable URLs (canon NULL) form ONE group,
    # matching the oracle's PARTITION BY canon (SQL window partitioning
    # groups NULLs together) — a plain equi-join on canon would leave
    # their keep flag NULL. The sentinel keeps this an equi-join
    # (broadcast/AQE-eligible) instead of an eqNullSafe join condition.
    ck = F.coalesce(F.col("canon"), F.lit("\x00unparseable"))
    out = out.withColumn("__ck", ck)
    keeper = out.groupBy("__ck").agg(F.min(id_col).alias("__keep_id"))
    return (
        out.join(keeper, "__ck", "left")
        .withColumn("keep", (F.col(id_col) == F.col("__keep_id")))
        .select(id_col, "url", "canon", "host", "keep")
    )


def host_stats(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Per-host page counts and canonical-dedup ratio — the crawl-curation
    signal for per-domain caps and blocklists. One groupBy on host."""
    canon = canonicalize_urls(df, url_col, id_col)
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canon").alias("n_canonical"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
    )
