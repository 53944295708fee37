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


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into per-host rule arrays (the ``*``
    user-agent group, REP/Google semantics): a GROUP is one or more
    consecutive ``User-agent:`` lines followed by its rules; comments
    (``#``) strip; empty Allow/Disallow values are no-ops. Group
    detection is a lag/running-sum window over the exploded lines —
    robots files are small, hosts are many, so the per-host window is
    the right distribution.

    Output: (host, rules: array<struct(prefix, allow, plen)>) for hosts
    whose file has a ``*`` group with at least one non-empty rule."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("p", "raw"),
    )
    clean = F.element_at(F.split(F.col("raw"), "#"), 1)
    l = F.lower(F.trim(clean))
    val = F.trim(F.regexp_extract(clean, "^[^:]*:(.*)$", 1))
    is_ua = l.startswith("user-agent:")
    w = Window.partitionBy("host").orderBy("p")
    marked = lines.select(
        "host",
        "p",
        l.alias("l"),
        val.alias("val"),
        is_ua.alias("is_ua"),
    )
    marked = marked.withColumn(
        "new_group",
        F.col("is_ua")
        & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
    ).withColumn(
        "grp",
        F.sum(F.col("new_group").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    applies = marked.groupBy("host", "grp").agg(
        F.max(
            F.col("is_ua") & (F.lower(F.col("val")) == "*")
        ).alias("applies")
    )
    rules = (
        marked.filter(
            (
                F.col("l").startswith("allow:")
                | F.col("l").startswith("disallow:")
            )
            & (F.col("val") != "")
        )
        .join(applies, ["host", "grp"])
        .filter("applies")
        .select(
            "host",
            F.struct(
                F.col("val").alias("prefix"),
                F.col("l").startswith("allow:").alias("allow"),
                F.length("val").cast("int").alias("plen"),
            ).alias("r"),
        )
    )
    return rules.groupBy("host").agg(F.collect_list("r").alias("rules"))


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str,
    id_col: str,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Evaluate crawl URLs against per-host robots.txt policies — the
    politeness gate at the very front of every crawl pipeline: among the
    ``*``-group rules whose prefix matches the URL path, the LONGEST
    prefix wins; on a length tie Allow wins (Google REP semantics);
    no matching rule (or no robots file / no ``*`` group) defaults to
    allowed.

    The verdict is a higher-order expression over the broadcast-joined
    per-host rule array: filter → sort by (−plen, allow-first, prefix)
    → head — row-local per URL, so the pass runs at scan bandwidth with
    one small-dimension join. Output: (id, url, host, path, n_rules,
    matched_prefix — '' when no rule matches — allowed)."""
    rules = robots_rules(robots, host_col, robots_col)
    u = urls.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        F.regexp_replace(
            F.lower(F.regexp_extract(url_col, URL_RE, 2)), r"^www\.", ""
        ).alias("host"),
        F.when(
            F.regexp_extract(url_col, URL_RE, 4) == "", F.lit("/")
        ).otherwise(F.regexp_extract(url_col, URL_RE, 4)).alias("path"),
    )
    j = u.join(F.broadcast(rules), "host", "left").withColumn(
        "rules",
        F.coalesce(
            F.col("rules"),
            F.expr(
                "CAST(array() AS"
                " ARRAY<STRUCT<prefix STRING, allow BOOLEAN, plen INT>>)"
            ),
        ),
    )
    matching = F.filter(
        F.col("rules"), lambda r: F.col("path").startswith(r["prefix"])
    )
    ordered = F.sort_array(
        F.transform(
            matching,
            lambda r: F.struct(
                (-r["plen"]).alias("o1"),
                F.when(r["allow"], 0).otherwise(1).alias("o2"),
                r["prefix"].alias("prefix"),
                r["allow"].alias("allow"),
            ),
        )
    )
    # try_element_at: ANSI-on driver sessions make element_at THROW on
    # the empty no-matching-rule array; NULL here means default-allow.
    best = F.try_element_at(ordered, F.lit(1))
    return j.select(
        F.col(id_col),
        "url",
        "host",
        "path",
        F.size("rules").cast("bigint").alias("n_rules"),
        F.coalesce(best["prefix"], F.lit("")).alias("matched_prefix"),
        ((F.size(matching) == 0) | F.coalesce(best["allow"], F.lit(True)))
        .alias("allowed"),
    )
