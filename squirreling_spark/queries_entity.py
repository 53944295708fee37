"""Entity-resolution + warehouse-history + behavioral-pattern queries
(round-8 batch 4): fuzzy edit-distance blocking join, SCD-2 interval
build, MATCH_RECOGNIZE-lite session patterns, linear multi-touch
attribution, lexical-diversity profiling, systematic weighted sampling.

Each query is Spark-first (operators/, pipeline/) with a DuckDB oracle
that replays the SEMANTICS through an independent algorithm (brute-force
blocks, plain window cumsums, IEJoin-able inequality joins).
"""

from __future__ import annotations

import itertools

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.operators.fuzzy_join import fuzzy_self_join_ed1
from squirreling_spark.operators.funnel import session_pattern_match
from squirreling_spark.operators.range_join import range_join
from squirreling_spark.operators.scd import status_intervals
from squirreling_spark.pipeline.sample import systematic_weighted_sample
from squirreling_spark.qutil import t


@query(
    "fuzzy_name_matches",
    # Oracle: brute force INSIDE provably-complete blocks. All c_name
    # values share one fixed-width layout ('Customer#' + 9 digits), so a
    # lev<=1 pair is a single substitution and must agree on one of two
    # complementary spans: positions 10-15 equal (covers a substitution
    # at 16-18 or in the constant prefix) OR positions 16-18 equal
    # (covers 10-15 / prefix). The union of the two block joins therefore
    # contains every true pair; exact levenshtein filters. This keeps the
    # oracle O(sum block^2) instead of O(n^2) so the sf0.1 sweep stays
    # tractable — and it is an INDEPENDENT algorithm from the Spark
    # side's deletion-neighborhood join.
    oracle="""
    WITH cand AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
             a.c_name AS na, b.c_name AS nb
      FROM customer a JOIN customer b
        ON substring(a.c_name, 10, 6) = substring(b.c_name, 10, 6)
       AND a.c_custkey < b.c_custkey
      UNION
      SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name
      FROM customer a JOIN customer b
        ON substring(a.c_name, 16, 3) = substring(b.c_name, 16, 3)
       AND a.c_custkey < b.c_custkey
    )
    SELECT key_a, key_b, CAST(levenshtein(na, nb) AS BIGINT) AS lev
    FROM cand WHERE levenshtein(na, nb) <= 1
    """,
)
def fuzzy_name_matches_q(spark, sf):
    """Fuzzy entity matching: every customer-name pair within Levenshtein
    distance 1, found by the SymSpell deletion-neighborhood equi-join
    (operators/fuzzy_join.py) — hash join on deletion variants + exact
    verify on candidates only, no quadratic stage at any scale."""
    return fuzzy_self_join_ed1(
        t(spark, sf, "customer"), "c_custkey", "c_name"
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             lag(1) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS first_marker
      FROM events
    ), r AS (
      SELECT user_id, event_type, us,
             sum(CASE WHEN first_marker IS NULL
                      OR prev_type IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o
    ), runs AS (
      SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
             min(event_type) AS status,
             CAST(min(us) AS BIGINT) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM r GROUP BY user_id, run_id
    )
    SELECT user_id, run_id, status, valid_from_us,
           CAST(lead(valid_from_us) OVER (PARTITION BY user_id
                ORDER BY run_id) AS BIGINT) AS valid_to_us,
           CAST(CASE WHEN lead(valid_from_us) OVER (PARTITION BY user_id
                ORDER BY run_id) IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current,
           n_events
    FROM runs
    """,
)
def scd2_intervals_q(spark, sf):
    """SCD Type-2 history build (operators/scd.py): per-user status
    (event_type) change log → half-open validity intervals with a
    current-row flag — the warehouse dimension-history operator, one
    user-keyed shuffle end-to-end."""
    return status_intervals(
        t(spark, sf, "events"), "user_id", "event_type", "ts", "event_id"
    )


_PATTERN = "vc+p"  # view, then clicks, then purchase — contiguous motif


@query(
    "event_pattern_match",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
      FROM events
    ), s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM o
    ), g AS (
      SELECT user_id, session_seq,
             CAST(count(*) AS BIGINT) AS n_events,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM s GROUP BY user_id, session_seq
    )
    SELECT user_id, session_seq, n_events, seq,
           CASE WHEN regexp_matches(seq, '{_PATTERN}')
                THEN regexp_extract(seq, '{_PATTERN}', 0) END AS matched,
           CAST(CASE WHEN regexp_matches(seq, '{_PATTERN}')
                THEN 1 ELSE 0 END AS BIGINT) AS has_match
    FROM g
    """,
)
def event_pattern_match_q(spark, sf):
    """MATCH_RECOGNIZE-lite (operators/funnel.py::session_pattern_match):
    regex behavioral-motif detection (view -> clicks -> purchase,
    contiguous) over per-session event-type sequences. Sessions are
    bounded by the inactivity gap, so the collected sequence string is
    small by construction; the regex subset used is Java/RE2-shared."""
    return session_pattern_match(
        t(spark, sf, "events"), "user_id", "event_type", "ts", "event_id",
        _PATTERN,
    )


_ATTR_US = 3600 * 1_000_000  # 1h lookback


@query(
    "attribution_linear",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pus, value
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS cid, user_id, epoch_us(ts) AS cus
      FROM events WHERE event_type = 'click'
    ), pairs AS (
      SELECT p.pid, p.value, c.cid
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.cus >= p.pus - {_ATTR_US} AND c.cus < p.pus
    ), w AS (
      SELECT pid, value, cid,
             count(*) OVER (PARTITION BY pid) AS n_touch
      FROM pairs
    )
    SELECT cid AS click_id, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(value / n_touch AS DECIMAL(27,6))) AS DOUBLE)
             AS credit
    FROM w GROUP BY cid
    """,
)
def attribution_linear_q(spark, sf):
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's clicks in the prior hour; per-click credit
    totals. The click-purchase pairing is the binned range join
    (operators/range_join.py) keyed on (user, time-bin) — a hash
    equi-join, never per-user nested loops; credit division is a
    deterministic IEEE double op, summed exactly via decimal."""
    ev = t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("value"),
        (F.unix_micros("ts") - F.lit(_ATTR_US)).alias("lo"),
        (F.unix_micros("ts") - F.lit(1)).alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cuser"),
        F.unix_micros("ts").alias("cus"),
    )
    pairs = range_join(
        clicks, purchases, "cus", "lo", "hi",
        bin_width=float(_ATTR_US), by=[("cuser", "puser")],
    )
    n_touch = F.count(F.lit(1)).over(W.partitionBy("pid"))
    credited = pairs.withColumn(
        "credit_part",
        (F.col("value") / n_touch).cast("decimal(27,6)"),
    )
    return credited.groupBy("click_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("credit_part").cast("double").alias("credit"),
    )


@query(
    "text_lexical_diversity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tk
      FROM documents
    ), cnt AS (
      SELECT doc_id, tk, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY doc_id, tk
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(1000000 * count(*) // sum(c) AS BIGINT) AS ttr_ppm,
           CAST(CASE WHEN sum(c) >= 2 THEN
                1000000000 * sum(c * (c - 1)) // (sum(c) * (sum(c) - 1))
                END AS BIGINT) AS simpson_ppb
    FROM cnt GROUP BY doc_id
    """,
)
def text_lexical_diversity_q(spark, sf):
    """Lexical-diversity profile per document: token/type/hapax counts,
    type-token ratio, and Simpson repeat concentration — all integer
    arithmetic (ppm/ppb fixed point via integer division), bit-identical
    across engines and partition layouts. Two map-combined shuffles
    ((doc, token) then doc); no Python, no doubles."""
    docs = t(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tk")
    )
    cnt = tok.groupBy("doc_id", "tk").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.expr(
            "CAST(1000000 * count(1) div sum(c) AS BIGINT)"
        ).alias("ttr_ppm"),
        F.expr(
            "CAST(CASE WHEN sum(c) >= 2 THEN"
            " (1000000000 * sum(c * (c - 1)))"
            " div (sum(c) * (sum(c) - 1)) END AS BIGINT)"
        ).alias("simpson_ppb"),
    )


_SAMPLE_STEP = 997  # prime, ~1 pick per 997 chars of corpus


@query(
    "sample_weighted_systematic",
    oracle=f"""
    WITH c AS (
      SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
             CAST(sum(n_chars) OVER (ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
      FROM documents
    )
    SELECT id, weight, cum_weight,
           CAST(cum_weight // {_SAMPLE_STEP}
                - (cum_weight - weight) // {_SAMPLE_STEP} AS BIGINT)
             AS picks
    FROM c
    WHERE cum_weight // {_SAMPLE_STEP}
          > (cum_weight - weight) // {_SAMPLE_STEP}
    """,
)
def sample_weighted_systematic_q(spark, sf):
    """Systematic PPS sampling of documents by character weight
    (pipeline/sample.py): deterministic, integer-exact, zero-variance
    weighted selection — the dataset-mixing sampler. The oracle replays
    it with a single plain window cumsum; the distributed two-level
    cumsum must agree row-for-row."""
    return systematic_weighted_sample(
        t(spark, sf, "documents"), "doc_id", "n_chars", _SAMPLE_STEP
    )


# ---------------------------------------------------------------------------
# Batch 5: graph triangles, per-key OLS trend, token co-occurrence mining
# ---------------------------------------------------------------------------

_TS_BASE = 1704067200  # 2024-01-01 UTC, seconds — fixed x origin for OLS


@query(
    "part_triangle_stats",
    # Oracle closes triangles with an ID-ordered 3-way self-join — an
    # independent algorithm from the Spark side's degree-ordered
    # node-iterator (Suri & Vassilvitskii). Same exact counts.
    # Linear CTE chain ending in a cross join of three 1-row aggregates
    # (scalar subqueries in the projection made DuckDB re-inline the edge
    # CTE per reference — 40s instead of <1s inside the digest union).
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
      SELECT node, count(*) AS c FROM (
        SELECT x AS node FROM e UNION ALL SELECT y FROM e
      ) GROUP BY node
    ), agg_deg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg
    ), agg_e AS (
      SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e
    ), tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
      JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CAST(CASE WHEN n_wedges > 0 THEN
                (1000000 * 3 * n_triangles) // n_wedges
                END AS BIGINT) AS clustering_ppm
    FROM agg_deg, agg_e, tri
    """,
)
def part_triangle_stats_q(spark, sf):
    """Distributed triangle counting (pipeline/graph.py::triangle_stats)
    over the part co-order graph (parts appearing in the same order).
    Degree-ordered orientation bounds every wedge-stage out-degree by
    O(sqrt(m)) — the last-reducer-proof MapReduce algorithm — vs the
    oracle's id-ordered 3-way join."""
    from squirreling_spark.pipeline.graph import triangle_stats

    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    # r12 (guide §2.3/§2.4 — the dhash single-subtree pair pattern): the
    # a<b self-join scanned lineitem twice + built a broadcast per run;
    # per-order part SETS from ONE map-combined groupBy expand to the
    # same ordered pairs via a sorted-array nested transform (max parts
    # per order is single-digit — no group blowup), so edge construction
    # is one scan + one combiner shuffle. triangle_stats' canonicalize +
    # distinct sees the identical edge set.
    parts = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    edges = parts.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (a, i) -> transform("
                "slice(ps, i + 2, size(ps)),"
                " b -> struct(a AS id_a, b AS id_b))))"
            )
        ).alias("p")
    ).select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    return triangle_stats(edges)


@query(
    "events_trend_ols",
    # Every sufficient statistic is an exact integer: x in whole seconds
    # from a fixed origin, y quantized to micro-units with the repo's
    # det-round (floor(y*1e6 + 0.5) — identical in both engines). Sums
    # run in HUGEINT (DuckDB) / decimal(38) (Spark) so no width ever
    # overflows (the first draft's BIGINT n*Σx² overflowed at sf0.1);
    # slope/intercept are the SAME IEEE double op sequence on identical
    # exact integers, so the doubles are bit-identical.
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 - {_TS_BASE} AS x,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS yu
      FROM events
    ), a AS (
      SELECT event_type,
             count(*) AS n_h,
             sum(x) AS sx_h,
             sum(x * x) AS sxx_h,
             sum(yu) AS syu_h,
             sum(yu * x) AS sxyu_h
      FROM s GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_h AS BIGINT) AS n,
           CAST(sx_h AS BIGINT) AS sx,
           CAST(sxx_h AS BIGINT) AS sxx,
           CAST(syu_h AS DOUBLE) / 1000000.0 AS sy,
           CAST(sxyu_h AS DOUBLE) / 1000000.0 AS sxy,
           CAST(n_h * sxyu_h - sx_h * syu_h AS DOUBLE)
             / CAST(n_h * sxx_h - sx_h * sx_h AS DOUBLE)
             / 1000000.0 AS slope,
           (CAST(syu_h AS DOUBLE) / 1000000.0
            - (CAST(n_h * sxyu_h - sx_h * syu_h AS DOUBLE)
               / CAST(n_h * sxx_h - sx_h * sx_h AS DOUBLE)
               / 1000000.0)
              * CAST(sx_h AS DOUBLE)) / n_h AS intercept
    FROM a
    """,
)
def events_trend_ols_q(spark, sf):
    """Per-key OLS trend (metric drift detection): slope/intercept of
    value-vs-time per event_type from EXACT integer sufficient
    statistics — x in seconds from a fixed origin, y det-rounded to
    micro-units, Σ's in decimal(38) (order-independent, no overflow at
    any probed scale), one identical double-division sequence at the
    very end. One map-combined aggregate, no window, no second pass."""
    ev = t(spark, sf, "events")
    sel = ev.select(
        "event_type",
        (F.expr("unix_micros(ts) div 1000000") - F.lit(_TS_BASE)).alias("x"),
        F.expr(
            "CAST(floor(value * 1000000d + 0.5d) AS BIGINT)"
        ).alias("yu"),
    )
    agg = sel.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(
            (F.col("x") * F.col("x")).cast("decimal(20,0)")
        ).alias("sxx_d"),
        F.sum(F.col("yu").cast("decimal(20,0)")).alias("syu_d"),
        F.sum(
            (F.col("yu") * F.col("x")).cast("decimal(25,0)")
        ).alias("sxyu_d"),
    )
    num = (
        F.col("n").cast("decimal(10,0)") * F.col("sxyu_d")
        - F.col("sx").cast("decimal(14,0)") * F.col("syu_d")
    ).cast("double")
    den = (
        F.col("n").cast("decimal(10,0)") * F.col("sxx_d")
        - F.col("sx").cast("decimal(14,0)") * F.col("sx").cast("decimal(14,0)")
    ).cast("double")
    slope = num / den / F.lit(1000000.0)
    sy = F.col("syu_d").cast("double") / F.lit(1000000.0)
    return agg.select(
        "event_type",
        "n",
        "sx",
        F.col("sxx_d").cast("bigint").alias("sxx"),
        sy.alias("sy"),
        (F.col("sxyu_d").cast("double") / F.lit(1000000.0)).alias("sxy"),
        slope.alias("slope"),
        ((sy - slope * F.col("sx").cast("double")) / F.col("n")).alias(
            "intercept"
        ),
    )


# --- per-document token cap for the within-doc pair joins -----------------
# token_cooccurrence / token_pair_lift build candidate pairs by self-joining
# the per-document distinct-token table on doc_id: the pair stage is
# QUADRATIC IN DISTINCT TOKENS PER DOCUMENT. Bounded for normal corpora
# (fixture max ~100 tokens/doc), but a single pathological 100k-token
# document would emit 5e9 intermediate pairs inside one task (r9 verdict
# Wrong #3). Same guard discipline as pipeline/dedup.DEFAULT_BUCKET_CAP:
# keep the lexicographically-first ``cap`` distinct tokens per document
# (deterministic, row-local — an array slice, no extra shuffle), opt out
# with ``max_tokens_per_doc=None``, and make the trade OBSERVABLE via
# df.observe (capped_docs / max_doc_tokens).
DEFAULT_DOC_TOKEN_CAP = 5000
USE_DEFAULT_DOC_CAP: object = object()
_OBS_SEQ = itertools.count()


def doc_distinct_tokens(
    docs,
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_len: int = 4,
    max_tokens_per_doc=USE_DEFAULT_DOC_CAP,
    observe_name: str | None = None,
):
    """(doc_col, tk): per-document DISTINCT whitespace tokens of length
    >= ``min_len``, at most ``max_tokens_per_doc`` per document (the
    lexicographically smallest — array_sort + slice keeps the selection
    deterministic and engine-independent). ``None`` disables the cap;
    under the cap the token SET is unchanged (sorting is order-neutral
    for the downstream groupBys), so capped and uncapped runs agree on
    every corpus whose documents fit the cap."""
    cap = (
        DEFAULT_DOC_TOKEN_CAP
        if max_tokens_per_doc is USE_DEFAULT_DOC_CAP
        else max_tokens_per_doc
    )
    toks = F.filter(
        F.array_distinct(F.split(F.col(text_col), " ")),
        lambda x: F.length(x) >= min_len,
    )
    if cap is None:
        return docs.select(
            F.col(doc_col), F.explode(toks).alias("tk")
        )
    sel = doc_token_arrays(
        docs, text_col, doc_col, min_len, cap, observe_name
    )
    return sel.select(F.col(doc_col), F.explode("_tks").alias("tk"))


def doc_token_arrays(
    docs,
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_len: int = 4,
    cap: int = DEFAULT_DOC_TOKEN_CAP,
    observe_name: str | None = None,
):
    """(doc_col, _tks): the capped SORTED distinct-token array per
    document — the shared leaf under ``doc_distinct_tokens`` (explode)
    and ``doc_token_pairs`` (within-doc ordered pairs). One row per
    input document, empty arrays preserved."""
    toks = F.filter(
        F.array_distinct(F.split(F.col(text_col), " ")),
        lambda x: F.length(x) >= min_len,
    )
    sel = docs.select(
        F.col(doc_col),
        F.slice(F.array_sort(toks), 1, cap).alias("_tks"),
        F.size(toks).alias("_ntk"),
    )
    if observe_name is not None:
        # str names get a driver-side sequence suffix (metric names must
        # be unique within one plan — the digest runs several capped
        # operators in one union); a pyspark.sql.Observation passes
        # through for direct .get retrieval in tests.
        obs = (
            f"{observe_name}_{next(_OBS_SEQ)}"
            if isinstance(observe_name, str)
            else observe_name
        )
        sel = sel.observe(
            obs,
            F.sum(
                F.when(F.col("_ntk") > cap, 1).otherwise(0)
            ).alias("capped_docs"),
            F.max(F.col("_ntk")).alias("max_doc_tokens"),
        )
    return sel.select(F.col(doc_col), "_tks")


def doc_token_pairs(arrays, doc_col: str = "doc_id"):
    """(doc_col, t1, t2): every within-document ordered token pair
    (t1 < t2) straight from the sorted ``_tks`` array — r12 (guide
    §2.4, the single-subtree pair pattern): the dt⋈dt self-join this
    replaces evaluated the whole tokenize subtree once per side and
    shuffled the exploded stream twice; the array is already sorted, so
    i < j positions ARE the t1 < t2 pairs. Pair count per doc is
    cap-bounded by construction."""
    return arrays.select(
        F.col(doc_col),
        F.explode(
            F.expr(
                "flatten(transform(_tks, (a, i) -> transform("
                "slice(_tks, i + 2, size(_tks)),"
                " b -> struct(a AS t1, b AS t2))))"
            )
        ).alias("p"),
    ).select(doc_col, F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))


@query(
    "token_cooccurrence",
    oracle="""
    WITH dt AS (
      SELECT doc_id,
             unnest(list_filter(list_distinct(string_split(text, ' ')),
                                x -> length(x) >= 4)) AS tk
      FROM documents
    ), p AS (
      SELECT a.tk AS t1, b.tk AS t2, CAST(count(*) AS BIGINT) AS n_docs
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tk < b.tk
      GROUP BY 1, 2
    )
    SELECT t1, t2, n_docs FROM p
    ORDER BY n_docs DESC, t1, t2 LIMIT 50
    """,
)
def token_cooccurrence_q(spark, sf):
    """Frequent-itemset mining, pairwise: top-50 content-token pairs
    (length >= 4) by document co-occurrence — the market-basket /
    feature-co-occurrence staple. Per-document distinct-token explode,
    within-doc pair join (bounded by document size), map-combined pair
    count, TakeOrderedAndProject top-k with a total (count, t1, t2)
    order. Per-doc distinct tokens are capped at DEFAULT_DOC_TOKEN_CAP
    (doc_distinct_tokens) so one pathological document can't go
    quadratic; the fixture sits far below the cap, so results equal the
    uncapped oracle."""
    docs = t(spark, sf, "documents")
    # r12: within-doc ordered pairs straight from the sorted capped
    # array (doc_token_pairs) — the dt⋈dt self-join evaluated the
    # tokenize subtree per side and shuffled the exploded stream twice.
    pairs = (
        doc_token_pairs(
            doc_token_arrays(docs, observe_name="token_cooc_cap")
        )
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return pairs.orderBy(
        F.col("n_docs").desc(), "t1", "t2"
    ).limit(50)


# ---------------------------------------------------------------------------
# Batch 6: behavioral analytics (transition matrix, RFM), feature stats
# ---------------------------------------------------------------------------


@query(
    "events_transition_matrix",
    oracle="""
    WITH o AS (
      SELECT event_type AS to_state,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_state
      FROM events
    ), c AS (
      SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
      FROM o WHERE from_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, n,
           CAST((1000000 * n) // sum(n)
                OVER (PARTITION BY from_state) AS BIGINT) AS p_ppm
    FROM c
    """,
)
def events_transition_matrix_q(spark, sf):
    """First-order Markov journey matrix
    (operators/behavior.py::transition_matrix): which event type follows
    which, per user-ordered history — counts + exact ppm row
    probabilities (the Sankey/flow-analysis input). One user-partitioned
    lag window + one map-combined count."""
    from squirreling_spark.operators.behavior import transition_matrix

    return transition_matrix(
        t(spark, sf, "events"), "user_id", "event_type", "ts", "event_id"
    )


@query(
    "rfm_segmentation",
    oracle=f"""
    WITH pk AS (
      SELECT user_id,
             CAST(max(epoch_us(ts) // 1000000 - {_TS_BASE}) AS BIGINT)
               AS r_s,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS m
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), cuts AS (
      SELECT
        floor(quantile_cont(CAST(r_s AS DOUBLE), 0.25)*1000000000+0.5)
          /1000000000 AS r0,
        floor(quantile_cont(CAST(r_s AS DOUBLE), 0.5)*1000000000+0.5)
          /1000000000 AS r1,
        floor(quantile_cont(CAST(r_s AS DOUBLE), 0.75)*1000000000+0.5)
          /1000000000 AS r2,
        floor(quantile_cont(CAST(f AS DOUBLE), 0.25)*1000000000+0.5)
          /1000000000 AS f0,
        floor(quantile_cont(CAST(f AS DOUBLE), 0.5)*1000000000+0.5)
          /1000000000 AS f1,
        floor(quantile_cont(CAST(f AS DOUBLE), 0.75)*1000000000+0.5)
          /1000000000 AS f2,
        floor(quantile_cont(m, 0.25)*1000000000+0.5)/1000000000 AS m0,
        floor(quantile_cont(m, 0.5)*1000000000+0.5)/1000000000 AS m1,
        floor(quantile_cont(m, 0.75)*1000000000+0.5)/1000000000 AS m2
      FROM pk
    ), seg AS (
      SELECT user_id, r_s, f, m,
        CAST(1 + (CASE WHEN CAST(r_s AS DOUBLE) > r0 THEN 1 ELSE 0 END)
               + (CASE WHEN CAST(r_s AS DOUBLE) > r1 THEN 1 ELSE 0 END)
               + (CASE WHEN CAST(r_s AS DOUBLE) > r2 THEN 1 ELSE 0 END)
             AS BIGINT) AS r_seg,
        CAST(1 + (CASE WHEN CAST(f AS DOUBLE) > f0 THEN 1 ELSE 0 END)
               + (CASE WHEN CAST(f AS DOUBLE) > f1 THEN 1 ELSE 0 END)
               + (CASE WHEN CAST(f AS DOUBLE) > f2 THEN 1 ELSE 0 END)
             AS BIGINT) AS f_seg,
        CAST(1 + (CASE WHEN m > m0 THEN 1 ELSE 0 END)
               + (CASE WHEN m > m1 THEN 1 ELSE 0 END)
               + (CASE WHEN m > m2 THEN 1 ELSE 0 END)
             AS BIGINT) AS m_seg
      FROM pk, cuts
    )
    SELECT user_id, r_s, f, m, r_seg, f_seg, m_seg,
           CAST(r_seg * 100 + f_seg * 10 + m_seg AS BIGINT) AS rfm_code
    FROM seg
    """,
)
def rfm_segmentation_q(spark, sf):
    """RFM segmentation (operators/behavior.py::rfm_segments): per-user
    Recency/Frequency/Monetary over purchases, quartile-bucketed by
    exact det-rounded cutoffs broadcast back over a row-local pass — no
    global ntile sort (a single-task window at 100 TB); recency is in
    seconds from a fixed origin so the quantile interpolation stays in
    exactly-representable double range."""
    from squirreling_spark.operators.behavior import rfm_segments

    ev = t(spark, sf, "events").filter(F.col("event_type") == "purchase")
    ev = ev.withColumn(
        "__rs", F.expr("unix_micros(ts) div 1000000") - F.lit(_TS_BASE)
    )
    return rfm_segments(ev, "user_id", "__rs", "value").withColumnRenamed(
        "recency", "r_s"
    )


@query(
    "embedding_dim_stats",
    oracle="""
    WITH e AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS xq
      FROM embeddings
    ), a AS (
      SELECT dim, count(*) AS n_h, sum(xq) AS sxq_h,
             sum(xq * xq) AS sxxq_h
      FROM e GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(n_h AS BIGINT) AS n,
           CAST(sxq_h AS BIGINT) AS sxq,
           CAST(sxxq_h AS BIGINT) AS sxxq,
           CAST(sxq_h AS DOUBLE) / n_h / 1000000.0 AS mean,
           sqrt(CAST(n_h * sxxq_h - sxq_h * sxq_h AS DOUBLE)
                / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE))
                / 1e12) AS std
    FROM a
    """,
)
def embedding_dim_stats_q(spark, sf):
    """Per-dimension feature standardization stats
    (pipeline/feature.py): µ-unit-quantized exact Σx/Σx² per embedding
    dimension, mean/std by one fixed IEEE sequence (std is a single
    correctly-rounded sqrt) — the whitening/z-score/dead-dim
    diagnostic. posexplode into ONE map-combined aggregate."""
    from squirreling_spark.pipeline.feature import embedding_dim_stats

    return embedding_dim_stats(
        t(spark, sf, "embeddings"), "embedding", "vec_id"
    )


# ---------------------------------------------------------------------------
# Batch 7: fact-to-SCD2 dimensional lookup (bitemporal point-in-interval)
# ---------------------------------------------------------------------------

# Open (current) intervals extend to a fixed horizon just past the data's
# time range; a bounded cap keeps the bin explode finite (open-ended
# intervals would otherwise explode unbounded bin sequences).
_SCD_CAP_US = 1009843200 * 1_000_000  # 2002-01-01 UTC
_SCD_BIN_US = 90 * 86400 * 1_000_000  # 90-day bins


@query(
    "fact_scd2_lookup",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, o_orderstatus, epoch_us(o_orderdate) AS us,
             o_orderkey,
             lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
               AS prev_s,
             lag(1) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS first_m
      FROM orders
    ), r AS (
      SELECT o_custkey, o_orderstatus, us,
             sum(CASE WHEN first_m IS NULL
                      OR prev_s IS DISTINCT FROM o_orderstatus
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o
    ), runs AS (
      SELECT o_custkey, CAST(run_id AS BIGINT) AS run_id,
             min(o_orderstatus) AS status,
             CAST(min(us) AS BIGINT) AS lo
      FROM r GROUP BY o_custkey, run_id
    ), iv AS (
      SELECT o_custkey, run_id, status, lo,
             coalesce(lead(lo) OVER (PARTITION BY o_custkey
                                     ORDER BY run_id),
                      {_SCD_CAP_US}) - 1 AS hi
      FROM runs
    ), f AS (
      SELECT l.l_orderkey, l.l_linenumber, ord.o_custkey AS cust,
             epoch_us(l.l_shipdate) AS ship_us
      FROM lineitem l JOIN orders ord ON l.l_orderkey = ord.o_orderkey
    )
    SELECT f.l_orderkey, CAST(f.l_linenumber AS BIGINT) AS l_linenumber,
           f.cust, f.ship_us, iv.status,
           iv.run_id
    FROM f JOIN iv
      ON f.cust = iv.o_custkey
     AND f.ship_us >= iv.lo AND f.ship_us <= iv.hi
    """,
)
def fact_scd2_lookup_q(spark, sf):
    """Fact-to-SCD2 dimensional lookup — the canonical warehouse
    bitemporal query: each lineitem (fact, timestamped by ship date)
    joined to the validity interval of its customer's order-status
    history (dimension built by operators/scd.py::status_intervals).
    The point-in-interval pairing runs through the binned range join
    keyed on (customer, 90-day bin) — a hash equi-join; open (current)
    intervals are capped at a fixed horizon so the bin explode stays
    bounded. The DuckDB oracle replays it with a raw inequality join
    (IEJoin) — an independent join algorithm."""
    from squirreling_spark.operators.scd import status_intervals

    # parquet TIMESTAMP_NTZ -> TIMESTAMP (session is UTC, value-preserving)
    orders = t(spark, sf, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    dim = status_intervals(
        orders, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    ).select(
        F.col("o_custkey").alias("ivkey"),
        "run_id",
        "status",
        F.col("valid_from_us").alias("lo"),
        (
            F.coalesce(F.col("valid_to_us"), F.lit(_SCD_CAP_US)) - 1
        ).alias("hi"),
    )
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias(
            "ship_us"
        ),
    )
    facts = li.join(
        orders.select(
            F.col("o_orderkey"), F.col("o_custkey").alias("cust")
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_linenumber", "cust", "ship_us")
    j = range_join(
        facts, dim, "ship_us", "lo", "hi",
        bin_width=float(_SCD_BIN_US), by=[("cust", "ivkey")],
    )
    return j.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        "cust",
        "ship_us",
        "status",
        "run_id",
    )


# ---------------------------------------------------------------------------
# Batch 8: streaming dimension enrichment + session path analysis
# ---------------------------------------------------------------------------


@query(
    "events_stream_enrich",
    oracle="""
    SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP) AS window_start,
           c.c_mktsegment,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(27,6))) AS DOUBLE)
             AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def events_stream_enrich_q(spark, sf):
    """Stream-static dimension enrichment
    (streaming/windows.py::enriched_tumbling) through a REAL Structured
    Streaming cycle: events readStream -> broadcast join to the static
    customer dimension (market segment) -> watermarked tumbling rollup
    -> availableNow memory sink. The canonical 'enrich the click stream
    with the account dimension' pipeline; dimension state is zero (the
    static side broadcasts into each micro-batch). Oracle = the plain
    batch join+group SQL — stream/batch equivalence."""
    import hashlib
    import os as _os
    import tempfile

    from squirreling_spark.qutil import pinned_shuffle
    from squirreling_spark.streaming.windows import enriched_tumbling

    ev = t(spark, sf, "events")
    cust = t(spark, sf, "customer")
    stage = _os.path.join(
        tempfile.gettempdir(),
        f"sq_enrich_{_os.path.basename(sf.rstrip('/'))}",
    )
    ev.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(ev.schema).parquet(stage)
    agg = enriched_tumbling(
        stream, cust, ("user_id", "c_custkey"), "c_mktsegment"
    )
    digest = hashlib.md5(("enrich" + sf).encode("utf-8")).hexdigest()[:8]
    sink = f"sq_enrich_sink_{digest}"
    with pinned_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            exc = q.exception()
            q.stop()
            raise RuntimeError(
                f"streaming enrich query did not finish (exception: {exc})"
            )
    return spark.table(sink)


@query(
    "session_path_topk",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
      FROM events
    ), s AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM o
    ), g AS (
      SELECT user_id, session_seq,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM s GROUP BY user_id, session_seq
    )
    SELECT seq AS path, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM g GROUP BY seq
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def session_path_topk_q(spark, sf):
    """Path analysis: the top-20 most common session event-type
    sequences (the product-analytics 'what do users actually do'
    report) — built on the same bounded-session sequence strings as
    event_pattern_match, one map-combined path count, top-k under a
    total (count, path) order."""
    seqs = session_pattern_match(
        t(spark, sf, "events"), "user_id", "event_type", "ts", "event_id",
        _PATTERN,
    ).select("user_id", F.col("seq").alias("path"))
    return (
        seqs.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Batch 9: postings index, exact correlation matrix, Pareto/ABC analysis
# ---------------------------------------------------------------------------


@query(
    "build_postings",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ), td AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
             CAST(min(pos) AS BIGINT) AS first_pos
      FROM tok GROUP BY term, doc_id
    ), d AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM td GROUP BY term
    )
    SELECT td.term, td.doc_id, td.tf, td.first_pos, d.df
    FROM td JOIN d USING (term) WHERE d.df >= 2
    """,
)
def build_postings_q(spark, sf):
    """Inverted-index construction (the retrieval-infrastructure export
    next to bm25_rank): per (term, doc) posting rows — term frequency,
    first position, document frequency — for terms appearing in >= 2
    documents. posexplode into a map-combined (term, doc) aggregate,
    term-level df aggregate, one equi-join back; postings stay
    relational rows (shardable by term at any scale), never a
    collected list."""
    docs = t(spark, sf, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
    )
    td = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.min("pos").cast("bigint").alias("first_pos"),
    )
    d = td.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    return (
        td.join(d, "term")
        .where(F.col("df") >= 2)
        .select("term", "doc_id", "tf", "first_pos", "df")
    )


# per-column fixed-point scales: chosen so every per-row product of two
# quantized values fits bigint (max |xq| ~5e7) while keeping full input
# precision (prices have 2 decimals; qty is integral; discount/tax have
# <= 2; the det-round makes the quantization identical cross-engine)
_CORR_COLS = [
    ("l_quantity", 1_000_000),
    ("l_extendedprice", 100),
    ("l_discount", 1_000_000),
    ("l_tax", 1_000_000),
]


def _corr_oracle() -> str:
    qcols = ", ".join(
        f"CAST(floor({c} * {s} + 0.5) AS BIGINT) AS {c}_q"
        for c, s in _CORR_COLS
    )
    aggs = ["count(*) AS n_h"]
    for c, _ in _CORR_COLS:
        aggs.append(f"sum(CAST({c}_q AS HUGEINT)) AS s_{c}")
        aggs.append(
            f"sum(CAST({c}_q AS HUGEINT) * {c}_q) AS ss_{c}"
        )
    pairs = []
    names = [c for c, _ in _CORR_COLS]
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            x, y = names[i], names[j]
            aggs.append(
                f"sum(CAST({x}_q AS HUGEINT) * {y}_q) AS sp_{x}_{y}"
            )
            pairs.append(
                f"SELECT '{x}' AS col_x, '{y}' AS col_y,"
                f" CAST(n_h AS BIGINT) AS n,"
                f" CAST(n_h * sp_{x}_{y} - s_{x} * s_{y} AS DOUBLE)"
                f" / (sqrt(CAST(n_h * ss_{x} - s_{x} * s_{x} AS DOUBLE))"
                f" * sqrt(CAST(n_h * ss_{y} - s_{y} * s_{y} AS DOUBLE)))"
                f" AS corr FROM a"
            )
    return (
        "WITH q AS (SELECT " + qcols + " FROM lineitem),\n"
        "a AS (SELECT " + ", ".join(aggs) + " FROM q)\n"
        + "\nUNION ALL\n".join(pairs)
    )


@query("lineitem_corr_matrix", oracle=_corr_oracle())
def lineitem_corr_matrix_q(spark, sf):
    """Exact Pearson correlation matrix over lineitem's four numeric
    columns from integer sufficient statistics (per-column fixed-point
    det-round quantization; Σx/Σx²/Σxy in decimal(38) — no doubles
    until one final fixed IEEE sequence per pair, sqrt included). ONE
    map-combined aggregate produces every pairwise statistic; the 6
    output rows are row-local arithmetic on the single summary row."""
    li = t(spark, sf, "lineitem")
    q = li.select(
        *[
            F.expr(
                f"CAST(floor({c} * {s} + 0.5) AS BIGINT)"
            ).alias(f"{c}_q")
            for c, s in _CORR_COLS
        ]
    )
    names = [c for c, _ in _CORR_COLS]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_h")]
    for c in names:
        aggs.append(
            F.sum(F.col(f"{c}_q").cast("decimal(20,0)")).alias(f"s_{c}")
        )
        aggs.append(
            F.sum(
                (
                    F.col(f"{c}_q").cast("decimal(19,0)")
                    * F.col(f"{c}_q")
                ).cast("decimal(30,0)")
            ).alias(f"ss_{c}")
        )
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            x, y = names[i], names[j]
            aggs.append(
                F.sum(
                    (
                        F.col(f"{x}_q").cast("decimal(19,0)")
                        * F.col(f"{y}_q")
                    ).cast("decimal(30,0)")
                ).alias(f"sp_{x}_{y}")
            )
    a = q.agg(*aggs)
    # r12 (guide §2.4/§7.2 — duplicated subtrees): the 6 output rows were
    # a unionAll of 6 selects over `a`; column pruning makes each branch's
    # aggregate distinct, so the plan scanned lineitem SIX times. One
    # explode over an array of pair structs keeps the identical per-pair
    # expressions (same IEEE sequence, same row order) over ONE aggregate.
    pair_structs = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            x, y = names[i], names[j]
            num = (
                F.col("n_h").cast("decimal(12,0)") * F.col(f"sp_{x}_{y}")
                - F.col(f"s_{x}") * F.col(f"s_{y}")
            ).cast("double")
            denx = (
                F.col("n_h").cast("decimal(12,0)") * F.col(f"ss_{x}")
                - F.col(f"s_{x}") * F.col(f"s_{x}")
            ).cast("double")
            deny = (
                F.col("n_h").cast("decimal(12,0)") * F.col(f"ss_{y}")
                - F.col(f"s_{y}") * F.col(f"s_{y}")
            ).cast("double")
            pair_structs.append(
                F.struct(
                    F.lit(x).alias("col_x"),
                    F.lit(y).alias("col_y"),
                    F.col("n_h").alias("n"),
                    (num / (F.sqrt(denx) * F.sqrt(deny))).alias("corr"),
                )
            )
    return a.select(
        F.explode(F.array(*pair_structs)).alias("r")
    ).select("r.col_x", "r.col_y", "r.n", "r.corr")


@query(
    "customer_pareto_abc",
    oracle="""
    WITH r AS (
      SELECT o_custkey AS key,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS value
      FROM orders GROUP BY o_custkey
    ), c AS (
      SELECT key, value,
             CAST(sum(value) OVER (ORDER BY value DESC, key
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(value) OVER () AS BIGINT) AS grand
      FROM r
    )
    SELECT key, value, cum,
           CAST((CAST(cum AS HUGEINT) * 1000000) // grand AS BIGINT)
             AS cum_ppm,
           CASE WHEN (CAST(cum AS HUGEINT) * 1000000) // grand <= 800000
                THEN 'A'
                WHEN (CAST(cum AS HUGEINT) * 1000000) // grand <= 950000
                THEN 'B' ELSE 'C' END AS abc_class
    FROM c
    """,
)
def customer_pareto_abc_q(spark, sf):
    """Pareto / ABC revenue segmentation (operators/abc.py): each
    customer's cumulative share of total order revenue in descending
    order, classed A/B/C at 80/95%. The global ordered cumsum uses the
    positional-join two-level shape — range repartition + per-partition
    sums + broadcast offsets — never a single-task global window;
    revenue is det-rounded integer cents, the share is a decimal(38)
    integer division. Oracle = the plain global window cumsum."""
    from squirreling_spark.operators.abc import pareto_abc

    rev = (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            F.expr(
                "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("__cents"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("__cents").cast("bigint").alias("rev_cents"))
    )
    return pareto_abc(rev, "o_custkey", "rev_cents")


# ---------------------------------------------------------------------------
# Round 9: event debounce/throttle + token-pair lift (collocations)
# ---------------------------------------------------------------------------


@query(
    "events_debounce",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             CAST(epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) AS BIGINT) AS gap_us
      FROM events
    )
    SELECT user_id, event_type, event_id, ts_us, gap_us,
           CAST(CASE WHEN gap_us IS NULL OR gap_us >= 30000000
                THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM o
    """,
)
def events_debounce_q(spark, sf):
    """Debounce/throttle filter (operators/resample.py::throttle): per
    (user, event_type), an event is kept iff it is the first or arrives
    >= 30s after the immediately preceding event — log dedup for double
    clicks / retries / sensor chatter. ONE key-partitioned window
    shuffle; integer-microsecond arithmetic, exact cross-engine."""
    from squirreling_spark.operators.resample import throttle

    return throttle(
        t(spark, sf, "events"),
        ["user_id", "event_type"],
        "ts",
        "event_id",
        30_000_000,
    )


@query(
    "token_pair_lift",
    oracle="""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(list_filter(
               list_distinct(string_split(text, ' ')),
               x -> length(x) >= 4)) AS tk
      FROM documents
    ), df AS (
      SELECT tk, CAST(count(*) AS BIGINT) AS n_df FROM dt GROUP BY tk
    ), tot AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_total
      FROM documents
    ), p AS (
      SELECT a.tk AS t1, b.tk AS t2, CAST(count(*) AS BIGINT) AS n_pair
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tk < b.tk
      GROUP BY 1, 2
    )
    SELECT p.t1, p.t2, p.n_pair, d1.n_df AS df1, d2.n_df AS df2,
           CAST(CAST(p.n_pair AS HUGEINT) * n_total * 1000000
                // (CAST(d1.n_df AS HUGEINT) * d2.n_df) AS BIGINT)
             AS lift_ppm
    FROM p
    JOIN df d1 ON p.t1 = d1.tk
    JOIN df d2 ON p.t2 = d2.tk
    CROSS JOIN tot
    WHERE p.n_pair >= 3
    ORDER BY lift_ppm DESC, p.t1, p.t2 LIMIT 50
    """,
)
def token_pair_lift_q(spark, sf):
    """Collocation extraction by association-rule LIFT: top-50 content
    token pairs (length >= 4, co-occurring in >= 3 documents) by
    lift_ppm = 1e6 * P(t1,t2) / (P(t1) P(t2)) over document
    frequencies — integer-exact (the log of lift is PMI; staying in
    ppm-ratio space keeps the score bit-identical cross-engine).
    Same capped within-doc pair join as token_cooccurrence
    (doc_distinct_tokens: per-doc token cap, fixture far below it), plus
    two hash joins onto the map-combined document-frequency table and a
    broadcast 1-row total."""
    from squirreling_spark.pipeline.ckpt import truncate_lineage

    docs = t(spark, sf, "documents")
    # r12: one tokenize pass — the capped sorted-array frame is
    # materialized once and feeds the pair expansion, the document
    # frequencies, AND the doc total (`doc_token_arrays` keeps one row
    # per input document, so count_distinct over it equals the base
    # count). The dt⋈dt self-join (tokenize per side) is gone —
    # executed plan had 5 parquet scans, now 1.
    arrs = truncate_lineage(
        doc_token_arrays(docs, observe_name="token_lift_cap")
    )
    dt = arrs.select("doc_id", F.explode("_tks").alias("tk"))
    dfreq = dt.groupBy("tk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_df")
    )
    total = arrs.agg(
        F.count_distinct(F.col("doc_id")).cast("bigint").alias("n_total")
    )
    pairs = (
        doc_token_pairs(arrs)
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .where(F.col("n_pair") >= 3)
    )
    out = (
        pairs.join(
            dfreq.select(F.col("tk").alias("t1"), F.col("n_df").alias("df1")),
            "t1",
        )
        .join(
            dfreq.select(F.col("tk").alias("t2"), F.col("n_df").alias("df2")),
            "t2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            "n_pair",
            "df1",
            "df2",
            F.expr(
                "CAST((CAST(n_pair AS DECIMAL(20,0)) * n_total * 1000000)"
                " div (CAST(df1 AS DECIMAL(20,0)) * df2) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return out.orderBy(F.col("lift_ppm").desc(), "t1", "t2").limit(50)
