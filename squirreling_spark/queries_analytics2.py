"""Second analytics batch: as-of join, distribution window functions,
ROLLUP/CUBE grouping sets, pivot — the Spark-native superset surface.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.operators.asof_join import asof_join
from squirreling_spark.operators.range_join import interval_overlap_join, range_join
from squirreling_spark.qutil import dsum, o_dsum, t


@query(
    "asof_join_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_id, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_events(spark, sf):
    """AS-OF join (operators/asof_join.py): each purchase matched to the
    user's most recent prior click. Verified against DuckDB's native
    ASOF JOIN — one shuffle, union+window implementation."""
    ev = t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id",
        right_cols=["click_id", "click_value"], suffix="",
    )
    return joined.select("event_id", "user_id", "ts", "click_id", "click_value")


_RJ_US = 1800 * 1_000_000  # ±30 min incident window, in microseconds


@query(
    "range_join_events",
    oracle=f"""
    SELECT i.event_id AS incident_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users,
           {o_dsum('c.value')} AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND value > 200) i
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON epoch_us(c.ts) BETWEEN epoch_us(i.ts) - {_RJ_US}
                            AND epoch_us(i.ts) + {_RJ_US}
    GROUP BY i.event_id
    """,
)
def range_join_events(spark, sf):
    """Point-in-interval join (operators/range_join.py): every click within
    ±30 min of a high-value purchase, aggregated per incident. Spark alone
    plans the BETWEEN as a nested loop; the binned operator makes it a hash
    equi-join on 1-hour time bins (each interval spans ≤2 bins). The DuckDB
    oracle runs the raw inequality join (its IEJoin) — an independent
    algorithm validating the binning."""
    ev = t(spark, sf, "events")
    incidents = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    ).select(
        F.col("event_id").alias("incident_id"),
        (F.unix_micros("ts") - F.lit(_RJ_US)).alias("lo"),
        (F.unix_micros("ts") + F.lit(_RJ_US)).alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("value").alias("click_value_raw"),
        F.unix_micros("ts").alias("pt"),
    )
    j = range_join(clicks, incidents, "pt", "lo", "hi", bin_width=2 * _RJ_US)
    return j.groupBy("incident_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
        F.countDistinct("click_user").cast("bigint").alias("n_users"),
        dsum("click_value_raw", "click_value"),
    )


@query(
    "sessions_overlap",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
      FROM events
    ), s AS (
      SELECT user_id, us,
             sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS seq
      FROM o
    ), sess AS (
      SELECT user_id, CAST(seq AS BIGINT) AS seq,
             min(us) AS lo, max(us) AS hi
      FROM s GROUP BY user_id, seq
    )
    SELECT a.user_id AS user_a, a.seq AS seq_a,
           b.user_id AS user_b, b.seq AS seq_b,
           CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) AS BIGINT)
             AS overlap_us
    FROM sess a JOIN sess b
      ON a.lo <= b.hi AND b.lo <= a.hi AND a.user_id < b.user_id
    """,
)
def sessions_overlap(spark, sf):
    """Concurrent sessions: interval-interval overlap self-join
    (operators/range_join.py::interval_overlap_join) over per-user session
    spans (30-min-gap sessionization), emitting each cross-user overlapping
    pair once with its overlap duration. Binned on 1-hour buckets with
    first-shared-bin pair ownership — a hash join, where the naive plan is
    an O(sessions^2) nested loop. Oracle: DuckDB IEJoin on the raw
    inequalities."""
    ev = t(spark, sf, "events")
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    s = ev.select(
        "user_id",
        us.alias("us"),
        F.sum(is_new)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("seq"),
    )
    sess = s.groupBy("user_id", "seq").agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    )
    a = sess.select(
        F.col("user_id").alias("user_a"), F.col("seq").alias("seq_a"),
        F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"), F.col("seq").alias("seq_b"),
        F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"),
    )
    j = interval_overlap_join(
        a, b, "lo_a", "hi_a", "lo_b", "hi_b", bin_width=3600 * 1_000_000
    )
    return j.filter(F.col("user_a") < F.col("user_b")).select(
        "user_a", "seq_a", "user_b", "seq_b",
        (F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b"))
        .cast("bigint")
        .alias("overlap_us"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           nth_value(c_name, 2) OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS second_name
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_distribution(spark, sf):
    """PERCENT_RANK / CUME_DIST / NTH_VALUE — distribution window functions
    (Spark superset; reference rejects them)."""
    c = t(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_nth = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_name", 2).over(w_nth).alias("second_name"),
    )


@query(
    "rollup_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {o_dsum('l_quantity')} AS qty,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark, sf):
    """ROLLUP grouping sets with GROUPING() markers — subtotal hierarchies
    in one pass (Spark superset)."""
    li = t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "qty"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@query(
    "cube_agg",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, {o_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark, sf):
    li = t(spark, sf, "orders")
    return li.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@query(
    "pivot_status",
    oracle=f"""
    SELECT o_orderpriority,
           {o_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
           {o_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
           {o_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status(spark, sf):
    """PIVOT: order totals per priority across status columns (oracle uses
    the portable CASE-aggregation equivalent)."""
    o = t(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double"))
    )
