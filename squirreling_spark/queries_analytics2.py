"""Second analytics batch: as-of join, distribution window functions,
ROLLUP/CUBE grouping sets, pivot — the Spark-native superset surface.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.operators.asof_join import asof_join
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
