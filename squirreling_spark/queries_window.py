"""Window functions (SURVEY.md §2.2): reference supports ROW_NUMBER / LAG /
LEAD only (src/validation/functions.js:33-35, src/execute/window.js:194-227);
we implement those plus the natural Spark superset its users asked for
(RANK/DENSE_RANK/NTILE/FIRST_VALUE/frames — reference syntax.md:40).

Scale: a window spec is one hash-partition shuffle on the PARTITION BY key +
in-partition sort. Partition keys below (custkey/user_id/suppkey) are
high-cardinality, so state distributes evenly; no global windows.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.qutil import dcol, t


@query(
    "window_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    """,
)
def window_row_number(spark, sf):
    """ROW_NUMBER (reference src/execute/window.js:194-199 — its only
    streaming-fast-path window function)."""
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).alias("rn")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark, sf):
    """LAG/LEAD with offset + default (reference src/execute/window.js:201-227)."""
    ev = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@query(
    "window_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey,
           rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rnk,
           dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS drnk
    FROM lineitem
    """,
)
def window_rank(spark, sf):
    """RANK/DENSE_RANK (reference rejects these, parseErrors.js:4-8 — Spark
    superset). Rank values are deterministic under ties by definition."""
    li = t(spark, sf, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(27,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark, sf):
    """Aggregate-over-window with an explicit ROWS frame (reference has no
    frames; Spark native). Decimal accumulation keeps the running total
    exact and partition-order independent."""
    o = t(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dcol("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@query(
    "window_ntile_first_last",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           first_value(c_name) OVER w AS first_name,
           last_value(c_name) OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS last_name
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_ntile_first_last(spark, sf):
    c = t(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_name").over(w).alias("first_name"),
        F.last("c_name").over(w_full).alias("last_name"),
    )
