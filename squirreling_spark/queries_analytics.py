"""Multi-join analytical queries (TPC-H Q3/Q5 shapes) and a
streaming-executed query — the full-pipeline end of the inventory.

The Q3/Q5 shapes exercise what the optimizer must get right at 100 TB:
join ordering across fact-fact-dim chains, early filter pushdown on every
input, broadcast of the dim chain, and partial aggregation above the join.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.qutil import dsum, o_dsum, t


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf):
    """TPC-H Q3 shape: segment filter pushes into the customer scan, date
    filters into orders/lineitem scans; customer joins broadcast; revenue
    aggregated with exact decimals; top-10 via TakeOrderedAndProject."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle=f"""
    SELECT n_name,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark, sf):
    """TPC-H Q5 shape: six-way join; the nation→region dim chain broadcasts
    and the c_nationkey = s_nationkey local-supplier condition rides the
    supplier join as an extra equi-conjunct."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    )
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


@query(
    "events_tumbling_stream",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           {o_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_stream(spark, sf):
    """The tumbling-window aggregation executed through a REAL Structured
    Streaming cycle: events → readStream → watermarked window agg →
    memory sink (availableNow micro-batches), then the sink's contents are
    returned. The oracle is the plain batch SQL — proving stream/batch
    semantic equivalence, the core Structured Streaming contract."""
    ev = t(spark, sf, "events")
    stage = os.path.join(
        tempfile.gettempdir(), f"sq_stream_{os.path.basename(sf.rstrip('/'))}"
    )
    ev.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(ev.schema).parquet(stage)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    sink = f"sq_stream_sink_{abs(hash(sf)) % 10**8}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)