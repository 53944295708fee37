"""Multi-join analytical queries (TPC-H Q3/Q5 shapes) and a
streaming-executed query — the full-pipeline end of the inventory.

The Q3/Q5 shapes exercise what the optimizer must get right at 100 TB:
join ordering across fact-fact-dim chains, early filter pushdown on every
input, broadcast of the dim chain, and partial aggregation above the join.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.qutil import dsum, o_dsum, pinned_shuffle, t


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
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf):
    """TPC-H Q4 shape (slow-shipping orders per priority; the schema has no
    commitdate/receiptdate, so 'late' = a lineitem shipped >90 days after
    the order date). The correlated EXISTS decorrelates to a LEFT SEMI
    hash join on orderkey — at 100 TB that is one fact-fact shuffle, never
    a per-row re-execution (reference re-runs the subquery per row,
    src/expression/evaluate.js)."""
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf):
    """TPC-H Q13 shape: order-count distribution over a LEFT OUTER join
    with a residual predicate on the null-producing side (the filter must
    ride the join condition, NOT a post-filter — semantics differ). Two
    aggregations: per-customer count, then the histogram; the second input
    is tiny so its shuffle is trivial."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_count(spark, sf):
    """TPC-H Q16 shape (lineitem stands in for partsupp as the
    part-supplier bridge): distinct-supplier counts per part attribute,
    excluding complained-about suppliers via NOT IN — planned as a
    broadcast LEFT ANTI join (the exclusion list is tiny), with the part
    filters pushed into the scan."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    bad = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 180
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    """,
)
def q18_large_volume(spark, sf):
    """TPC-H Q18 shape: large-volume orders — IN over a grouped HAVING
    subquery becomes a LEFT SEMI join against the aggregated keys; the
    heavy lineitem aggregation happens ONCE (map-side combined on
    orderkey), then semi-joins the fact chain. Quantity sums in exact
    integer arithmetic."""
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("__q"))
        .filter(F.col("__q") > 180)
        .select("l_orderkey")
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "__bk"),
               F.col("o_orderkey") == F.col("__bk"), "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("total_qty")
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
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
    # Stable sink name (builtin hash() is salted per process — repeated
    # in-session calls would leak one memory-sink table per run).
    digest = hashlib.md5(sf.encode("utf-8")).hexdigest()[:8]
    sink = f"sq_stream_sink_{digest}"
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
                f"streaming query did not finish within 300s"
                f" (exception: {exc})"  # fail loudly, never grade a partial sink
            )
    return spark.table(sink)


@query(
    "events_sliding_stream",
    oracle=f"""
    WITH x AS (
      SELECT CAST(date_trunc('hour', ts)
               + CASE WHEN EXTRACT(minute FROM ts) >= 30
                      THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END
               - k * INTERVAL 30 MINUTE AS TIMESTAMP) AS window_start,
             event_type, value
      FROM events, unnest([0, 1]) AS u(k)
    )
    SELECT window_start, event_type,
           count(*) AS n_events,
           {o_dsum('value')} AS total_value
    FROM x GROUP BY 1, 2
    """,
)
def events_sliding_stream(spark, sf):
    """The SLIDING-window aggregation (1h size / 30min hop — every event
    in two overlapping windows) executed through a REAL Structured
    Streaming cycle: readStream → watermark → window(ts, size, slide)
    agg → memory sink. Overlapping-window state is the part tumbling
    windows don't exercise (each event updates TWO state rows); the
    oracle is the batch sliding SQL — stream/batch equivalence for the
    overlap semantics."""
    ev = t(spark, sf, "events")
    stage = os.path.join(
        tempfile.gettempdir(), f"sq_stream_{os.path.basename(sf.rstrip('/'))}"
    )
    ev.write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(ev.schema).parquet(stage)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
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
    digest = hashlib.md5(("slide" + sf).encode("utf-8")).hexdigest()[:8]
    sink = f"sq_stream_sink_{digest}"
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
                f"streaming query did not finish within 300s"
                f" (exception: {exc})"
            )
    return spark.table(sink)


@query(
    "events_session_stream",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(CASE WHEN prev IS NULL OR us - prev > 1800000000
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, us
                     ROWS UNBOUNDED PRECEDING) AS seq
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, seq
    """,
)
def events_session_stream(spark, sf):
    """Gap-based sessions (30-min inactivity) via the NATIVE streaming
    ``session_window`` operator, run through a real Structured Streaming
    micro-batch cycle (readStream → merging session state → memory sink).
    The oracle restates session semantics as batch SQL: a lag/running-sum
    sessionize, then per-session bounds. Boundary rule (pinned by
    tests/test_streaming.py::test_session_window_exact_gap_merges): a gap
    EXACTLY equal to the threshold still MERGES — session windows
    [t, t+gap) that touch are coalesced — so the oracle's new-session
    predicate is strictly-greater, the same rule as the batch
    ``events_sessionize`` lag operator. ``session_end`` is
    last-event-ts + gap, the session_window contract.
    Stream/batch equivalence is the graded contract, as with
    events_tumbling_stream."""
    ev = t(spark, sf, "events")
    stage = os.path.join(
        tempfile.gettempdir(),
        f"sq_sess_stream_{os.path.basename(sf.rstrip('/'))}",
    )
    ev.select("event_id", "user_id", "ts").write.mode("overwrite").parquet(
        stage
    )
    src = spark.readStream.schema(
        ev.select("event_id", "user_id", "ts").schema
    ).parquet(stage)
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
    digest = hashlib.md5(sf.encode("utf-8")).hexdigest()[:8]
    sink = f"sq_sess_sink_{digest}"
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
                f"session stream did not finish within 300s (exception: {exc})"
            )
    return spark.table(sink)


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {o_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf):
    """TPC-H Q7 shape: bilateral trade volume by year between two nations.
    The two nation dims broadcast TWICE under different aliases (supplier
    side and customer side); the nation-name disjunction prunes BEFORE the
    fact-fact join via the broadcast hash joins, so only matching
    suppliers'/customers' rows reach the lineitem⋈orders shuffle. Yearly
    rollup is map-side combined; decimal-exact revenue."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(volume, "revenue"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf):
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned items
    in a half-year window. The date predicate pushes to the orders scan
    and the returnflag predicate to the lineitem scan (both before any
    join); nation broadcasts; the grouped top-20 is a
    TakeOrderedAndProject, so only 20 rows ever reach the driver side of
    the sort. Deterministic order via the custkey tiebreak."""
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "events_stream_join",
    oracle="""
    SELECT l.user_id AS key,
           l.ts AS l_ts, l.event_id AS l_event_id, l.value AS l_value,
           r.ts AS r_ts, r.event_id AS r_event_id, r.value AS r_value
    FROM events l JOIN events r
      ON r.user_id = l.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """,
)
def events_stream_join(spark, sf):
    """Stream-STREAM interval join (click → purchase within 1h per user)
    through a real micro-batch cycle: both sides watermarked, the join
    condition time-bounds buffered state so a continuous correlation job
    holds O(events-per-watermark-window) state per side, never history.
    Inner-join matches emit as found (append mode); the oracle is the
    equivalent batch interval join — stream/batch equivalence is the
    graded contract."""
    from squirreling_spark.streaming.windows import stream_interval_join

    ev = t(spark, sf, "events")
    stage = os.path.join(
        tempfile.gettempdir(),
        f"sq_ssj_stream_{os.path.basename(sf.rstrip('/'))}",
    )
    cols = ["event_id", "user_id", "ts", "event_type", "value"]
    ev.select(*cols).write.mode("overwrite").parquet(stage)
    src = spark.readStream.schema(ev.select(*cols).schema).parquet(stage)
    joined = stream_interval_join(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "purchase"),
        "user_id",
    )
    digest = hashlib.md5(sf.encode("utf-8")).hexdigest()[:8]
    sink = f"sq_ssj_sink_{digest}"
    with pinned_shuffle(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            exc = q.exception()
            q.stop()
            raise RuntimeError(
                f"stream-stream join did not finish within 300s (exc: {exc})"
            )
    return spark.table(sink)


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id,
             min(struct_pack(u := epoch_us(ts),
                             e := CAST(event_id AS BIGINT))) AS k
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id,
             min(struct_pack(u := epoch_us(e.ts),
                             e := CAST(e.event_id AS BIGINT))) AS k
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click'
        AND struct_pack(u := epoch_us(e.ts),
                        e := CAST(e.event_id AS BIGINT)) > s1.k
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id,
             min(struct_pack(u := epoch_us(e.ts),
                             e := CAST(e.event_id AS BIGINT))) AS k
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'signup'
        AND struct_pack(u := epoch_us(e.ts),
                        e := CAST(e.event_id AS BIGINT)) > s2.k
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id,
             min(struct_pack(u := epoch_us(e.ts),
                             e := CAST(e.event_id AS BIGINT))) AS k
      FROM events e JOIN s3 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND struct_pack(u := epoch_us(e.ts),
                        e := CAST(e.event_id AS BIGINT)) > s3.k
      GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id,
           s1.k.u AS s1_us, s1.k.e AS s1_eid,
           s2.k.u AS s2_us, s2.k.e AS s2_eid,
           s3.k.u AS s3_us, s3.k.e AS s3_eid,
           s4.k.u AS s4_us, s4.k.e AS s4_eid,
           CAST((CASE WHEN s1.k IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN s2.k IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN s3.k IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN s4.k IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS reached
    FROM u
    LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
    """,
)
def events_funnel_q(spark, sf):
    """Ordered-funnel analysis (operators/funnel.py::funnel_steps):
    view → click → signup → purchase, each step the FIRST event of its
    type strictly after the previous step's (ts, event_id) tuple —
    deterministic under simultaneous timestamps. The oracle replays all
    four chained min-struct aggregations, so the strict-order semantics
    (not just the counts) are value-checked. Per-step tables shrink
    monotonically; no per-user event history is ever collected."""
    from squirreling_spark.operators.funnel import funnel_steps

    return funnel_steps(
        t(spark, sf, "events"),
        "user_id",
        "event_type",
        "ts",
        "event_id",
        ["view", "click", "signup", "purchase"],
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id,
             min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ),
    j AS (
      SELECT f.cohort_week,
             CAST((epoch_us(a.week) - epoch_us(f.cohort_week))
                  // 604800000000 AS BIGINT) AS week_offset,
             a.user_id
      FROM active a JOIN first f USING (user_id)
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
      FROM first GROUP BY cohort_week
    )
    SELECT CAST(j.cohort_week AS TIMESTAMP) AS cohort_week, j.week_offset,
           CAST(count(*) AS BIGINT) AS n_active, s.n_cohort,
           CAST(count(*) * 1000000 // s.n_cohort AS BIGINT)
             AS retention_ppm
    FROM j JOIN sizes s USING (cohort_week)
    GROUP BY j.cohort_week, j.week_offset, s.n_cohort
    """,
)
def events_cohort_retention_q(spark, sf):
    """Weekly cohort retention (operators/funnel.py::cohort_retention):
    users cohorted by ISO week of first event, activity counted per
    (cohort, week-offset) with the offset as an exact microsecond
    division — the product-analytics matrix next to events_funnel.
    Everything shrinks toward |cohorts × offsets|; integer ppm
    retention is bit-identical cross-engine."""
    from squirreling_spark.operators.funnel import cohort_retention

    return cohort_retention(t(spark, sf, "events"), "user_id", "ts")
