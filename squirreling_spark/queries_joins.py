"""Join operators (SURVEY.md §2.1): hash equi-joins (all outer variants),
semi/anti (EXISTS / NOT EXISTS), non-equi theta joins with residuals,
USING joins, positional join, lateral.

Scale notes: dimension tables (region/nation/supplier/part) are explicitly
``broadcast()`` so the fact-side scan never shuffles for them; fact-fact
joins shuffle on the join key where Catalyst/AQE picks sort-merge or
shuffled-hash and splits skewed partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.operators.positional_join import positional_join
from squirreling_spark.qutil import dsum, o_dsum, t


@query(
    "join_inner",
    oracle=f"""
    SELECT n_name, o_orderstatus,
           count(*) AS n,
           {o_dsum('o_totalprice')} AS total
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, o_orderstatus
    """,
)
def join_inner(spark, sf):
    """Inner hash join chain (reference src/execute/join.js:224-348). The
    25-row nation dim is broadcast; customer⋈orders shuffles on custkey."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    n = t(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    """,
)
def join_left(spark, sf):
    """LEFT OUTER with an extra ON conjunct (null-padded non-matches,
    reference src/execute/join.js:279-306)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment
    FROM orders
    RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 200000
    """,
)
def join_right(spark, sf):
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 200000)
    return o.join(c, cond, "right").select("o_orderkey", "c_custkey", "c_mktsegment")


@query(
    "join_full",
    oracle="""
    SELECT cn.k AS ck, sn.k AS sk, cn.n_cust, sn.n_supp
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) cn
    FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) sn
      ON cn.k = sn.k
    """,
)
def join_full(spark, sf):
    """FULL OUTER join with unmatched keys on both sides."""
    cn = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.k == sn.k, "full").select(
        cn.k.alias("ck"), sn.k.alias("sk"), "n_cust", "n_supp"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark, sf):
    """EXISTS → left-semi join (reference evaluates EXISTS per row,
    src/expression/evaluate.js:766-775; Spark decorrelates to one semi join)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf):
    """NOT EXISTS → left-anti join."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_residual",
    oracle=f"""
    SELECT s_suppkey, c_custkey
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    """,
)
def join_residual(spark, sf):
    """Equi-key + non-equi residual (reference extracts equi conjuncts for the
    hash key and applies the rest post-match, src/plan/plan.js:773-843; Spark's
    ExtractEquiJoinKeys does exactly this)."""
    s = t(spark, sf, "supplier")
    c = t(spark, sf, "customer")
    cond = (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal)
    return s.join(c, cond).select("s_suppkey", "c_custkey")


@query(
    "join_theta",
    oracle="""
    SELECT a.r_regionkey AS ra, b.r_regionkey AS rb
    FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey
    """,
)
def join_theta(spark, sf):
    """Pure non-equi theta join → BroadcastNestedLoopJoin (reference
    NestedLoopJoin, src/execute/join.js:21-116)."""
    a = t(spark, sf, "region").alias("a")
    b = t(spark, sf, "region").alias("b")
    return a.join(b, F.col("a.r_regionkey") < F.col("b.r_regionkey")).select(
        F.col("a.r_regionkey").alias("ra"), F.col("b.r_regionkey").alias("rb")
    )


@query(
    "join_using",
    oracle="""
    SELECT nationkey, n_name, c_name
    FROM (SELECT c_nationkey AS nationkey, c_name FROM customer) c
    JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n
    USING (nationkey)
    """,
)
def join_using(spark, sf):
    """USING(col) join — single shared key column in the output (reference
    desugars USING to equi-AND, src/plan/plan.js:737-756)."""
    c = t(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey"), "c_name"
    )
    n = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    return c.join(F.broadcast(n), "nationkey").select("nationkey", "n_name", "c_name")


@query(
    "positional_join",
    oracle="""
    WITH a AS (SELECT n_nationkey, n_name,
                      row_number() OVER (ORDER BY n_nationkey) AS rn
               FROM nation),
         b AS (SELECT r_regionkey, r_name,
                      row_number() OVER (ORDER BY r_regionkey) AS rn
               FROM region)
    SELECT a.n_nationkey, a.n_name, b.r_regionkey, b.r_name
    FROM a FULL JOIN b ON a.rn = b.rn
    """,
)
def positional_join_q(spark, sf):
    """POSITIONAL JOIN (DuckDB-style row zip, reference
    src/execute/join.js:176-215): shorter side null-padded. Implemented as a
    composition: row_number over an explicit order + full outer join — see
    operators/positional_join.py."""
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    r = t(spark, sf, "region").select("r_regionkey", "r_name")
    return positional_join(
        n, r, left_order=["n_nationkey"], right_order=["r_regionkey"]
    ).select("n_nationkey", "n_name", "r_regionkey", "r_name")


@query(
    "salted_agg_skew",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           {o_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def salted_agg_skew_q(spark, sf):
    """Two-phase SALTED aggregation over a genuinely skewed key —
    (l_returnflag, l_linestatus) has ~4 groups, so a plain shuffle lands
    the whole table on 4 reducers; salting spreads each hot group over 16
    (operators/skew.py::salted_agg). The graded contract is
    salt-INVARIANCE: decimal partials re-combine exactly, so the result
    equals the plain GROUP BY the oracle runs, bit-for-bit, for any salt
    assignment."""
    from squirreling_spark.operators.skew import salted_agg
    from squirreling_spark.qutil import dcol, spread

    li = spread(t(spark, sf, "lineitem"))
    return salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        aggs=[
            F.count(F.lit(1)).alias("__pn"),
            F.sum(dcol("l_quantity")).alias("__pq"),
        ],
        final_aggs=[
            F.sum("__pn").cast("bigint").alias("n_rows"),
            F.sum("__pq").cast("double").alias("sum_qty"),
        ],
    )


@query(
    "salted_join_brand",
    oracle=f"""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           {o_dsum('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def salted_join_brand_q(spark, sf):
    """SALTED fact-dim join (operators/skew.py::salted_join): the fact
    side is salted, the dimension replicated once per salt, and the join
    key becomes (key, salt) — the broadcast-incompatible-dimension skew
    mitigation. Salt-invariance is the graded contract: the per-brand
    rollup must equal the oracle's plain join exactly."""
    from squirreling_spark.operators.skew import salted_join
    from squirreling_spark.qutil import dcol, spread

    li = spread(t(spark, sf, "lineitem")).select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    p = t(spark, sf, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, p, ["p_partkey"], salt_buckets=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(dcol("l_quantity")).cast("double").alias("sum_qty"),
    )
