"""Scalar function packs + subqueries + CTEs (SURVEY.md §2.3-2.5).

Each pack evaluates the reference's function inventory (signatures at
reference src/validation/functions.js:115-251) over a real column so the
oracle exercises value semantics, not just arity. Everything here is
JVM-side built-ins — zero Python UDFs — so the whole SELECT stays inside
WholeStageCodegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.qutil import dsum, o_dsum, register_views, t


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up, lower(c_mktsegment) AS lo,
           c_name || '#' || c_mktsegment AS cat,
           concat(c_name, '-', c_mktsegment) AS cat2,
           length(c_name) AS len,
           octet_length(encode(c_name)) AS olen,
           substring(c_name, 3, 5) AS sub,
           trim('  ' || c_name || ' ') AS trimmed,
           replace(c_name, '0', '_') AS repl,
           left(c_name, 4) AS l4, right(c_name, 3) AS r3,
           instr(c_name, '1') AS pos1,
           split_part(c_name, '0', 1) AS sp1,
           split_part(c_name, '0', -1) AS sp_last
    FROM customer
    """,
)
def string_funcs(spark, sf):
    """String pack (reference src/expression/strings.js:19-180): UPPER LOWER
    CONCAT/|| LENGTH OCTET_LENGTH SUBSTRING TRIM REPLACE LEFT RIGHT
    INSTR/POSITION SPLIT_PART."""
    c = t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.concat("c_name", F.lit("#"), "c_mktsegment").alias("cat"),
        F.concat("c_name", F.lit("-"), "c_mktsegment").alias("cat2"),
        F.length("c_name").alias("len"),
        F.octet_length("c_name").alias("olen"),
        F.substring("c_name", 3, 5).alias("sub"),
        F.trim(F.concat(F.lit("  "), "c_name", F.lit(" "))).alias("trimmed"),
        F.replace("c_name", F.lit("0"), F.lit("_")).alias("repl"),
        F.left("c_name", F.lit(4)).alias("l4"),
        F.right("c_name", F.lit(3)).alias("r3"),
        F.instr("c_name", "1").alias("pos1"),
        F.split_part("c_name", F.lit("0"), F.lit(1)).alias("sp1"),
        F.split_part("c_name", F.lit("0"), F.lit(-1)).alias("sp_last"),
    )


@query(
    "regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_name, 'g.*d') AS has_gd,
           regexp_extract_all(p_name, '([a-z]+)', 1)[2] AS second_match,
           regexp_extract_all(p_name, '([a-z]+)', 1)[-1] AS last_match,
           len(regexp_extract_all(p_name, '([a-z]+)', 1)) AS n_matches
    FROM part
    """,
)
def regex_funcs(spark, sf):
    """Regex pack (reference src/expression/regexp.js:17-170):
    REGEXP_EXTRACT (group), REGEXP_REPLACE (all-occurrences),
    REGEXP_MATCHES, plus REGEXP_SUBSTR occurrence semantics (positive /
    negative occurrence index, match count) via regexp_extract_all.
    Patterns restricted to the RE2 ∩ Java-regex common dialect."""
    p = t(spark, sf, "part")
    all_m = F.regexp_extract_all("p_name", F.lit("([a-z]+)"), 1)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike("g.*d").alias("has_gd"),
        F.element_at(all_m, 2).alias("second_match"),
        F.element_at(all_m, -1).alias("last_match"),
        F.size(all_m).alias("n_matches"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           round(l_extendedprice, 1) AS rnd,
           abs(l_extendedprice - 30000) AS ab,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS sg,
           mod(CAST(l_quantity AS BIGINT), 7) AS md,
           round(exp(l_discount), 9) AS ex,
           round(ln(l_extendedprice), 9) AS lnx,
           round(log10(l_extendedprice), 9) AS lg,
           round(pow(l_quantity, 1.5), 7) AS pw,
           round(sqrt(l_extendedprice), 8) AS sq,
           round(sin(l_discount), 12) AS sn,
           round(cos(l_discount), 12) AS cs,
           round(cot(l_discount + 1), 12) AS ct,
           round(atan2(l_discount, l_tax), 12) AS at2,
           round(degrees(l_discount), 9) AS dg,
           round(radians(l_quantity), 9) AS rd,
           round(pi(), 12) AS pi_val
    FROM lineitem
    """,
)
def math_funcs(spark, sf):
    """Math pack (reference src/expression/math.js:13-127). Transcendentals
    rounded (libm results can differ in the last ulp across engines);
    exact-integer functions left unrounded."""
    li = t(spark, sf, "lineitem")
    ep = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(ep).alias("fl"),
        F.ceil(ep).alias("ce"),
        F.round(ep, 1).alias("rnd"),
        F.abs(ep - 30000).alias("ab"),
        F.signum(ep - 30000).alias("sg"),
        (F.col("l_quantity").cast("bigint") % 7).alias("md"),
        F.round(F.exp("l_discount"), 9).alias("ex"),
        F.round(F.log("l_extendedprice"), 9).alias("lnx"),
        F.round(F.log10("l_extendedprice"), 9).alias("lg"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 7).alias("pw"),
        F.round(F.sqrt("l_extendedprice"), 8).alias("sq"),
        F.round(F.sin("l_discount"), 12).alias("sn"),
        F.round(F.cos("l_discount"), 12).alias("cs"),
        F.round(F.cot(F.col("l_discount") + 1), 12).alias("ct"),
        F.round(F.atan2("l_discount", "l_tax"), 12).alias("at2"),
        F.round(F.degrees("l_discount"), 9).alias("dg"),
        F.round(F.radians("l_quantity"), 9).alias("rd"),
        F.round(F.lit(3.141592653589793), 12).alias("pi_val"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day_start,
           extract(year FROM o_orderdate) AS yr,
           extract(month FROM o_orderdate) AS mo,
           extract(day FROM o_orderdate) AS dy,
           extract(dow FROM o_orderdate) AS dow,
           CAST(epoch(o_orderdate) AS BIGINT) AS ep,
           date_diff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS days_to_98,
           (1998 - extract(year FROM o_orderdate)) * 12
             + (1 - extract(month FROM o_orderdate)) AS months_to_98,
           o_orderdate + INTERVAL 3 MONTH AS plus_3m,
           o_orderdate - INTERVAL 90 DAY AS minus_90d
    FROM orders
    """,
)
def date_funcs(spark, sf):
    """Date pack (reference src/expression/date.js): DATE_TRUNC, EXTRACT
    (incl. DOW — DuckDB Sunday=0 vs Spark dayofweek Sunday=1, shimmed),
    EPOCH, DATE_DIFF (day boundary count / month boundary count,
    reference :110-127), ± INTERVAL arithmetic."""
    o = t(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.date_trunc("day", d).alias("day_start"),
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dy"),
        (F.dayofweek(d) - 1).cast("bigint").alias("dow"),
        F.unix_timestamp(d.cast("timestamp")).alias("ep"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_98"),
        ((F.lit(1998) - F.year(d)) * 12 + (F.lit(1) - F.month(d)))
        .cast("bigint")
        .alias("months_to_98"),
        (d + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        (d - F.expr("INTERVAL 90 DAY")).alias("minus_90d"),
    )


@query(
    "conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_word,
           CASE WHEN o_totalprice > 250000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           coalesce(nullif(o_orderstatus, 'P'), 'was_p') AS coal,
           greatest(o_totalprice, 150000.0) AS gr,
           least(o_totalprice, 150000.0) AS le,
           nullif(o_orderstatus, o_orderstatus) AS always_null
    FROM orders
    """,
)
def conditional_case(spark, sf):
    """CASE simple+searched, COALESCE, NULLIF, GREATEST/LEAST (reference
    src/expression/evaluate.js:418-446,778-796; both engines skip NULLs in
    GREATEST/LEAST)."""
    o = t(spark, sf, "orders")
    tp = F.col("o_totalprice")
    st = F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(st == "F", "finished")
        .when(st == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
        F.when(tp > 250000, "big")
        .when(tp > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(st, F.lit("P")), F.lit("was_p")).alias("coal"),
        F.greatest(tp, F.lit(150000.0)).alias("gr"),
        F.least(tp, F.lit(150000.0)).alias("le"),
        F.nullif(st, st).alias("always_null"),
    )


@query(
    "cast_funcs",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(substring(c_name, 10, 6) AS INTEGER) AS name_digits,
           TRY_CAST(c_mktsegment AS INTEGER) AS bad_int,
           CAST(floor(c_acctbal) AS INTEGER) AS bal_int,
           CAST(c_custkey AS VARCHAR) AS key_str,
           CAST(c_acctbal > 0 AS VARCHAR) AS pos_str,
           TRY_CAST('2024-06-01 12:00:00' AS TIMESTAMP) AS ts_lit
    FROM customer
    """,
)
def cast_funcs(spark, sf):
    """CAST semantics (reference src/expression/evaluate.js:699-738: failed
    numeric cast → NULL). Uses try_cast so behavior is identical whether the
    host session runs ANSI on or off."""
    c = t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.substring("c_name", 10, 6).try_cast("int").alias("name_digits"),
        F.col("c_mktsegment").try_cast("int").alias("bad_int"),
        # double→int CAST rounds half-to-even in DuckDB but truncates in
        # Spark — floor first so both engines agree.
        F.floor("c_acctbal").cast("int").alias("bal_int"),
        F.col("c_custkey").cast("string").alias("key_str"),
        (F.col("c_acctbal") > 0).cast("string").alias("pos_str"),
        F.lit("2024-06-01 12:00:00").try_cast("timestamp_ntz").alias("ts_lit"),
    )


@query(
    "median_percentile",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q75,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS med_price,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS approx_q90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def median_percentile(spark, sf):
    """MEDIAN / PERCENTILE_CONT WITHIN GROUP / APPROX_QUANTILE (reference
    implements all three as exact sort + linear interpolation,
    src/expression/evaluate.js:314-350 — APPROX_QUANTILE keeps that exact
    semantics here; Spark's genuinely-approximate approx_percentile is
    available when sketch-grade speed matters at scale)."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)").alias("q25"),
        F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)").alias("q75"),
        F.expr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("med_price"),
        F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)").alias(
            "approx_q90"
        ),
    )


@query(
    "stddev_var",
    oracle=f"""
    SELECT l_returnflag,
           round(sqrt(greatest(
             ({o_dsum('l_quantity * l_quantity')}
              - {o_dsum('l_quantity')} * {o_dsum('l_quantity')} / count(l_quantity))
             / (count(l_quantity) - 1), 0)), 6) AS sd_samp,
           round(sqrt(greatest(
             ({o_dsum('l_quantity * l_quantity')}
              - {o_dsum('l_quantity')} * {o_dsum('l_quantity')} / count(l_quantity))
             / count(l_quantity), 0)), 6) AS sd_pop
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stddev_var(spark, sf):
    """STDDEV_SAMP / STDDEV_POP (reference src/expression/evaluate.js:292-312).
    Computed from exact decimal Σx and Σx² so the value is independent of
    partition order (native stddev is a running-moment algorithm whose last
    ulp depends on input order — unacceptable for a distributed engine's
    reproducibility gate)."""
    li = t(spark, sf, "lineitem")
    q = F.col("l_quantity")
    sum_x = F.sum(q.cast("decimal(27,6)")).cast("double")
    sum_x2 = F.sum((q * q).cast("decimal(27,6)")).cast("double")
    n = F.count(q)
    var_samp = (sum_x2 - sum_x * sum_x / n) / (n - 1)
    var_pop = (sum_x2 - sum_x * sum_x / n) / n
    return li.groupBy("l_returnflag").agg(
        F.round(F.sqrt(F.greatest(var_samp, F.lit(0.0))), 6).alias("sd_samp"),
        F.round(F.sqrt(F.greatest(var_pop, F.lit(0.0))), 6).alias("sd_pop"),
    )


@query(
    "string_agg_array_agg",
    oracle="""
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS all_suppliers,
           array_to_string(list_sort(list(s_name)), '/') AS supplier_list,
           string_agg(DISTINCT s_name, '|' ORDER BY s_name) AS distinct_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def string_agg_array_agg(spark, sf):
    """STRING_AGG / ARRAY_AGG (+DISTINCT) (reference
    src/expression/evaluate.js:352-394). Collected lists are sorted so the
    result is a deterministic value under any partitioning."""
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "all_suppliers"
            ),
            F.array_join(F.array_sort(F.collect_list("s_name")), "/").alias(
                "supplier_list"
            ),
            F.array_join(F.array_sort(F.collect_set("s_name")), "|").alias(
                "distinct_suppliers"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Subqueries & CTEs (reference §2.5; Catalyst decorrelates what the
# reference re-executes per row — src/execute/execute.js:67-78)
# ---------------------------------------------------------------------------


@query(
    "in_subquery",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    """,
)
def in_subquery(spark, sf):
    register_views(spark, sf, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
        """
    )


@query(
    "not_in_subquery",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def not_in_subquery(spark, sf):
    register_views(spark, sf, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        """
    )


@query(
    "scalar_subquery",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT {o_dsum('o_totalprice')} / count(*) * 2 FROM orders)
    """,
)
def scalar_subquery(spark, sf):
    """Uncorrelated scalar subquery in WHERE (reference
    src/expression/evaluate.js:151-161)."""
    register_views(spark, sf, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (
          SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                 / count(*) * 2
          FROM orders)
        """
    )


@query(
    "correlated_scalar",
    oracle=f"""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
      SELECT {o_dsum('o2.o_totalprice')} / count(*) * 1.5
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_scalar(spark, sf):
    """Correlated scalar subquery — the reference re-plans and re-executes it
    per outer row (src/execute/execute.js:67-78); Catalyst decorrelates to a
    single aggregate + join, which is the only viable strategy at scale."""
    register_views(spark, sf, ("orders",))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (
          SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                 / count(*) * 1.5
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "correlated_exists_agg",
    oracle="""
    SELECT n_name, count(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY n_name
    """,
)
def correlated_exists_agg(spark, sf):
    register_views(spark, sf, ("customer", "nation", "orders"))
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        GROUP BY n_name
        """
    )


@query(
    "cte_chain",
    oracle=f"""
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_totalprice > 150000
    ),
    cust_stats AS (
      SELECT o_custkey, count(*) AS n_big, {o_dsum('o_totalprice')} AS total_big
      FROM big_orders GROUP BY o_custkey
    )
    SELECT c.c_name, s.n_big, s.total_big
    FROM cust_stats s JOIN customer c ON s.o_custkey = c.c_custkey
    WHERE s.n_big >= 2
    """,
)
def cte_chain(spark, sf):
    """Chained CTEs — each sees the previous (reference src/plan/plan.js:40-50)."""
    register_views(spark, sf, ("orders", "customer"))
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders WHERE o_totalprice > 150000
        ),
        cust_stats AS (
          SELECT o_custkey, count(*) AS n_big,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_big
          FROM big_orders GROUP BY o_custkey
        )
        SELECT c.c_name, s.n_big, s.total_big
        FROM cust_stats s JOIN customer c ON s.o_custkey = c.c_custkey
        WHERE s.n_big >= 2
        """
    )


@query(
    "cte_shared",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment
    )
    SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b, a.n AS n_a, b.n AS n_b
    FROM seg a JOIN seg b ON a.n < b.n
    """,
)
def cte_shared(spark, sf):
    """One CTE referenced twice (reference re-executes per reference —
    src/plan/plan.js:40-49; Spark reuses the exchange or inlines, both fine)."""
    register_views(spark, sf, ("customer",))
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment
        )
        SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
               a.n AS n_a, b.n AS n_b
        FROM seg a JOIN seg b ON a.n < b.n
        """
    )
