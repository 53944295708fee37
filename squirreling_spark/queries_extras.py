"""Coverage extras: recursive CTEs (the reference's #1 rejected feature,
src/parse/parse.js:51-57 — native in Spark 4), the JSON function pack
(reference src/expression/evaluate.js:476-685), and regexp occurrence
semantics (reference src/expression/regexp.js:17-170).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from squirreling_spark.inventory import query
from squirreling_spark.qutil import register_views, t


@query(
    "cte_recursive",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT CAST(date_trunc('month', TIMESTAMP '1995-01-01 00:00:00') AS TIMESTAMP)
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '1995-12-01 00:00:00'
    )
    SELECT m.m AS month_start, count(o.o_orderkey) AS n_orders
    FROM months m
    LEFT JOIN orders o
      ON CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) = m.m
    GROUP BY m.m
    """,
)
def cte_recursive(spark, sf):
    """WITH RECURSIVE month series + left join of order counts — the
    reference rejects recursion outright; Spark 4 runs it natively."""
    register_views(spark, sf, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT CAST('1995-01-01 00:00:00' AS TIMESTAMP_NTZ)
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < CAST('1995-12-01 00:00:00' AS TIMESTAMP_NTZ)
        )
        SELECT m.m AS month_start, count(o.o_orderkey) AS n_orders
        FROM months m
        LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.m
        GROUP BY m.m
        """
    )


@query(
    "json_pack",
    oracle="""
    SELECT event_id,
           regexp_extract_all(props, '"([a-z]+)":', 1) AS keys,
           concat('{"k":', regexp_extract(props, '"k": ([0-9]+)', 1),
                  ',"evt":"', event_type, '"}') AS rebuilt,
           2 AS arr_len,
           regexp_matches(props, '^\\{.*\\}$') AS valid_obj
    FROM events
    """,
)
def json_pack(spark, sf):
    """JSON_OBJECT / JSON_KEYS / JSON_ARRAY_LENGTH / JSON_VALID (reference
    evaluate.js:476-685). Spark side runs the real JSON engine; oracle
    mirrors values through string ops (DuckDB json extension not assumed)."""
    ev = t(spark, sf, "events")
    k_val = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        F.json_object_keys("props").alias("keys"),
        F.to_json(
            F.named_struct(
                F.lit("k"), k_val, F.lit("evt"), F.col("event_type")
            )
        ).alias("rebuilt"),
        F.json_array_length(
            F.concat(F.lit("["), k_val, F.lit(","), k_val, F.lit("]"))
        ).alias("arr_len"),
        F.get_json_object("props", "$").isNotNull().alias("valid_obj"),
    )


@query(
    "regex_occurrence",
    oracle="""
    SELECT p_partkey,
           regexp_extract_all(p_name, '([a-z]+)', 1)[2] AS second_match,
           regexp_extract_all(p_name, '([a-z]+)', 1)[-1] AS last_match,
           len(regexp_extract_all(p_name, '([a-z]+)', 1)) AS n_matches
    FROM part
    """,
)
def regex_occurrence(spark, sf):
    """REGEXP_SUBSTR occurrence semantics (reference regexp.js:17-170 —
    position+occurrence args) via regexp_extract_all + element_at."""
    p = t(spark, sf, "part")
    all_m = F.regexp_extract_all("p_name", F.lit("([a-z]+)"), 1)
    return p.select(
        "p_partkey",
        F.element_at(all_m, 2).alias("second_match"),
        F.element_at(all_m, -1).alias("last_match"),
        F.size(all_m).alias("n_matches"),
    )
