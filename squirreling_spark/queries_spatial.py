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
