"""One-off probe: how do Spark and DuckDB's values compare on this data?

Checks timestamp dtype handling, float sum determinism, and decimal casting
so the inventory queries can be written with confidence.
"""

import duckdb

from squirreling_spark.session import get_spark

SF = "/root/testdata/sf0.01"

spark = get_spark("probe", cpus=8)
li = spark.read.parquet(f"{SF}/lineitem.parquet")
li.printSchema()
ev = spark.read.parquet(f"{SF}/events.parquet")
ev.printSchema()

import pyspark.sql.functions as F

srow = li.select(
    F.sum("l_extendedprice").alias("s_double"),
    F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("s_dec"),
    F.min("l_shipdate").alias("min_ts"),
    F.avg("l_quantity").alias("avg_q"),
    F.stddev_samp("l_quantity").alias("sd_q"),
).collect()[0]

con = duckdb.connect()
drow = con.execute(
    f"""
    SELECT sum(l_extendedprice) s_double,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) s_dec,
           min(l_shipdate) min_ts,
           avg(l_quantity) avg_q,
           stddev_samp(l_quantity) sd_q
    FROM '{SF}/lineitem.parquet'
    """
).fetchone()

print("spark :", srow)
print("duckdb:", drow)
print("s_double equal:", srow["s_double"] == drow[0])
print("s_dec equal  :", srow["s_dec"] == drow[1])
print("min_ts:", repr(srow["min_ts"]), repr(drow[2]), srow["min_ts"] == drow[2])
print("avg_q equal  :", srow["avg_q"] == drow[3])
print("sd_q equal   :", srow["sd_q"] == drow[4])
