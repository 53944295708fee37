"""Helpers shared by inventory queries.

Floating-point policy: the correctness gate hash-compares values against a
DuckDB oracle. Double summation order differs between engines (and between
Spark partition layouts), so every SUM/AVG over doubles goes through a
decimal cast — decimal aggregation is exact and order-independent, then the
final value is cast back to double. At 100 TB this is also the *right*
semantics: results don't drift with partition count.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from squirreling_spark.tables import load_table, register_views  # noqa: F401

DEC = "decimal(27,6)"


def dcol(c: str | Column) -> Column:
    """Cast a double column to exact decimal for order-independent math."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: str | Column, alias: str) -> Column:
    """Order-independent exact SUM over a double column, emitted as double."""
    return F.sum(dcol(c)).cast("double").alias(alias)


def davg(c: str | Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, double division."""
    col = F.col(c) if isinstance(c, str) else c
    return (
        F.sum(dcol(col)).cast("double")
        / F.count(F.when(col.isNotNull(), 1))
    ).alias(alias)


# DuckDB-side equivalents (kept adjacent so both dialects stay in sync).
def o_dsum(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    return (
        f"(CAST(sum(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"
        f" / count({expr}))"
    )


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events; its parquet ``ts`` is TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects, so read nanos as long and convert to
    microsecond timestamps (DuckDB truncates ns->us the same way)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return events_with_ts(spark, sf_dir)
    return load_table(spark, sf_dir, name)


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input has fewer
    partitions — used before compute-heavy stages (hashing, vector math).

    Parquet can't split below row-group granularity, so a small/single-row-
    group file scans as ~1 task; any CPU-bound stage pipelined on top of it
    serializes. Redistributing the (small) input rows first costs one cheap
    shuffle and unlocks full-cluster parallelism for the expensive stage —
    the standard shape whenever compute-per-row ≫ row size, at any scale."""
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
