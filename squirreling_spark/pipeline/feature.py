"""Feature standardization statistics over embedding columns.

Per-dimension mean/std is the preprocessing step before whitening,
z-score normalization, or PCA — and the diagnostic for dead/saturated
embedding dimensions. Values are det-rounded to µ-units (the repo's
floor(x*1e6 + 0.5) contract, identical in both engines) so every
sufficient statistic is an exact integer: Σx and Σx² are bigint sums,
mean/variance are one identical IEEE double sequence at the end, and
std is a single correctly-rounded sqrt — bit-identical cross-engine.

Scale shape: posexplode (row-local, fan-out = dim count) into ONE
map-combined groupBy(dim) — partial aggregation reduces each partition
to |dims| rows before the shuffle, so the exchange carries
O(partitions × dims), not O(rows × dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_dim_stats(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """(dim, n, sxq, sxxq, mean, std): per-dimension statistics of an
    array<float> column. sxq/sxxq are exact bigint sums of the µ-unit
    quantized values; mean/std are doubles derived from them by a fixed
    op sequence (identical in the DuckDB oracle).

    Overflow bounds: the variance path multiplies in decimal — n is cast
    decimal(14,0) and sxq decimal(20,0), so n·Σx² and (Σx)² stay inside
    decimal(38,0) up to ~1e14 values per dim / |Σx| ~ 1e19 µ-units
    (≈1e13 rows of unit-scale embeddings). The OUTPUT columns sxq/sxxq
    are bigint by contract, bounding them at ~9.2e18 µ(²)-units; past
    that DuckDB's HUGEINT→BIGINT cast errors loudly while Spark's
    non-ANSI cast (the repo default) yields NULL — a known cross-engine
    divergence at that extreme; enable spark.sql.ansi.enabled for a loud
    Spark-side failure instead."""
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "__x")
    ).select(
        "dim",
        F.expr(
            "CAST(floor(CAST(__x AS DOUBLE) * 1000000d + 0.5d) AS BIGINT)"
        ).alias("xq"),
    )
    agg = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xq").cast("bigint").alias("sxq"),
        F.sum(
            (F.col("xq") * F.col("xq")).cast("decimal(25,0)")
        ).alias("sxxq_d"),
    )
    mean = F.col("sxq").cast("double") / F.col("n") / F.lit(1000000.0)
    var = (
        (
            F.col("n").cast("decimal(14,0)") * F.col("sxxq_d")
            - F.col("sxq").cast("decimal(20,0)")
            * F.col("sxq").cast("decimal(20,0)")
        ).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
        / F.lit(1e12)
    )
    return agg.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n",
        "sxq",
        F.col("sxxq_d").cast("bigint").alias("sxxq"),
        mean.alias("mean"),
        F.sqrt(var).alias("std"),
    )
