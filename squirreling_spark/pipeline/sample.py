"""Systematic weighted sampling — integer-exact, order-stable.

Dataset-mixing pipelines need "sample documents proportional to weight
(tokens/chars) with a deterministic, resumable selection". Random
weighted sampling (A-ES exponential keys) needs transcendental math that
is not bit-stable across engines; systematic sampling gives the same
proportionality guarantee with pure integer arithmetic: lay the corpus
on a line in a canonical order (by id), each document occupying a
segment of length = its weight, and pick every point at multiples of
``step``. A document is selected once per multiple of ``step`` inside
its segment — exactly proportional, zero variance in total picks
(classic PPS-systematic sampling).

Scale design: the only global quantity is the prefix sum of weights,
computed with the same two-level scheme as ``pipeline/pack.py`` — a
map-combined per-bucket sum, ONE tiny window over the bucket table
(rows = corpus/bucket_size), then within-bucket windows partitioned by
bucket. No single-task stage at any scale; everything is bigint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def systematic_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    step: int,
    bucket_size: int = 4096,
) -> DataFrame:
    """(id, weight, cum_weight, picks) for every row the systematic
    PPS sample selects at least once: ``picks`` = number of multiples of
    ``step`` in the row's half-open weight segment
    ``(cum_weight - weight, cum_weight]`` = floor(cum/step) -
    floor((cum-weight)/step). Rows with picks = 0 are dropped; expected
    output size = total_weight / step rows."""
    base = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(weight_col).cast("bigint").alias("weight"),
    ).withColumn("_bkt", F.expr(f"id div {int(bucket_size)}"))
    bkt_sums = base.groupBy("_bkt").agg(
        F.sum("weight").cast("bigint").alias("_bsum")
    )
    bkt_off = bkt_sums.withColumn(
        "_boff",
        F.coalesce(
            F.sum("_bsum").over(
                W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint"),
    ).select(F.col("_bkt").alias("_obkt"), "_boff")
    within = W.partitionBy("_bkt").orderBy("id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = (
        base.join(
            F.broadcast(bkt_off), F.col("_bkt") == F.col("_obkt")
        )
        .withColumn(
            "cum_weight",
            (F.col("_boff") + F.sum("weight").over(within)).cast("bigint"),
        )
        .select("id", "weight", "cum_weight")
    )
    s = int(step)
    picks = (
        F.expr(f"cum_weight div {s}")
        - F.expr(f"(cum_weight - weight) div {s}")
    ).cast("bigint")
    return cum.withColumn("picks", picks).where(F.col("picks") > 0)
