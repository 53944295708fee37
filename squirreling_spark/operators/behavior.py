"""Behavioral analytics: user-journey transition matrices and RFM
segmentation — the two product/marketing-analytics staples next to
funnels and cohorts (operators/funnel.py).

Both are engine-exact: transition probabilities are ppm integer
division; RFM cutoffs use the repo's pinned exact-percentile contract
(Spark ``percentile`` ≡ DuckDB ``quantile_cont``, det-rounded to 1e-9 —
the same contract as winsorize / lm_bucket_sample), then bucket
membership is a plain comparison. No global ntile: rank-based quintiles
need a full sort of the user table, which is a single-task window at
100 TB; threshold-based quantile buckets broadcast three cutoffs and
stay row-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from squirreling_spark.qutil import det_round, dsum


def transition_matrix(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    ord_col: str,
) -> DataFrame:
    """(from_state, to_state, n, p_ppm): first-order Markov transition
    counts over each key's (ts, ord)-ordered state sequence, with row
    probabilities in exact ppm (1e6 * n div row total). One key-
    partitioned window (lag) + one map-combined count; the per-from
    normalizer is a tiny window over |states|² rows."""
    w = W.partitionBy(key_col).orderBy(ts_col, ord_col)
    steps = df.select(
        F.lag(F.col(state_col)).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).where(F.col("from_state").isNotNull())
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return counts.select(
        "from_state",
        "to_state",
        "n",
        F.expr(
            "CAST((1000000 * n) div sum(n)"
            " OVER (PARTITION BY from_state) AS BIGINT)"
        ).alias("p_ppm"),
    )


def rfm_segments(
    df: DataFrame,
    key_col: str,
    recency_col: str,
    val_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """(key, recency, f, m, r_seg, f_seg, m_seg, rfm_code): per-key
    Recency (max of ``recency_col`` — the caller supplies a numeric
    recency basis, e.g. seconds since a fixed origin, so quantile
    interpolation stays in exactly-representable double range) /
    Frequency (count) / Monetary (decimal-exact value sum), each
    bucketed 1..len(quantiles)+1 by exact det-rounded quantile cutoffs
    over the PER-KEY table (higher bucket = better: more recent, more
    frequent, higher spend). rfm_code = 100*r + 10*f + m."""
    per_key = df.groupBy(key_col).agg(
        F.max(F.col(recency_col)).cast("bigint").alias("recency"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        dsum(val_col, "m"),
    )
    cuts = per_key.agg(
        *[
            det_round(
                F.percentile(F.col(c).cast("double"), F.lit(q)), 9
            ).alias(f"__{c}_{i}")
            for c in ("recency", "f", "m")
            for i, q in enumerate(quantiles)
        ]
    )
    j = per_key.crossJoin(F.broadcast(cuts))

    def seg(c: str):
        e = F.lit(1)
        for i in range(len(quantiles)):
            e = e + (F.col(c).cast("double") > F.col(f"__{c}_{i}")).cast(
                "int"
            )
        return e.cast("bigint")

    return j.select(
        key_col,
        "recency",
        "f",
        "m",
        seg("recency").alias("r_seg"),
        seg("f").alias("f_seg"),
        seg("m").alias("m_seg"),
        (seg("recency") * 100 + seg("f") * 10 + seg("m")).alias(
            "rfm_code"
        ),
    )
