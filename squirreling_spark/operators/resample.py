"""Time-series RESAMPLING: per-key gap filling onto a fixed grid with
last-observation-carried-forward (LOCF) — the standard warehouse
transform for turning an irregular event stream into a dense,
join-ready time series (dashboards, feature stores, training windows).

Spark-first shape: the hour grid is one ``sequence(hmin, hmax,
interval)`` explode per key (bounded by the key's own time span — at
100 TB bound it with a retention window, never the corpus age); the
observed-hour aggregate is map-side combined; the fill is a LEFT join
of grid onto observations, and LOCF is one ``last_value(..,
ignorenulls)`` running window per key ordered by grid hour. Exactly
one shuffle on the key; every window input is (key × grid-span)
bounded.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from squirreling_spark.qutil import dsum


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    ord_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-``key_col`` hourly grid from the key's first to last event
    hour; observed hours carry (n_events, decimal-exact total_value and
    the LAST observation's value by (ts, ord) — deterministic
    tie-break); missing hours fill with n_events=0, total 0, and the
    carried-forward last value. Output: (key, hour, n_events,
    total_value, locf_value, filled)."""
    hour = F.date_trunc("hour", F.col(ts_col))
    w_last = Window.partitionBy(key_col, "hour").orderBy(
        F.col(ts_col).desc(), F.col(ord_col).desc()
    )
    obs = (
        df.select(
            key_col, hour.alias("hour"), ts_col, val_col, ord_col
        )
        .withColumn("__rn", F.row_number().over(w_last))
        .groupBy(key_col, "hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(val_col, "total_value"),
            F.max(
                F.when(F.col("__rn") == 1, F.col(val_col))
            ).alias("__last_val"),
        )
    )
    grid = (
        df.groupBy(key_col)
        .agg(
            F.date_trunc("hour", F.min(ts_col)).alias("__h0"),
            F.date_trunc("hour", F.max(ts_col)).alias("__h1"),
        )
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(__h0, __h1, interval {step})")
            ).alias("hour"),
        )
    )
    w_locf = Window.partitionBy(key_col).orderBy("hour").rowsBetween(
        Window.unboundedPreceding, 0
    )
    joined = grid.join(obs, [key_col, "hour"], "left")
    return joined.select(
        key_col,
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        F.last("__last_val", ignorenulls=True)
        .over(w_locf)
        .alias("locf_value"),
        F.col("n_events").isNull().alias("filled"),
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo_p: float = 0.01,
    hi_p: float = 0.99,
) -> DataFrame:
    """Per-key percentile WINSORIZATION — the outlier-capping transform
    every metrics/feature pipeline runs before aggregation (tail events
    and sensor glitches otherwise dominate sums): values clamp to the
    key's [p01, p99] band. Cutoffs are exact interpolated percentiles
    det-rounded to 1e-9 (Spark's percentile ≡ DuckDB's quantile_cont;
    the rounding kills the one-ulp tie divergence — same contract as
    lm_bucket_sample), so the capped values and counts are
    bit-identical cross-engine.

    One map-combined percentile aggregate per key (keys ≪ rows; at
    100 TB pre-sample per key like lm_bucket_sample's
    cutoff_sample_ppm) broadcast back over one row-local pass.

    Output per key: (key, n, n_capped_lo, n_capped_hi, lo, hi,
    total_capped — decimal-exact sum of the clamped values)."""
    from squirreling_spark.qutil import det_round

    cuts = df.groupBy(key_col).agg(
        F.percentile(F.col(val_col), F.lit(lo_p)).alias("__lo"),
        F.percentile(F.col(val_col), F.lit(hi_p)).alias("__hi"),
    )
    j = df.join(F.broadcast(cuts), key_col)
    lo = det_round(F.col("__lo"), 9)
    hi = det_round(F.col("__hi"), 9)
    v = F.col(val_col)
    capped = F.greatest(lo, F.least(hi, v))
    return (
        j.select(
            key_col,
            v.alias("__v"),
            lo.alias("__l"),
            hi.alias("__h"),
            capped.alias("__c"),
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("__v") < F.col("__l")).cast("int"))
            .cast("bigint")
            .alias("n_capped_lo"),
            F.sum((F.col("__v") > F.col("__h")).cast("int"))
            .cast("bigint")
            .alias("n_capped_hi"),
            F.min("__l").alias("lo"),
            F.min("__h").alias("hi"),
            dsum("__c", "total_capped"),
        )
    )


def mad_anomalies(
    df: DataFrame,
    key_col: str,
    val_col: str,
    ord_col: str,
    k: int = 5,
) -> DataFrame:
    """Robust per-key anomaly detection — median / median-absolute-
    deviation flagging (the metrics-monitoring standard: unlike
    z-scores, the outliers themselves can't inflate the threshold that
    should catch them): a value is anomalous iff ``|v − median| >
    k·MAD``.

    Exactness: both medians use the pinned exact-percentile contract
    (Spark percentile ≡ DuckDB quantile_cont, det-rounded to 1e-9);
    ``k`` is an integer so the threshold is one exact multiply —
    every flag decision is bit-identical cross-engine. Two
    percentile aggregates per key (second over the first's broadcast
    residuals), then one row-local flag pass; the flagged-id sum
    value-checks WHICH rows were flagged, not just how many.

    Output: (key, n, med, mad, n_anomalies, anom_ord_sum)."""
    from squirreling_spark.qutil import det_round

    med = df.groupBy(key_col).agg(
        det_round(F.percentile(F.col(val_col), F.lit(0.5)), 9).alias(
            "med"
        )
    )
    j = df.join(F.broadcast(med), key_col).withColumn(
        "__dev", F.abs(F.col(val_col) - F.col("med"))
    )
    mad = j.groupBy(key_col).agg(
        det_round(F.percentile(F.col("__dev"), F.lit(0.5)), 9).alias(
            "mad"
        )
    )
    flagged = j.join(F.broadcast(mad), key_col).withColumn(
        "__anom", F.col("__dev") > F.lit(float(k)) * F.col("mad")
    )
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.sum(F.col("__anom").cast("int")).cast("bigint").alias(
            "n_anomalies"
        ),
        F.sum(F.when(F.col("__anom"), F.col(ord_col)).otherwise(0))
        .cast("bigint")
        .alias("anom_ord_sum"),
    )


def throttle(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak: str,
    min_gap_us: int,
) -> DataFrame:
    """Debounce/throttle filter over an event log: per key, flag each
    event as kept (1) iff it is the key's first event or arrives at
    least ``min_gap_us`` after the IMMEDIATELY PRECEDING event — the
    standard log-dedup / rate-limit transform (double-click suppression,
    retry collapse, sensor chatter).

    Contract: the gap is measured from the previous event kept-or-not
    (the one-window form). The "gap from the last KEPT event" variant is
    inherently iterative per key (each keep decision feeds the next) and
    belongs to applyInPandasWithState streaming, not a batch window.

    Scale shape: ONE window shuffle partitioned by the key columns —
    never a global order; gap arithmetic is integer microseconds, exact
    in any engine. Output: input columns' keys + (ord value, ts_us,
    gap_us, kept) with gap_us NULL on each key's first event.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    return df.select(
        *key_cols,
        F.col(tiebreak),
        us.cast("bigint").alias("ts_us"),
        gap.cast("bigint").alias("gap_us"),
        F.when(gap.isNull() | (gap >= min_gap_us), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("kept"),
    )
