"""Slowly-changing-dimension (SCD Type 2) interval builder.

Turns an append-only event/status stream into validity intervals: per
key, consecutive runs of an unchanged status value collapse to one row
with ``[valid_from, valid_to)`` bounds; the latest run per key is open
(``valid_to`` NULL, ``is_current`` = 1). This is the standard warehouse
"build the dimension history from the change log" operator (the
reference engine exposes the raw log + window functions; this packages
the canonical gaps-and-islands composition as one operator).

Scale design: every window is PARTITIONED by the entity key — no global
ordering, no single-task stage; per-key history fits a partition by
construction (a key's change log is tiny relative to the corpus). Two
window passes (change detection + run numbering) fuse into one shuffle
on ``key``; the run-level ``lead()`` reuses the same partitioning, so the
whole operator is ONE hash shuffle end-to-end at any scale. All interval
arithmetic is integer microseconds — bit-identical across engines and
partition layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def status_intervals(
    df: DataFrame,
    key: str,
    status_col: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """(key, run_id, status, valid_from_us, valid_to_us, is_current,
    n_events): SCD-2 validity intervals from an event log. ``tiebreak``
    breaks equal-timestamp ordering deterministically (an id column).

    ``valid_to_us`` is the next run's start (half-open interval), NULL on
    the current run; ``n_events`` counts the log rows collapsed into the
    run. ``status_col`` may be NULL: change detection is null-safe, so a
    run of NULL statuses is its own interval (``status`` NULL) rather
    than merging into its neighbors."""
    w = W.partitionBy(key).orderBy(ts_col, tiebreak)
    us = F.unix_micros(F.col(ts_col))
    # Null-safe change detection: "first row of the key" (lag of a
    # non-null sentinel is NULL) is tested separately from "status
    # changed" (null-safe inequality), so a NULL status forms its own
    # run instead of being absorbed into the preceding one and forcing
    # a spurious break on the next row.
    first_row = F.lag(F.lit(1)).over(w).isNull()
    changed = F.when(
        first_row
        | ~F.col(status_col).eqNullSafe(F.lag(F.col(status_col)).over(w)),
        1,
    ).otherwise(0)
    runs = (
        df.withColumn(
            "run_id",
            F.sum(changed)
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint"),
        )
        .groupBy(key, "run_id")
        .agg(
            F.min(F.col(status_col)).alias("status"),
            F.min(us).cast("bigint").alias("valid_from_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    wr = W.partitionBy(key).orderBy("run_id")
    valid_to = F.lead("valid_from_us").over(wr)
    return runs.select(
        key,
        "run_id",
        "status",
        "valid_from_us",
        valid_to.cast("bigint").alias("valid_to_us"),
        F.when(valid_to.isNull(), 1).otherwise(0).cast("bigint").alias(
            "is_current"
        ),
        "n_events",
    )
