"""Pareto / ABC analysis — globally-ordered cumulative share without a
global window.

"Which customers cover 80% of revenue" needs a cumulative sum in global
rank order. The naive ``sum() OVER (ORDER BY rev DESC)`` is a
single-task WindowExec at scale; this operator reuses the two-level
numbering shape of operators/positional_join.py: range-repartition on
the sort key (parallel range exchange, deterministic boundaries),
per-partition SUM totals (one row per partition) cumulative-summed into
broadcast offsets, then a within-partition running sum — every stage
parallel, the only unpartitioned step is one row per partition.

All arithmetic is integer (caller supplies an integer value column,
e.g. det-rounded cents); the share computation multiplies in
decimal(38) so ppm numerators can't overflow bigint at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MONO = "__sq_abc_mono"
_PID = "__sq_abc_pid"
_OFF = "__sq_abc_off"


def ordered_cumsum(
    df: DataFrame, order: list, val_col: str, out_col: str = "cum"
) -> DataFrame:
    """Running SUM of ``val_col`` (integer) in the global order given by
    ``order`` (list of Columns, may be desc()) — two-level, no global
    data window.

    REQUIREMENTS: ``order`` must be a TOTAL order over the rows — with
    ties, the within-partition running sum assigns tied rows arbitrary
    relative cum values (append a unique key column to break ties, as
    pareto_abc does). The plan also relies on deterministic
    re-evaluation: the monotonically_increasing_id partition tag is
    computed on a range-repartitioned sort, and the tagged subtree is
    referenced twice (per-partition totals + final join), so the input
    must evaluate identically across the two traversals — true for
    deterministic file scans, NOT for sampled/shuffled nondeterministic
    inputs (same assumption as operators/positional_join.py)."""
    n = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    part = df.repartitionByRange(n, *order).sortWithinPartitions(*order)
    tagged = part.withColumn(_MONO, F.monotonically_increasing_id())
    tagged = tagged.withColumn(
        _PID, F.shiftright(F.col(_MONO), 33)
    ).drop(_MONO)
    sums = tagged.groupBy(_PID).agg(
        F.sum(val_col).cast("bigint").alias("__s")
    )
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        _PID,
        F.coalesce(F.sum("__s").over(off_w), F.lit(0))
        .cast("bigint")
        .alias(_OFF),
    )
    within = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.join(F.broadcast(offsets), _PID)
        .withColumn(
            out_col,
            (F.col(_OFF) + F.sum(val_col).over(within)).cast("bigint"),
        )
        .drop(_PID, _OFF)
    )


def pareto_abc(
    df: DataFrame,
    key_col: str,
    val_col: str,
    a_ppm: int = 800_000,
    b_ppm: int = 950_000,
) -> DataFrame:
    """(key, value, cum, cum_ppm, abc_class): each key's cumulative share
    of the total in descending-value order (ties broken by key), classed
    A (first ``a_ppm``/1e6 of the total), B (to ``b_ppm``), else C —
    the classic Pareto / ABC inventory segmentation."""
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(val_col).cast("bigint").alias("value"),
    )
    order = [F.col("value").desc(), F.col("key")]
    cum = ordered_cumsum(base, order, "value", "cum")
    grand = base.agg(F.sum("value").cast("bigint").alias("__g"))
    j = cum.crossJoin(F.broadcast(grand))
    ppm = F.expr(
        "CAST((CAST(cum AS DECIMAL(28,0)) * 1000000) div __g AS BIGINT)"
    )
    return j.select(
        "key",
        "value",
        "cum",
        ppm.alias("cum_ppm"),
        F.when(ppm <= a_ppm, "A")
        .when(ppm <= b_ppm, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
