"""POSITIONAL JOIN — zip two DataFrames row-by-row, null-padding the shorter.

Reference semantics: hyparam/squirreling src/execute/join.js:176-215 (DuckDB
style). Spark has no native positional join; DataFrames are unordered sets,
so a deterministic positional join needs an explicit order.

Implementation — two-level numbering, NO global window (a row_number over
``Window.orderBy`` with no partitionBy plans as a single-task WindowExec:
every row funnels through one partition, which is a scale-killer):

1. Ordered case: ``repartitionByRange`` on the sort keys (a parallel range
   exchange; Spark's range sampler is seeded deterministically per
   partition, so re-evaluation yields identical boundaries) +
   ``sortWithinPartitions``.
2. ``monotonically_increasing_id`` tags every row with
   (partition_id << 33 | local_index) in physical order — no shuffle.
3. Per-partition counts (a tiny map-side-combined aggregate, one row per
   partition) are cumulative-summed into offsets and broadcast-joined back
   on partition id — no shuffle of the data side.
4. global_rn = offset[pid] + local_index + 1.

The numbering subtree is referenced twice (data + counts); both resolve to
the same deterministic scan/exchange, and Spark's ReuseExchange typically
dedupes the exchange. Every stage is parallel; the only single-task step is
the offsets cumsum over ONE ROW PER PARTITION (thousands of rows at 100 TB,
not data rows). The final join on ``rn`` is an equi-join Spark executes as
a shuffled sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__sq_pos_rn"
_MONO = "__sq_mono"
_PID = "__sq_pid"
_OFF = "__sq_off"


def _with_rn(df: DataFrame, order: list[str] | None) -> DataFrame:
    """Attach a 1-based global position column ``_RN`` without a global
    window. Ordered: positions follow the sort keys. Unordered: positions
    follow the current physical order (meaningful for freshly-read sorted
    sources, same caveat as DuckDB's POSITIONAL JOIN)."""
    if order:
        n = max(df.sparkSession.sparkContext.defaultParallelism, 2)
        df = df.repartitionByRange(n, *[F.col(c) for c in order])
        df = df.sortWithinPartitions(*[F.col(c) for c in order])
    tagged = df.withColumn(_MONO, F.monotonically_increasing_id())
    # monotonically_increasing_id packs (partition_id << 33) | local_index.
    pid = F.shiftright(F.col(_MONO), 33)
    local = F.col(_MONO).bitwiseAND(F.lit((1 << 33) - 1))
    tagged = tagged.withColumn(_PID, pid)
    counts = tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias("__n"))
    # Offsets: cumsum over one row per partition — trivially small.
    off_w = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias(_OFF),
    )
    return (
        tagged.join(F.broadcast(offsets), _PID)
        .withColumn(_RN, (F.col(_OFF) + local + 1).cast("bigint"))
        .drop(_MONO, _PID, _OFF)
    )


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[str] | None = None,
    right_order: list[str] | None = None,
) -> DataFrame:
    """Zip ``left`` and ``right`` positionally; shorter side null-padded."""
    l_rn = _with_rn(left, left_order)
    r_rn = _with_rn(right, right_order)
    joined = l_rn.join(r_rn, l_rn[_RN] == r_rn[_RN], "full")
    return joined.drop(_RN)
