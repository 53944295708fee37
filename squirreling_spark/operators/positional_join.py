"""POSITIONAL JOIN — zip two DataFrames row-by-row, null-padding the shorter.

Reference semantics: hyparam/squirreling src/execute/join.js:176-215 (DuckDB
style). Spark has no native positional join; DataFrames are unordered sets,
so a deterministic positional join needs an explicit order.

Implementation: ``row_number()`` over the given sort keys on each side, then
a FULL OUTER join on the row number. When no order is given we fall back to
``zipWithIndex``-style partition-offset numbering via
``monotonically_increasing_id`` + a window, which preserves the *current*
physical order (only meaningful for freshly-read sorted sources).

Scale: the window with a global ORDER BY is a single-range shuffle (Spark
range-partitions the sort), then the join on ``rn`` is a co-partitioned
sort-merge join. For 100 TB inputs prefer passing ``left_order/right_order``
on clustered keys so the range exchange is balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__sq_pos_rn"


def _with_rn(df: DataFrame, order: list[str] | None) -> DataFrame:
    if order:
        w = Window.orderBy(*[F.col(c) for c in order])
    else:
        # Preserve arrival order: mono-id is increasing within and across
        # partitions in read order for file sources.
        df = df.withColumn("__sq_mono", F.monotonically_increasing_id())
        w = Window.orderBy("__sq_mono")
    out = df.withColumn(_RN, F.row_number().over(w))
    return out.drop("__sq_mono") if "__sq_mono" in out.columns else out


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
