"""AS-OF join — for each left row, the most recent right row at-or-before
its timestamp (per key). The canonical time-series operator Spark lacks
natively (reference engine lacks it too; DuckDB ships ASOF JOIN, which the
inventory oracle uses to verify this implementation).

Implementation: the union + ordered-window trick, NOT a range join:

1. tag left (1) and right (0) rows and union them;
2. one window per key ordered by (ts, tag) — right rows sort before left
   rows at equal timestamps, so ties are inclusive (ts_right <= ts_left);
3. each left row picks up the last non-null right payload via
   ``last(..., ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT;
4. filter back to left rows.

Scale: exactly ONE hash shuffle on the key + an in-partition sort — the
same cost as a sort-merge join, with no range-explosion. Skewed keys can be
pre-salted per operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__sq_asof_tag"
_PREF = "__sq_asof_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload columns of the
    closest ``right`` row with ``right.on <= left.on`` (direction
    'backward'; 'forward' matches the closest at-or-after instead) sharing
    the ``by`` key. Unmatched left rows keep NULL payloads."""
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]

    l_tag = left.withColumn(_TAG, F.lit(1))
    r_tag = right.select(
        *by,
        F.col(on).alias(on),
        *[F.col(c).alias(f"{_PREF}{c}") for c in right_cols],
    ).withColumn(_TAG, F.lit(0))

    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col(_TAG).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last
    elif direction == "forward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col(_TAG).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    for c in right_cols:
        merged = merged.withColumn(
            f"{_PREF}{c}", pick(F.col(f"{_PREF}{c}"), ignorenulls=True).over(w)
        )

    out = merged.filter(F.col(_TAG) == 1).drop(_TAG)
    for c in right_cols:
        out = out.withColumnRenamed(f"{_PREF}{c}", f"{c}{suffix}")
    return out
