"""Binned range join — point-in-interval joins as HASH joins.

Spark plans an inequality-only join (``l.ts BETWEEN r.lo AND r.hi``) as a
BroadcastNestedLoopJoin: every left row is tested against every right row,
O(n*m) comparisons, and the right side must fit in one broadcast. The
reference engine has the same shape (its theta joins are nested loops,
src/execute/join.js); fine for its browser-scale inputs, fatal at 100 TB.

This operator converts the range predicate into an equi-join on time bins:

1. every left point lands in exactly ONE bin: ``floor(point / width)``;
2. every right interval is exploded to the bins it overlaps
   (``sequence(floor(lo/w), floor(hi/w))`` — ``ceil(span/width)+1`` rows,
   a bounded, caller-chosen duplication factor);
3. hash equi-join on the bin id, then the exact ``BETWEEN`` as a residual
   filter inside the bucket.

Each matching (left, right) pair appears exactly once — the left row owns a
single bin, so no post-join dedup is needed.

Scale shape: one hash shuffle per side on the bin key; comparisons drop
from O(n*m) to O(pairs-per-bucket). Pick ``bin_width`` near the typical
interval span: duplication stays ~2x while buckets stay small. A hot bin
(skewed time range) can be salted with operators/skew.py like any other
hash-join key. DuckDB solves the same problem with its IEJoin; the
inventory oracle uses exactly that as the independent check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LBIN = "__sq_range_bin_l"
_RBIN = "__sq_range_bin_r"


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bin_width: float,
    how: str = "inner",
    by: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Join every ``left`` row to the ``right`` intervals containing it:
    ``right.lo <= left.point <= right.hi`` — planned as a binned hash
    equi-join, never a nested loop. ``point``/``lo``/``hi`` are numeric
    (cast timestamps to epoch seconds first); ``bin_width`` is in the same
    unit. ``how`` is ``inner`` or ``left`` (unmatched left rows keep NULL
    right columns). ``by`` adds extra equality keys as (left_col,
    right_col) pairs — e.g. a user/entity id — making the shuffle key
    (entity, bin): hot time bins then spread across entities for free."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    w = F.lit(float(bin_width))
    l_binned = left.withColumn(_LBIN, F.floor(F.col(point) / w))
    r_binned = right.withColumn(
        _RBIN,
        F.explode(F.sequence(F.floor(F.col(lo) / w), F.floor(F.col(hi) / w))),
    )
    cond = (
        (F.col(_LBIN) == F.col(_RBIN))
        & (F.col(point) >= F.col(lo))
        & (F.col(point) <= F.col(hi))
    )
    for lc, rc in by or []:
        cond = cond & (F.col(lc) == F.col(rc))
    return l_binned.join(r_binned, cond, how).drop(_LBIN, _RBIN)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join interval pairs that OVERLAP: ``left_lo <= right_hi AND
    right_lo <= left_hi`` (closed intervals), as a binned hash equi-join.

    Both sides explode to the bins they span, so an overlapping pair can
    co-occur in several buckets; the pair is emitted only from the FIRST
    bin both share — ``bin == floor(max(left_lo, right_lo) / width)`` —
    which every overlapping pair hits exactly once (the later interval's
    start lies inside the overlap, hence inside both bin ranges). This is
    the standard dedup for binned spatial/temporal joins (same idea as
    grid-partitioned spatial joins reporting a pair only from the cell
    containing the intersection's reference point)."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    w = F.lit(float(bin_width))
    l_binned = left.withColumn(
        _LBIN,
        F.explode(
            F.sequence(F.floor(F.col(left_lo) / w), F.floor(F.col(left_hi) / w))
        ),
    )
    r_binned = right.withColumn(
        _RBIN,
        F.explode(
            F.sequence(F.floor(F.col(right_lo) / w), F.floor(F.col(right_hi) / w))
        ),
    )
    cond = (
        (F.col(_LBIN) == F.col(_RBIN))
        & (F.col(left_lo) <= F.col(right_hi))
        & (F.col(right_lo) <= F.col(left_hi))
        & (
            F.col(_LBIN)
            == F.floor(F.greatest(F.col(left_lo), F.col(right_lo)) / w)
        )
    )
    return l_binned.join(r_binned, cond, "inner").drop(_LBIN, _RBIN)
