"""Grid-banded spatial join — ``ON ST_Predicate(a.geom, b.geom)`` as a HASH
join, never a nested loop.

A raw spatial-predicate join plans as BroadcastNestedLoopJoin with the
row-wise Python predicate applied to every (left, right) pair — O(n*m)
Python calls and a full broadcast of one side. The reference engine has the
same shape (its theta joins are nested loops, src/execute/join.js; spatial
predicates src/spatial/spatial.js:20-69); fine at browser scale, fatal at
100 TB. This operator is ``operators/range_join.py``'s binned pattern in
two dimensions:

1. **JVM-side bbox extraction from WKT** — coordinates are pulled straight
   out of the WKT text with ``regexp_extract_all`` (numbers alternate
   x y x y across every WKT type), min/max folded with array intrinsics.
   No Python, whole-stage codegen, linear scan.
2. **Grid explode**: each geometry lands in every ``cell_size`` grid cell
   its bbox covers (bounded, caller-chosen duplication — pick cell_size
   near the typical bbox extent so duplication stays ~2x).
3. **Hash equi-join on (cell_x, cell_y)** + JVM residuals: bbox overlap
   test, and the first-shared-cell rule — a pair is emitted only from the
   cell containing ``(max(xmin), max(ymin))``, which every bbox-overlapping
   pair covers exactly once, so no post-join dedup.
4. **Exact predicate on candidates only**: the Arrow-batched pandas UDF
   (functions/spatial.py's real planar geometry) runs as a post-join
   filter over the few bbox-surviving pairs, not the cross product.

Scale shape: one hash shuffle per side on the cell key; Python calls drop
from O(n*m) to O(candidate pairs). A hot cell (dense region) salts like
any other hash-join key; AQE's skew-join splitting also applies because
the join IS a plain equi-join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from squirreling_spark.functions.spatial import _PREDICATES, parse_wkt

_NUM_RE = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"


def bbox_struct(wkt_col: str | Column) -> Column:
    """JVM-side bounding box of a WKT geometry as
    struct<xmin,ymin,xmax,ymax> — regexp number extraction + array fold,
    zero Python. WKT coordinates alternate x y x y in text order for every
    geometry type (POINT/LINESTRING/POLYGON/MULTI*), so even-index numbers
    are x and odd-index are y."""
    col = F.col(wkt_col) if isinstance(wkt_col, str) else wkt_col
    nums = F.transform(
        F.regexp_extract_all(col, F.lit(_NUM_RE), F.lit(0)),
        lambda t: t.cast("double"),
    )
    xs = F.filter(
        F.transform(nums, lambda v, i: F.when(i % 2 == 0, v)),
        lambda v: v.isNotNull(),
    )
    ys = F.filter(
        F.transform(nums, lambda v, i: F.when(i % 2 == 1, v)),
        lambda v: v.isNotNull(),
    )
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )


def _exact_predicate_udf(predicate: str, distance: float | None = None):
    if predicate == "st_dwithin":
        from squirreling_spark.functions.spatial import dwithin

        d = float(distance)

        def batch(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    False
                    if x is None or y is None
                    else bool(dwithin(parse_wkt(x), parse_wkt(y), d))
                    for x, y in zip(a, b)
                ],
                dtype=object,
            )

        return F.pandas_udf(batch, BooleanType())
    fn = _PREDICATES[predicate]

    def batch(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                False
                if x is None or y is None
                else bool(fn(parse_wkt(x), parse_wkt(y)))
                for x, y in zip(a, b)
            ],
            dtype=object,
        )

    return F.pandas_udf(batch, BooleanType())


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    left_wkt: str,
    right_wkt: str,
    predicate: str = "st_intersects",
    cell_size: float = 1.0,
    distance: float | None = None,
) -> DataFrame:
    """Inner-join rows whose geometries satisfy
    ``predicate(left_wkt, right_wkt)`` (a functions/spatial.py ST_* name,
    argument order preserved — e.g. ``st_contains`` means LEFT contains
    RIGHT). Planned as a grid-cell hash equi-join with the exact predicate
    as a post-join candidate filter — no BroadcastNestedLoopJoin
    (plan-tested in tests/test_plans.py).

    ``predicate="st_dwithin"`` turns this into a DISTANCE join
    (``distance`` required): the left bboxes are padded by ``distance``
    before gridding, so candidate generation stays a hash equi-join and
    the exact point-to-segment distance test runs on candidates only.
    Pick ``cell_size`` >= distance so padding adds at most one cell ring."""
    if predicate == "st_dwithin":
        if distance is None:
            raise ValueError("st_dwithin join requires distance=")
    elif predicate not in _PREDICATES:
        raise ValueError(
            f"unknown predicate {predicate!r}; one of {sorted(_PREDICATES)}"
        )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    s = F.lit(float(cell_size))
    lb, rb = "__sq_sj_lbox", "__sq_sj_rbox"
    lcx, lcy, rcx, rcy = "__sq_sj_lcx", "__sq_sj_lcy", "__sq_sj_rcx", "__sq_sj_rcy"

    pad = F.lit(float(distance)) if predicate == "st_dwithin" else F.lit(0.0)
    raw_box = bbox_struct(left_wkt)
    padded_box = F.struct(
        (raw_box.getField("xmin") - pad).alias("xmin"),
        (raw_box.getField("ymin") - pad).alias("ymin"),
        (raw_box.getField("xmax") + pad).alias("xmax"),
        (raw_box.getField("ymax") + pad).alias("ymax"),
    )
    l_boxed = (
        left.withColumn(lb, padded_box)
        .filter(F.col(f"{lb}.xmin").isNotNull())
        .withColumn(
            lcx,
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{lb}.xmin") / s),
                    F.floor(F.col(f"{lb}.xmax") / s),
                )
            ),
        )
        .withColumn(
            lcy,
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{lb}.ymin") / s),
                    F.floor(F.col(f"{lb}.ymax") / s),
                )
            ),
        )
    )
    r_boxed = (
        right.withColumn(rb, bbox_struct(right_wkt))
        .filter(F.col(f"{rb}.xmin").isNotNull())
        .withColumn(
            rcx,
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{rb}.xmin") / s),
                    F.floor(F.col(f"{rb}.xmax") / s),
                )
            ),
        )
        .withColumn(
            rcy,
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{rb}.ymin") / s),
                    F.floor(F.col(f"{rb}.ymax") / s),
                )
            ),
        )
    )
    cond = (
        (F.col(lcx) == F.col(rcx))
        & (F.col(lcy) == F.col(rcy))
        # bbox overlap — kills most candidates JVM-side
        & (F.col(f"{lb}.xmin") <= F.col(f"{rb}.xmax"))
        & (F.col(f"{rb}.xmin") <= F.col(f"{lb}.xmax"))
        & (F.col(f"{lb}.ymin") <= F.col(f"{rb}.ymax"))
        & (F.col(f"{rb}.ymin") <= F.col(f"{lb}.ymax"))
        # first-shared-cell rule: exactly-once emission per pair
        & (
            F.col(lcx)
            == F.floor(
                F.greatest(F.col(f"{lb}.xmin"), F.col(f"{rb}.xmin")) / s
            )
        )
        & (
            F.col(lcy)
            == F.floor(
                F.greatest(F.col(f"{lb}.ymin"), F.col(f"{rb}.ymin")) / s
            )
        )
    )
    exact = _exact_predicate_udf(predicate, distance)
    return (
        l_boxed.join(r_boxed, cond, "inner")
        .filter(exact(F.col(left_wkt), F.col(right_wkt)))
        .drop(lb, rb, lcx, lcy, rcx, rcy)
    )
