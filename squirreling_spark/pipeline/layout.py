"""Z-order (Morton-curve) clustering for data layout at scale.

The 100 TB problem this solves: parquet/Delta data skipping works off
per-file min/max column statistics, but a file layout ordered by ONE
column leaves every OTHER column's min/max spanning the whole domain —
a predicate on the second column prunes nothing. Interleaving the bits
of several columns into one sort key (the Morton / Z-order curve, the
same layout Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite
produce) gives every participating column locality inside each file, so
multi-dimensional predicates prune files on all of them.

Everything here is integer arithmetic on JVM-side built-ins (shift/and/
add over disjoint bit positions) — whole-stage codegen, no UDF, no
shuffle except the ONE range exchange of the explicit repartition step.

Composition:
- ``quantize``: map a bounded numeric column onto [0, 2^bits) with pure
  integer arithmetic (cross-engine exact — no float division).
- ``zorder_key``: interleave the quantized columns' bits.
- ``zorder_layout``: df + (zkey, bucket) with bounds computed in-plan
  (one broadcast single-row aggregate — no driver collect).
- ``zorder_repartition``: the write path — one range exchange on zkey +
  in-partition sort, the exact shape a sorted-file rewrite needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Integer quantization of ``col`` ∈ [mn, mx] onto [0, 2^bits):
    ``(col - mn) * 2^bits div (mx - mn + 1)`` — mirrors DuckDB's ``//``
    exactly while ``(mx - mn + 1) * 2^bits < 2^53`` (the double-division
    floor below is exact under that bound; with bits=8 that allows a
    ~3.5e13-wide column domain, far past any key column here)."""
    span = (mx - mn + 1).cast("bigint")
    scaled = (col.cast("bigint") - mn.cast("bigint")) * F.lit(
        1 << bits
    ).cast("bigint")
    return F.floor(scaled / span).cast("bigint")


def zorder_key(qcols: list[Column], bits: int) -> Column:
    """Morton interleave of pre-quantized columns (each in
    [0, 2^bits)): bit ``i`` of column ``c`` lands at position
    ``i * n_cols + (n_cols - 1 - c)`` — earlier columns more
    significant within each level. Disjoint targets, so summing the
    shifted bits IS the bitwise OR; the whole key is one static codegen
    expression (``bits × n_cols`` shift/and terms)."""
    nc = len(qcols)
    if nc * bits > 62:
        raise ValueError("zorder key exceeds 62 bits")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for c_idx, c in enumerate(qcols):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(
                F.lit(1).cast("bigint")
            )
            z = z + F.shiftleft(bit, i * nc + (nc - 1 - c_idx))
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """Append ``zkey`` (Morton key over ``cols``) and ``bucket``
    (top ``log2(n_buckets)`` key bits — deterministic, unlike sampled
    range-partition boundaries). Column bounds are computed with one
    single-row aggregate broadcast back into the plan, so the operator
    is two scans and zero shuffles of the main data."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(c).cast("bigint").alias(f"__mn_{c}"),
                F.max(c).cast("bigint").alias(f"__mx_{c}"),
            )
        ]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    q = [
        quantize(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in cols
    ]
    shift = len(cols) * bits - (n_buckets.bit_length() - 1)
    z = zorder_key(q, bits)
    return with_bounds.select(
        *df.columns,
        z.alias("zkey"),
        F.shiftright(z, shift).alias("bucket"),
    )


def zorder_repartition(
    df: DataFrame, cols: list[str], bits: int = 8, num_files: int = 16
) -> DataFrame:
    """The sorted-rewrite shape: ONE range exchange on the Morton key +
    an in-partition sort (zkey FIRST, matching the FileFormatWriter
    convention — see the partitioned-write gotcha in qutil), ready for
    ``.write.parquet``. Each output file then carries tight min/max
    stats on EVERY z-ordered column."""
    laid = zorder_layout(df, cols, bits, n_buckets=1)
    return laid.drop("bucket").repartitionByRange(
        num_files, "zkey"
    ).sortWithinPartitions("zkey")
