"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
tables, then compares column names (sorted), row counts, and the
order-insensitive multiset of row values — the same signal the driver hashes.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from squirreling_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def spark_result(fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(_norm(v) for v in row) for row in df.collect()]
    return cols, rows


def duck_result(sql: str, sf_dir: str):
    con = duck_connection(sf_dir)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [tuple(_norm(v) for v in row) for row in cur.fetchall()]
    con.close()
    return cols, rows


def _sorted_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    projected = [tuple(r[i] for i in order) for r in rows]
    return sorted(projected, key=repr)


def compare(name: str, fn, oracle: str, spark, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    errs: list[str] = []
    s_cols, s_rows = spark_result(fn, spark, sf_dir)
    d_cols, d_rows = duck_result(oracle, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    sm = _sorted_multiset(s_cols, s_rows)
    dm = _sorted_multiset(d_cols, d_rows)
    if sm != dm:
        diff_idx = [i for i, (a, b) in enumerate(zip(sm, dm)) if a != b][:3]
        detail = "; ".join(
            f"row{i}: spark={sm[i]!r} duck={dm[i]!r}" for i in diff_idx
        )
        only_s = [r for r in sm if r not in set(dm)][:2]
        only_d = [r for r in dm if r not in set(sm)][:2]
        errs.append(
            f"{name}: value mismatch ({detail}) only_spark={only_s!r} only_duck={only_d!r}"
        )
    return errs
