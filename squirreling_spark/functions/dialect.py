"""Dialect/semantics shim: reference-engine (JavaScript) semantics expressed
as Spark column builders (SURVEY §7.1 item 1 — the compatibility layer).

The reference is dynamically typed with JS coercions:
- loose equality ``'5' = 5`` → true (src/expression/binary.js:51)
- comparisons with NULL → false, not NULL (src/expression/binary.js:33-35)
- LIKE is case-insensitive (ILIKE semantics, src/expression/binary.js:57-66)
- arithmetic coerces via Number(); '/0' → NULL (src/expression/binary.js:15-24)
- CAST failure → NULL, not error (src/expression/evaluate.js:699-738)

Standard Spark/ANSI semantics are the default throughout this engine (the
DuckDB oracle agrees with standard SQL); these helpers exist for workloads
migrating from the reference that depend on JS behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def loose_eq(a: str | Column, b: str | Column) -> Column:
    """JS ``==`` loose equality: compare as numbers when either side casts,
    else as strings. NULL == NULL is true (JS null == undefined style is NOT
    mirrored; reference treats null cells as SQL nulls)."""
    a, b = _col(a), _col(b)
    an, bn = a.try_cast("double"), b.try_cast("double")
    return F.when(a.isNull() & b.isNull(), F.lit(True)).otherwise(
        F.when(an.isNotNull() & bn.isNotNull(), an == bn).otherwise(
            a.cast("string") == b.cast("string")
        )
    )


def cmp_null_false(a: str | Column, op: str, b: str | Column) -> Column:
    """Reference comparison semantics: any comparison involving NULL yields
    false (not NULL) — deviates from SQL 3VL."""
    a, b = _col(a), _col(b)
    ops = {
        "=": a == b,
        "!=": a != b,
        "<": a < b,
        "<=": a <= b,
        ">": a > b,
        ">=": a >= b,
    }
    return F.coalesce(ops[op], F.lit(False))


def like_ci(c: str | Column, pattern: str) -> Column:
    """Reference LIKE: case-insensitive with dotall '%' (ILIKE)."""
    return _col(c).ilike(pattern)


def js_number(c: str | Column) -> Column:
    """Number() coercion: numeric strings parse, booleans → 0/1, anything
    else → NULL (JS would give NaN; NULL is the SQL-safe analogue)."""
    c = _col(c)
    return F.when(c.cast("string") == "true", F.lit(1.0)).otherwise(
        F.when(c.cast("string") == "false", F.lit(0.0)).otherwise(
            c.try_cast("double")
        )
    )


def js_div(a: str | Column, b: str | Column) -> Column:
    """Division with /0 → NULL (matches Spark ANSI-off and the reference)."""
    a, b = js_number(a), js_number(b)
    return F.when(b == 0, F.lit(None)).otherwise(a / b)


def soft_cast(c: str | Column, dtype: str) -> Column:
    """CAST that yields NULL on failure regardless of session ANSI mode."""
    return _col(c).try_cast(dtype)
