"""Opt-in strict validation of the reference SQL dialect.

The engine is deliberately a SUPERSET of the reference: Spark accepts
arities, cast targets and join shapes the reference rejects. For
reference-faithful behavior (and the reference's own test suite, which
asserts on those rejections) ``execute_sql(..., strict=True)`` runs this
validator over the ORIGINAL query text before any rewrite.

Ported behavioral spec, all from the reference's validation layer:
- function arity table: src/validation/functions.js:114-253
  (FUNCTION_SIGNATURES) and its message format
  (validateFunctionArgs, :254-295)
- cast targets: src/validation/functions.js:88-90 (isCastType),
  parse error text src/parse/primary.js:136-142
- interval units: src/parse (tokenizer) — DAY, MONTH, YEAR, HOUR,
  MINUTE, SECOND
- string-function runtime value checks: src/expression/strings.js
  (LENGTH/OCTET_LENGTH type guards, SUBSTRING start>=1 / length>=0,
  LEFT/RIGHT length>=0, REGEXP position>=1)
- join restrictions: src/parse/joins.js (comma-FROM and CROSS JOIN
  only with table functions), LATERAL VIEW shape checks
- window-vs-GROUP-BY exclusion, dotted-identifier scoping, set-op
  column-name agreement: src/execute/execute.js

Only statically decidable rules raise here; per-row value rules
(SUBSTRING with a column start) are enforced by a strict rewrite in
``strict_guards()`` that compiles to JVM-side ``raise_error`` branches.
"""

from __future__ import annotations

import re

from .sqldialect import (
    _balanced_arg,
    _split_top_args,
    _string_mask,
    _sub_outside_strings,
)


class StrictDialectError(ValueError):
    """Raised when strict mode rejects SQL the reference would reject."""


# --- arity table (reference src/validation/functions.js:114-253) ----------
# (min, max, signature); max None = unbounded
FUNCTION_SIGNATURES: dict[str, tuple[int, int | None, str]] = {
    "UPPER": (1, 1, "string"),
    "LOWER": (1, 1, "string"),
    "LENGTH": (1, 1, "string"),
    "OCTET_LENGTH": (1, 1, "string"),
    "TRIM": (1, 1, "string"),
    "REPLACE": (3, 3, "string, search, replacement"),
    "SUBSTRING": (2, 3, "string, start[, length]"),
    "SUBSTR": (2, 3, "string, start[, length]"),
    "CONCAT": (1, None, "value1, value2[, ...]"),
    "LEFT": (2, 2, "string, length"),
    "RIGHT": (2, 2, "string, length"),
    "INSTR": (2, 2, "string, substring"),
    "POSITION": (2, 2, "string, substring"),
    "STRPOS": (2, 2, "string, substring"),
    "SPLIT_PART": (3, 3, "string, delimiter, index"),
    "STRING_SPLIT": (2, 2, "string, delimiter"),
    "REGEXP_SUBSTR": (2, 4, "string, pattern[, position[, occurrence]]"),
    "REGEXP_EXTRACT": (2, 4, "string, pattern[, position[, occurrence]]"),
    "REGEXP_REPLACE": (
        3, 5, "string, pattern, replacement[, position[, occurrence]]"
    ),
    "REGEXP_MATCHES": (2, 2, "string, pattern"),
    "RANDOM": (0, 0, ""),
    "RAND": (0, 0, ""),
    "CURRENT_DATE": (0, 0, ""),
    "CURRENT_TIME": (0, 0, ""),
    "CURRENT_TIMESTAMP": (0, 0, ""),
    "DATE_TRUNC": (2, 2, "unit, date"),
    "DATE_PART": (2, 2, "field, date"),
    "DATE_DIFF": (3, 3, "unit, start, end"),
    "DATEDIFF": (3, 3, "unit, start, end"),
    "EPOCH": (1, 1, "date"),
    "FLOOR": (1, 1, "number"),
    "CEIL": (1, 1, "number"),
    "CEILING": (1, 1, "number"),
    "ROUND": (1, 2, "number[, decimals]"),
    "ABS": (1, 1, "number"),
    "SIGN": (1, 1, "number"),
    "MOD": (2, 2, "dividend, divisor"),
    "EXP": (1, 1, "number"),
    "LN": (1, 1, "number"),
    "LOG10": (1, 1, "number"),
    "POWER": (2, 2, "base, exponent"),
    "POW": (2, 2, "base, exponent"),
    "SQRT": (1, 1, "number"),
    "SIN": (1, 1, "radians"),
    "COS": (1, 1, "radians"),
    "TAN": (1, 1, "radians"),
    "COT": (1, 1, "radians"),
    "ASIN": (1, 1, "number"),
    "ACOS": (1, 1, "number"),
    "ATAN": (1, 2, "number"),
    "ATAN2": (2, 2, "y, x"),
    "DEGREES": (1, 1, "radians"),
    "RADIANS": (1, 1, "degrees"),
    "PI": (0, 0, ""),
    "JSON_VALUE": (2, 2, "expression, path"),
    "JSON_QUERY": (2, 2, "expression, path"),
    "JSON_EXTRACT": (2, 2, "expression, path"),
    "JSON_OBJECT": (0, None, "key1, value1[, ...]"),
    "JSON_ARRAY_LENGTH": (1, 1, "array"),
    "JSON_VALID": (1, 1, "value"),
    "JSON_TYPE": (1, 1, "value"),
    "JSON_KEYS": (1, 1, "value"),
    "JSON_ARRAYAGG": (1, 1, "expression"),
    "ARRAY_AGG": (1, 1, "expression"),
    "LIST": (1, 1, "expression"),
    "ARRAY_LENGTH": (1, 2, "array[, dimension]"),
    "LIST_LENGTH": (1, 1, "array"),
    "LEN": (1, 1, "array"),
    "ARRAY_POSITION": (2, 2, "array, element"),
    "LIST_POSITION": (2, 2, "array, element"),
    "ARRAY_CONTAINS": (2, 2, "array, element"),
    "LIST_CONTAINS": (2, 2, "array, element"),
    "ARRAY_SORT": (1, 1, "array"),
    "ARRAY_APPEND": (2, 2, "array, element"),
    "LIST_APPEND": (2, 2, "array, element"),
    "ARRAY_CONCAT": (2, 2, "array1, array2"),
    "LIST_CONCAT": (2, 2, "array1, array2"),
    "CARDINALITY": (1, 1, "array"),
    "SIZE": (1, 1, "array"),
    "UNNEST": (1, 1, "array"),
    "EXPLODE": (1, 1, "array"),
    "JSON_EACH": (1, 1, "value"),
    "COALESCE": (1, None, "value1, value2[, ...]"),
    "NULLIF": (2, 2, "value1, value2"),
    "GREATEST": (1, None, "value1[, value2, ...]"),
    "LEAST": (1, None, "value1[, value2, ...]"),
    "COUNT": (1, 1, "expression"),
    "COUNTIF": (1, 1, "condition"),
    "SUM": (1, 1, "expression"),
    "AVG": (1, 1, "expression"),
    "MIN": (1, 1, "expression"),
    "MAX": (1, 1, "expression"),
    "STDDEV_SAMP": (1, 1, "expression"),
    "STDDEV_POP": (1, 1, "expression"),
    "MEDIAN": (1, 1, "expression"),
    "PERCENTILE_CONT": (2, 2, "fraction, expression"),
    "APPROX_QUANTILE": (2, 2, "expression, fraction"),
    "STRING_AGG": (2, 2, "expression, separator"),
    "ROW_NUMBER": (0, 0, ""),
    "LAG": (1, 3, "value[, offset[, default]]"),
    "LEAD": (1, 3, "value[, offset[, default]]"),
    "ST_INTERSECTS": (2, 2, "geometry, geometry"),
    "ST_CONTAINS": (2, 2, "geometry, geometry"),
    "ST_CONTAINSPROPERLY": (2, 2, "geometry, geometry"),
    "ST_WITHIN": (2, 2, "geometry, geometry"),
    "ST_OVERLAPS": (2, 2, "geometry, geometry"),
    "ST_TOUCHES": (2, 2, "geometry, geometry"),
    "ST_EQUALS": (2, 2, "geometry, geometry"),
    "ST_CROSSES": (2, 2, "geometry, geometry"),
    "ST_COVERS": (2, 2, "geometry, geometry"),
    "ST_COVEREDBY": (2, 2, "geometry, geometry"),
    "ST_DWITHIN": (3, 3, "geometry, geometry, distance"),
    "ST_GEOMFROMTEXT": (1, 1, "wkt"),
    "ST_MAKEENVELOPE": (4, 4, "xmin, ymin, xmax, ymax"),
    "ST_ASTEXT": (1, 1, "geometry"),
}

_CAST_TYPES = {
    "TEXT", "STRING", "VARCHAR", "INTEGER", "INT", "BIGINT", "FLOAT",
    "REAL", "DOUBLE", "BOOLEAN", "BOOL", "TIMESTAMP",
}
_INTERVAL_UNITS = {"DAY", "MONTH", "YEAR", "HOUR", "MINUTE", "SECOND"}

_CALL_RE = re.compile(r"\b([A-Za-z_]\w*)\s*\(")
_NUM_LIT_RE = re.compile(r"\s*-?\d+\s*$")


def _literal_int(arg: str) -> int | None:
    m = re.fullmatch(r"\s*(-?\d+)\s*", arg)
    return int(m.group(1)) if m else None


def _iter_calls(q: str):
    """Yield (name_upper, start, args) for every call outside strings."""
    mask = _string_mask(q)
    for m in _CALL_RE.finditer(q):
        if mask[m.start()]:
            continue
        open_idx = q.index("(", m.end() - 1)
        try:
            arg_end = _balanced_arg(q, open_idx)
        except Exception:  # noqa: BLE001 — unbalanced: Spark will error
            continue
        args = _split_top_args(q[open_idx + 1 : arg_end - 1])
        if args == [""]:
            args = []
        yield m.group(1).upper(), m.start(), args


def _validate_arity(q: str, functions) -> None:
    udf_names = {k.upper() for k in (functions or {})}
    for name, pos, args in _iter_calls(q):
        if name in udf_names:
            continue  # UDF arity is the registration's concern
        spec = FUNCTION_SIGNATURES.get(name)
        if spec is None:
            continue  # engine superset: unknown-to-the-reference is fine
        if name == "EXTRACT":
            continue  # EXTRACT(field FROM x) has its own syntax
        if name == "TRIM" and args and re.match(
            r"\s*(BOTH|LEADING|TRAILING)\b", args[0], re.I
        ):
            continue  # TRIM(BOTH .. FROM ..) standard form
        if name == "POSITION" and len(args) == 1 and re.search(
            r"\sIN\s", args[0], re.I
        ):
            continue  # POSITION(needle IN haystack) standard form
        if name in ("PERCENTILE_CONT", "PERCENTILE_DISC") and re.search(
            r"\bWITHIN\s+GROUP\b", q[pos:], re.I
        ):
            continue  # ordered-set form: ORDER BY expr is the 2nd arg
        if name == "SUBSTRING" and len(args) == 1 and re.search(
            r"\sFROM\s", args[0], re.I
        ):
            continue  # SUBSTRING(x FROM s [FOR l]) standard form
        n = len(args)
        if name == "COUNT" and n == 0:
            n = 1  # COUNT(*) tokenizes oddly; reference counts 1
        lo, hi, signature = spec
        if n < lo or (hi is not None and n > hi):
            if hi is None:
                expected = f"at least {lo} argument"
            elif lo != hi:
                expected = f"{lo}-{hi} arguments"
            else:
                expected = f"{lo} argument" + ("s" if lo != 1 else "")
            raise StrictDialectError(
                f"{name}({signature}) function requires {expected}, "
                f"got {n} at position {pos}"
            )


def _validate_literal_args(q: str) -> None:
    """Statically-visible invalid literal arguments (strings.js checks)."""
    for name, pos, args in _iter_calls(q):
        if name in ("SUBSTRING", "SUBSTR") and len(args) >= 2:
            s = _literal_int(args[1])
            if s is not None and s < 1:
                raise StrictDialectError(
                    f"SUBSTRING start position must be >= 1, got {s} "
                    f"at position {pos}"
                )
            if len(args) == 3:
                ln = _literal_int(args[2])
                if ln is not None and ln < 0:
                    raise StrictDialectError(
                        f"SUBSTRING length must be >= 0, got {ln} "
                        f"at position {pos}"
                    )
        if name in ("LEFT", "RIGHT") and len(args) == 2:
            ln = _literal_int(args[1])
            if ln is not None and ln < 0:
                raise StrictDialectError(
                    f"{name} length must be >= 0, got {ln} "
                    f"at position {pos}"
                )
        if name in ("REGEXP_SUBSTR", "REGEXP_EXTRACT") and len(args) >= 3:
            p = _literal_int(args[2])
            if p is not None and p < 1:
                raise StrictDialectError(
                    f"{name} position must be >= 1, got {p} "
                    f"at position {pos}"
                )
        if name == "JSON_EACH" and len(args) >= 1:
            a = args[0].strip()
            if len(a) >= 2 and a[0] == "'" and a[-1] == "'":
                import json as _json

                try:
                    v = _json.loads(a[1:-1].replace("''", "'"))
                except ValueError:
                    raise StrictDialectError(
                        f"Invalid JSON in JSON_EACH at position {pos}"
                    ) from None
                if not isinstance(v, (list, dict)):
                    raise StrictDialectError(
                        f"JSON_EACH requires a JSON object or array, got "
                        f"{a} at position {pos}"
                    )


def _validate_string_arg_types(q: str, spark) -> None:
    """LENGTH rejects numbers/dates (strings.js:38-46); OCTET_LENGTH is
    string-only (:48-56). With a statically-typed column the reference
    would throw on the first row — strict mode throws up front."""
    from pyspark.sql import types as T

    from .sqldialect import _ref_dtype

    bad_len = (
        T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
        T.DecimalType, T.ShortType, T.DateType, T.TimestampType,
        T.BooleanType,
    )
    for name, pos, args in _iter_calls(q):
        if name not in ("LENGTH", "OCTET_LENGTH") or len(args) != 1:
            continue
        dt = _ref_dtype(spark, args[0].strip())
        if dt is None:
            continue
        kind = (
            "date" if isinstance(dt, (T.DateType, T.TimestampType))
            else "number" if isinstance(dt, bad_len) else None
        )
        if name == "OCTET_LENGTH" and isinstance(
            dt, (T.ArrayType, T.StructType, T.MapType)
        ):
            kind = "object"
        if kind:
            want = "string" if name == "OCTET_LENGTH" else "string or array"
            raise StrictDialectError(
                f"{name} expected {want}, got {kind} at position {pos}. "
                f"Use CAST to convert to a string first."
            )


def _validate_cast_targets(q: str) -> None:
    for name, pos, args in _iter_calls(q):
        if name != "CAST" or len(args) != 1:
            continue
        m = re.search(r"\sAS\s+([A-Za-z]+)\s*$", args[0], re.I)
        if m and m.group(1).upper() not in _CAST_TYPES:
            raise StrictDialectError(
                'Expected cast type (STRING, INT, BIGINT, FLOAT, BOOL, '
                f'TIMESTAMP) after "AS" but found "{m.group(1)}" '
                f"at position {pos}"
            )


def _validate_intervals(q: str) -> None:
    mask = _string_mask(q)
    for m in re.finditer(r"\bINTERVAL\b", q, re.I):
        if mask[m.start()]:
            continue
        tail = q[m.end():]
        um = re.match(r"\s+'?-?\d+'?\s+([A-Za-z]+)", tail)
        if um:
            unit = um.group(1).upper().rstrip("S") if um.group(1).upper() \
                not in _INTERVAL_UNITS else um.group(1).upper()
            unit = um.group(1).upper()
            if unit.endswith("S") and unit[:-1] in _INTERVAL_UNITS:
                unit = unit[:-1]
            if unit not in _INTERVAL_UNITS:
                raise StrictDialectError(
                    f"Invalid interval unit {um.group(1)} at position "
                    f"{m.end() - m.start() + m.start()}. Valid values: "
                    "DAY, MONTH, YEAR, HOUR, MINUTE, SECOND"
                )
        # standalone INTERVAL: only valid directly after + or - (date
        # arithmetic) — a select item starting with INTERVAL is an error
        before = q[: m.start()].rstrip()
        if not before or before[-1] not in "+-":
            raise StrictDialectError(
                f"INTERVAL is only supported in date arithmetic "
                f"(expr + INTERVAL n unit) at position {m.start()}"
            )


def _validate_order_by_star(q: str) -> None:
    """ORDER BY <n> where select item n is ``*`` (reference resolves
    positional ORDER BY against the select list; * has no single
    value)."""
    mask = _string_mask(q)
    m = re.search(r"\bORDER\s+BY\s+", q, re.I)
    if not m or mask[m.start()]:
        return
    sel = re.search(r"\bSELECT\s+(DISTINCT\s+)?(.*?)\s+FROM\b", q,
                    re.I | re.S)
    if not sel:
        return
    items = _split_top_args(sel.group(2))
    tail = q[m.end():]
    for item in _split_top_args(re.split(
        r"\bLIMIT\b|\bOFFSET\b", tail, flags=re.I
    )[0]):
        im = re.fullmatch(r"\s*(\d+)\s*(ASC|DESC)?\s*", item, re.I)
        if im:
            n = int(im.group(1))
            if 1 <= n <= len(items) and items[n - 1].strip() == "*":
                raise StrictDialectError(
                    f"ORDER BY position {n} refers to * which is not "
                    "supported"
                )


def _from_scope(q: str, tables) -> set[str]:
    """Table names and aliases visible to dotted references."""
    scope = {t for t in (tables or {})}
    mask = _string_mask(q)
    for m in re.finditer(
        r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)"
        r"(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?",
        q, re.I,
    ):
        if mask[m.start()]:
            continue
        scope.add(m.group(1))
        alias = m.group(2)
        if alias and alias.upper() not in (
            "ON", "WHERE", "GROUP", "ORDER", "LEFT", "RIGHT", "FULL",
            "INNER", "CROSS", "JOIN", "POSITIONAL", "LIMIT", "HAVING",
            "UNION", "EXCEPT", "INTERSECT", "LATERAL", "USING", "OFFSET",
        ):
            scope.add(alias)
    # table-function / subquery aliases: ") AS j", ") j", "UNNEST(..) AS
    # u(x)", LATERAL VIEW ... v AS c
    for m in re.finditer(r"\)\s*(?:AS\s+)?([A-Za-z_]\w*)", q, re.I):
        if not mask[m.start()]:
            if m.group(1).upper() not in (
                "ON", "WHERE", "GROUP", "ORDER", "AND", "OR", "THEN",
                "ELSE", "END", "WHEN", "FROM", "JOIN", "AS", "IS", "NOT",
                "IN", "LIKE", "ASC", "DESC", "LIMIT", "OFFSET", "HAVING",
                "UNION", "EXCEPT", "INTERSECT", "CROSS", "LEFT", "RIGHT",
                "FULL", "INNER", "OUTER", "LATERAL", "USING", "OVER", "BY",
            ):
                scope.add(m.group(1))
    for m in re.finditer(
        r"\bLATERAL\s+VIEW\s+\w+\s*\([^)]*\)\s*(\w+)?", q, re.I
    ):
        if not mask[m.start()] and m.group(1):
            scope.add(m.group(1))
    # column aliases of a table-function alias list — `UNNEST(..) AS
    # u(x, y)` exposes x/y directly, and a struct-typed element alias
    # makes `x.field` a legal dotted reference.
    for m in re.finditer(
        r"\)\s*(?:AS\s+)?[A-Za-z_]\w*\s*\(([^)]*)\)", q, re.I
    ):
        if mask[m.start()]:
            continue
        for col in m.group(1).split(","):
            col = col.strip()
            if re.fullmatch(r"[A-Za-z_]\w*", col):
                scope.add(col)
    for m in re.finditer(r"\bWITH\s+([A-Za-z_]\w*)\s+AS\b", q, re.I):
        if not mask[m.start()]:
            scope.add(m.group(1))
    for m in re.finditer(r",\s*([A-Za-z_]\w*)\s+AS\s*\(", q, re.I):
        if not mask[m.start()]:
            scope.add(m.group(1))
    return scope


def _validate_dotted_from(q: str) -> None:
    """A dotted table name directly in FROM/JOIN position is rejected —
    the reference has no schemas, so ``FROM dataset.parquet`` never
    resolves unquoted even when 'dataset.parquet' is a flat table-map
    key (execute.dot tests). Static — needs no session."""
    mask = _string_mask(q)
    for m in re.finditer(
        r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*\.[A-Za-z_]\w*)", q, re.I
    ):
        if not mask[m.start()]:
            raise StrictDialectError(
                f'Unknown table "{m.group(1)}" — quote dotted table '
                f'names ("{m.group(1)}") at position {m.start()}'
            )


def _validate_dotted_refs(q: str, spark, tables) -> None:
    """Unquoted ``a.b`` resolves ONLY when ``a`` is a table/alias in
    scope or a struct column; the reference rejects dotted access to
    FLAT columns named 'a.b' unless quoted (execute.dot tests)."""
    from pyspark.sql import types as T

    from .sqldialect import _ref_dtype

    mask = _string_mask(q)
    scope = _from_scope(q, tables)
    for m in re.finditer(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", q):
        if mask[m.start()]:
            continue
        if q[max(0, m.start() - 1)] in ".]'\"`":
            continue  # chained access / quoted
        qual = m.group(1)
        if qual in scope:
            continue
        dt = _ref_dtype(spark, qual)
        if isinstance(dt, (T.StructType,)):
            continue  # struct field access
        raise StrictDialectError(
            f'Column "{qual}.{m.group(2)}" not found — unquoted dotted '
            f"references require a table alias in scope at position "
            f"{m.start()}"
        )


def _validate_joins(q: str, tables) -> None:
    mask = _string_mask(q)
    table_names = set(tables or {})
    # comma-FROM with a regular table
    fm = re.search(r"\bFROM\s+[A-Za-z_]\w*(?:\s+\w+)?\s*,\s*([A-Za-z_]\w*)",
                   q, re.I)
    if fm and not mask[fm.start()] and fm.group(1) in table_names:
        raise StrictDialectError(
            "Comma-separated FROM is only supported with table functions "
            "like UNNEST; use explicit JOIN ... ON ... for regular tables"
        )
    cm = re.search(r"\bCROSS\s+JOIN\s+([A-Za-z_]\w*)\b(?!\s*\()", q, re.I)
    if cm and not mask[cm.start()] and cm.group(1) in table_names:
        raise StrictDialectError(
            "CROSS JOIN is currently supported only with table functions "
            "like UNNEST"
        )


def _validate_lateral(q: str) -> None:
    mask = _string_mask(q)
    for m in re.finditer(r"\bLATERAL\s+(?!VIEW\b)(\w+)", q, re.I):
        if mask[m.start()]:
            continue
        # `JOIN LATERAL UNNEST(..)` is the reference's explicit-LATERAL
        # join form (execute.unnest.test.js "explicit LATERAL keyword");
        # only the bare `t LATERAL fn(..)` shape requires VIEW.
        if re.search(r"\bJOIN\s*$", q[: m.start()], re.I):
            continue
        raise StrictDialectError(
            f'Expected VIEW after "LATERAL" but found "{m.group(1)}" '
            f"at position {m.start()}"
        )
    for m in re.finditer(r"\bLATERAL\s+VIEW\s+\w+\s*\(", q, re.I):
        if mask[m.start()]:
            continue
        open_idx = q.index("(", m.end() - 1)
        end = _balanced_arg(q, open_idx)
        tail = q[end:]
        am = re.match(r"\s*(AS\b|([A-Za-z_]\w*)\s*(AS\b)?)", tail, re.I)
        if am and am.group(1).upper() == "AS":
            raise StrictDialectError(
                "LATERAL VIEW requires a table alias before AS"
            )
        if am and am.group(2) and not am.group(3):
            raise StrictDialectError(
                f'Expected AS after "{am.group(2)}" but found '
                f"end of query at position {end + len(am.group(0))}"
            )


def _validate_table_functions(q: str) -> None:
    """UNNEST/EXPLODE/JSON_EACH are table functions: FROM-position only
    (reference parse — 'X is a table function and can only be used in
    FROM clauses')."""
    mask = _string_mask(q)
    for m in re.finditer(r"\b(UNNEST|EXPLODE|JSON_EACH)\s*\(", q, re.I):
        if mask[m.start()]:
            continue
        before = q[: m.start()].rstrip()
        # LATERAL VIEW [OUTER] EXPLODE / JOIN LATERAL UNNEST both keep the
        # call in FROM position.
        if re.search(r"(\bFROM|\bJOIN|\bVIEW|\bOUTER|\bLATERAL|,)$",
                     before, re.I):
            continue
        raise StrictDialectError(
            f"{m.group(1).upper()} is a table function and can only be "
            f"used in FROM clauses at position {m.start()}"
        )


def _validate_unnest_alias_select(q: str) -> None:
    """``UNNEST(x) AS u`` exposes the column as ``u.unnest`` — selecting
    bare ``u`` is an unknown column in the reference
    (execute.unnest.test.js:402-411)."""
    mask = _string_mask(q)
    aliases = []
    for m in re.finditer(
        r"\b(?:UNNEST|EXPLODE)\s*\([^)]*\)\s*(?:AS\s+)?([A-Za-z_]\w*)"
        r"\s*(\()?",
        q, re.I,
    ):
        if not mask[m.start()] and not m.group(2):
            aliases.append(m.group(1))
    if not aliases:
        return
    sel = re.search(r"\bSELECT\s+(DISTINCT\s+)?(.*?)\s+FROM\b", q,
                    re.I | re.S)
    if not sel:
        return
    for item in _split_top_args(sel.group(2)):
        bare = item.strip()
        if bare in aliases:
            raise StrictDialectError(
                f'Column "{bare}" not found. Available columns include '
                f'"{bare}.unnest"'
            )


def _validate_window_groupby(q: str) -> None:
    mask = _string_mask(q)

    def depth0(pat):
        for m in re.finditer(pat, q, re.I):
            if mask[m.start()]:
                continue
            d = 0
            for i in range(m.start()):
                if not mask[i]:
                    if q[i] == "(":
                        d += 1
                    elif q[i] == ")":
                        d -= 1
            if d == 0:
                return True
        return False

    if depth0(r"\bOVER\s*\(") and depth0(r"\bGROUP\s+BY\b"):
        raise StrictDialectError(
            "Window functions cannot be combined with GROUP BY in the "
            "same query"
        )


def _validate_setop_names(q: str) -> None:
    """Set-operation branches must agree on output column NAMES
    (execute.union tests). Checked only when every branch's select-list
    names are statically derivable."""
    mask = _string_mask(q)
    parts = []
    last = 0
    for m in re.finditer(
        r"\b(UNION|EXCEPT|INTERSECT)(\s+ALL|\s+DISTINCT)?\b", q, re.I
    ):
        if mask[m.start()]:
            continue
        d = 0
        for i in range(m.start()):
            if not mask[i]:
                if q[i] == "(":
                    d += 1
                elif q[i] == ")":
                    d -= 1
        if d == 0:
            parts.append(q[last : m.start()])
            last = m.end()
    if not parts:
        return
    parts.append(q[last:])

    def names(part: str) -> list[str] | None:
        sel = re.search(r"\bSELECT\s+(DISTINCT\s+)?(.*?)\s+FROM\b", part,
                        re.I | re.S)
        if not sel:
            return None
        out = []
        for item in _split_top_args(sel.group(2)):
            item = item.strip()
            am = re.search(r"\sAS\s+([A-Za-z_]\w*)\s*$", item, re.I)
            if am:
                out.append(am.group(1).lower())
            elif re.fullmatch(r"[A-Za-z_]\w*", item):
                out.append(item.lower())
            else:
                return None
        return out

    derived = [names(p) for p in parts]
    if any(d is None for d in derived):
        return
    first = derived[0]
    for other in derived[1:]:
        if other != first:
            raise StrictDialectError(
                f"Set operation column names must match: "
                f"{first} vs {other}"
            )


def _validate_array_literals(q: str) -> None:
    """Reference array literals hold LITERAL elements only
    (execute.unnest 'should reject non-literal elements')."""
    from .sqldialect import _LITERAL_BRACKET_KEYWORDS

    mask = _string_mask(q)
    for i, ch in enumerate(q):
        if ch != "[" or mask[i]:
            continue
        before = q[:i].rstrip()
        if before and (
            before[-1] in ")]'\"`" or re.search(r"[\w$]$", before)
            and re.search(r"([A-Za-z_]\w*)$", before).group(1).upper()
            not in _LITERAL_BRACKET_KEYWORDS
        ):
            continue  # subscript, not a literal
        depth = 0
        j = i
        while j < len(q):
            if q[j] == "[" and not mask[j]:
                depth += 1
            elif q[j] == "]" and not mask[j]:
                depth -= 1
                if depth == 0:
                    break
            j += 1
        body = q[i + 1 : j]
        # strip nested brackets and strings, then any identifier left
        # (except TRUE/FALSE/NULL) is a non-literal element
        stripped = re.sub(r"'(?:[^']|'')*'", "", body)
        stripped = re.sub(r"[\[\]]", "", stripped)
        for idm in re.finditer(r"[A-Za-z_]\w*", stripped):
            if idm.group(0).upper() not in ("TRUE", "FALSE", "NULL"):
                raise StrictDialectError(
                    f"Array literals support literal elements only, "
                    f'found "{idm.group(0)}" at position {i}'
                )


def validate_reference_sql(
    query: str,
    spark=None,
    tables: dict | None = None,
    functions: dict | None = None,
) -> None:
    """Raise StrictDialectError where the reference's parser/validator
    would reject the query. Call on the ORIGINAL query text, after
    fixture tables are registered (dtype checks), before rewrites."""
    _validate_arity(query, functions)
    _validate_dotted_from(query)
    _validate_literal_args(query)
    _validate_cast_targets(query)
    _validate_intervals(query)
    _validate_order_by_star(query)
    _validate_joins(query, tables)
    _validate_lateral(query)
    _validate_table_functions(query)
    _validate_unnest_alias_select(query)
    _validate_window_groupby(query)
    _validate_setop_names(query)
    _validate_array_literals(query)
    if spark is not None:
        _validate_string_arg_types(query, spark)
        _validate_dotted_refs(query, spark, tables)


# --- runtime guards (per-row value rules) ----------------------------------

def strict_guards(q: str) -> str:
    """Rewrite per-row value rules the validator can't decide statically
    into JVM-side ``raise_error`` branches — SUBSTRING start/length from
    a column (reference throws with the offending row index;
    strings.js). Applied only in strict mode."""

    def _wrap_substring(args):
        if len(args) not in (2, 3):
            return None
        x, s = args[0], args[1]
        if len(args) == 2:
            if _literal_int(s) is not None:
                return None  # statically validated
            return (
                f"(CASE WHEN ({s}) IS NOT NULL AND ({s}) < 1 THEN "
                f"raise_error(concat('SUBSTRING start position must be "
                f">= 1, got ', CAST(({s}) AS STRING))) "
                f"ELSE substring(({x}), ({s})) END)"
            )
        ln = args[2]
        if _literal_int(s) is not None and _literal_int(ln) is not None:
            return None
        return (
            f"(CASE WHEN ({s}) IS NOT NULL AND ({s}) < 1 THEN "
            f"raise_error(concat('SUBSTRING start position must be >= 1,"
            f" got ', CAST(({s}) AS STRING))) "
            f"WHEN ({ln}) IS NOT NULL AND ({ln}) < 0 THEN "
            f"raise_error(concat('SUBSTRING length must be >= 0, got ', "
            f"CAST(({ln}) AS STRING))) "
            f"ELSE substring(({x}), ({s}), ({ln})) END)"
        )

    from .sqldialect import _rewrite_wrap_call

    return _rewrite_wrap_call(
        q,
        re.compile(r"\b(?:SUBSTRING|SUBSTR)\s*\(", re.I),
        _wrap_substring,
    )
