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


def _edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (reference parseErrors.js:160-178)."""
    m, n = len(a), len(b)
    dp = list(range(m + 1))
    for j in range(1, n + 1):
        prev = dp[0]
        dp[0] = j
        for i in range(1, m + 1):
            tmp = dp[i]
            dp[i] = prev if a[i - 1] == b[j - 1] else 1 + min(
                prev, dp[i], dp[i - 1]
            )
            prev = tmp
    return dp[m]


def suggest_functions(
    name: str, extra: list[str] | None = None
) -> list[str]:
    """Did-you-mean candidates for an unknown function name — the
    reference's suggestFunctions (validation/parseErrors.js:128-154):
    names sharing the underscore prefix (JSON_, ST_) plus names within
    edit distance max(3, len/2), ranked by distance, top 4. ``extra``
    adds session-registered names (UDFs) to the candidate pool."""
    upper = name.upper()
    pool: list[str] = list(FUNCTION_SIGNATURES)
    for e in extra or []:
        eu = e.upper()
        if eu not in pool and not eu.startswith("_"):
            pool.append(eu)
    idx = upper.find("_")
    prefix = upper[: idx + 1] if idx > 0 else ""
    max_dist = max(3, len(upper) // 2)
    scored = []
    for n in pool:
        d = _edit_distance(upper, n)
        if d <= max_dist or (prefix and n.startswith(prefix)):
            scored.append((d, n))
    scored.sort(key=lambda t: t[0])
    return [n for _, n in scored[:4]]


_TABLE_FUNCS = {
    "UNNEST", "JSON_EACH", "VALUES", "LATERAL", "GENERATE_SERIES", "RANGE",
}


def _cte_names(q: str, mask) -> set[str]:
    names: set[str] = set()
    for pat in (
        r"\bWITH\s+(?:RECURSIVE\s+)?([A-Za-z_]\w*)\s*(?:\([^)]*\))?\s*AS\s*\(",
        r",\s*([A-Za-z_]\w*)\s*(?:\([^)]*\))?\s*AS\s*\(",
    ):
        for m in re.finditer(pat, q, re.I):
            if not mask[m.start()]:
                names.add(m.group(1).lower())
    return names


def _validate_known_tables(q: str, tables) -> None:
    """Reference TableNotFoundError (validation/tables.js:166-211): a bare
    FROM/JOIN table name absent from the table map raises with the
    available-table list. Only enforced when a table map is given —
    catalog-backed sessions resolve names Spark-side."""
    if not tables:
        return
    mask = _string_mask(q)
    known = {t.lower() for t in tables}
    known |= _cte_names(q, mask)
    # FROM is also a keyword inside EXTRACT/TRIM/SUBSTRING/POSITION/
    # OVERLAY calls — mask those call spans out (a subquery nested inside
    # one would only be under-checked, never falsely rejected)
    call_mask = bytearray(len(q))
    for cm in re.finditer(
        r"\b(?:EXTRACT|TRIM|SUBSTRING|SUBSTR|POSITION|OVERLAY)\s*\(",
        q, re.I,
    ):
        if mask[cm.start()]:
            continue
        open_idx = q.index("(", cm.end() - 1)
        try:
            end = _balanced_arg(q, open_idx)
        except Exception:  # noqa: BLE001 — unbalanced: Spark will error
            continue
        for i in range(cm.start(), end):
            call_mask[i] = 1
    for m in re.finditer(
        r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)(?![\w.])", q, re.I
    ):
        if mask[m.start()] or call_mask[m.start()]:
            continue
        # IS [NOT] DISTINCT FROM x — comparison operator, not a table ref
        before = q[: m.start()].rstrip()
        if re.search(r"\bDISTINCT$", before, re.I):
            continue
        name = m.group(1)
        if name.upper() in _TABLE_FUNCS:
            continue
        if re.match(r"\s*\(", q[m.end():]):
            continue  # table function / callable — not a table-map lookup
        if name.lower() not in known:
            raise StrictDialectError(
                f'Table "{name}" not found. Available tables: '
                + ", ".join(tables)
            )


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
            # reference message shapes: strings.js, asserted verbatim by
            # execute.errors.test.js
            s = _literal_int(args[1])
            if s is not None and s < 1:
                raise StrictDialectError(
                    "SUBSTRING(string, start[, length]): start position "
                    f"must be a positive integer, got {s}. SQL uses "
                    f"1-based indexing. (at position {pos})"
                )
            if len(args) == 3:
                ln = _literal_int(args[2])
                if ln is not None and ln < 0:
                    raise StrictDialectError(
                        "SUBSTRING(string, start[, length]): length must "
                        f"be a non-negative integer, got {ln} "
                        f"(at position {pos})"
                    )
        if name in ("LEFT", "RIGHT") and len(args) == 2:
            ln = _literal_int(args[1])
            if ln is not None and ln < 0:
                raise StrictDialectError(
                    f"{name}(string, length): length must be a "
                    f"non-negative integer, got {ln} (at position {pos})"
                )
        if name == "SPLIT_PART" and len(args) == 3:
            ix = _literal_int(args[2])
            if ix == 0:
                raise StrictDialectError(
                    "SPLIT_PART(string, delimiter, index): index must be "
                    "a non-zero integer, got 0. Field indexes are "
                    f"1-based. (at position {pos})"
                )
        if name in ("REGEXP_SUBSTR", "REGEXP_EXTRACT") and len(args) >= 3:
            p = _literal_int(args[2])
            if p is not None and p < 1:
                raise StrictDialectError(
                    f"{name}: position must be a positive integer, "
                    f"got {p} (at position {pos})"
                )
            if len(args) >= 4:
                occ = _literal_int(args[3])
                if occ is not None and occ < 1:
                    raise StrictDialectError(
                        f"{name}: occurrence must be a positive integer, "
                        f"got {occ} (at position {pos})"
                    )
        if name == "REGEXP_REPLACE" and len(args) >= 4:
            p = _literal_int(args[3])
            if p is not None and p < 1:
                raise StrictDialectError(
                    f"{name}: position must be a positive integer, "
                    f"got {p} (at position {pos})"
                )
            if len(args) >= 5:
                occ = _literal_int(args[4])
                if occ is not None and occ < 0:
                    raise StrictDialectError(
                        f"{name}: occurrence must be a non-negative "
                        f"integer, got {occ} (at position {pos})"
                    )
        if name.startswith("REGEXP_") and len(args) >= 2:
            # statically-invalid literal regex pattern (reference throws
            # 'invalid regex pattern' per row; strict throws up front)
            pat = args[1].strip()
            if len(pat) >= 2 and pat[0] == "'" and pat[-1] == "'":
                try:
                    re.compile(pat[1:-1].replace("''", "'"))
                except re.error:
                    raise StrictDialectError(
                        f"{name}: invalid regex pattern {pat} "
                        f"(at position {pos})"
                    ) from None
        if name == "JSON_EACH" and len(args) >= 1:
            a = args[0].strip()
            if len(a) >= 2 and a[0] == "'" and a[-1] == "'":
                import json as _json

                try:
                    v = _json.loads(a[1:-1].replace("''", "'"))
                except ValueError:
                    raise StrictDialectError(
                        f"JSON_EACH(value): invalid JSON string "
                        f"(at position {pos})"
                    ) from None
                if not isinstance(v, (list, dict)):
                    raise StrictDialectError(
                        f"JSON_EACH(value): argument must be a JSON "
                        f"object or array, got {a} (at position {pos})"
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
        if isinstance(dt, (T.StructType, T.MapType)):
            kind = "object"
        elif name == "OCTET_LENGTH" and isinstance(dt, T.ArrayType):
            kind = "object"
        if kind:
            # reference message shape (strings.js, asserted verbatim)
            if name == "OCTET_LENGTH":
                sig, want = "OCTET_LENGTH(string)", "string"
            else:
                sig, want = "LENGTH(string)", "string or array"
            raise StrictDialectError(
                f"{sig}: expected {want}, got {kind}. Use CAST to convert"
                f" to a string first. (at position {pos})"
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
                # position = offset of the UNIT token in the original
                # query (reference parse-layer convention)
                raise StrictDialectError(
                    f"Invalid interval unit {um.group(1)} at position "
                    f"{m.end() + um.start(1)}. Valid values: "
                    "DAY, MONTH, YEAR, HOUR, MINUTE, SECOND"
                )
        # standalone INTERVAL: only valid directly after + or - (date
        # arithmetic) — a select item starting with INTERVAL is an error
        before = q[: m.start()].rstrip()
        if not before or before[-1] not in "+-":
            raise StrictDialectError(
                f"INTERVAL can only be used with date arithmetic (+ or -) "
                f"— standalone INTERVAL at position {m.start()}"
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


_NOT_ALIAS = (
    "ON", "WHERE", "GROUP", "ORDER", "LEFT", "RIGHT", "FULL",
    "INNER", "CROSS", "JOIN", "POSITIONAL", "LIMIT", "HAVING",
    "UNION", "EXCEPT", "INTERSECT", "LATERAL", "USING", "OFFSET",
    "NATURAL", "SEMI", "ANTI",
)

# FROM/JOIN item with optional alias; the alias alternative is a negative
# lookahead over clause keywords so a following keyword is NOT consumed
# (a consuming match would swallow the next JOIN and skip its table)
_FROM_ITEM_RE = re.compile(
    r"\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?!(?:"
    + "|".join(_NOT_ALIAS)
    + r")\b)([A-Za-z_]\w*))?",
    re.I,
)


def _visible_tables(q: str, tables) -> list[str]:
    """FROM/JOIN names as the query sees them — an alias REPLACES its
    base name (reference + Spark both hide the original). Falls back to
    the table-map keys when no FROM target parses."""
    mask = _string_mask(q)
    vis: list[str] = []
    for m in _FROM_ITEM_RE.finditer(q):
        if mask[m.start()]:
            continue
        # table function (UNNEST/JSON_EACH), not a table; whitespace is
        # tolerated before the paren ("FROM UNNEST (x)"), matching
        # _validate_known_tables (r9 advice)
        if re.match(r"\s*\(", q[m.end(1):]):
            continue
        name = m.group(2) or m.group(1)
        if name not in vis:
            vis.append(name)
    return vis or list(tables or {})


def _from_scope(q: str, tables) -> set[str]:
    """Table names and aliases visible to dotted references. A base name
    with an alias is HIDDEN (both the reference and Spark reject
    ``FROM users u ... users.id``)."""
    scope = {t for t in (tables or {})}
    mask = _string_mask(q)
    aliased_bases: set[str] = set()
    unaliased: set[str] = set()
    for m in _FROM_ITEM_RE.finditer(q):
        if mask[m.start()]:
            continue
        alias = m.group(2)
        if alias:
            scope.add(alias)
            aliased_bases.add(m.group(1))
        else:
            scope.add(m.group(1))
            unaliased.add(m.group(1))
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
    # an aliased base name is hidden even when it is a table-map key —
    # unless the same table is ALSO referenced unaliased elsewhere
    return scope - (aliased_bases - unaliased)


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
            # reference parse-layer text (execute.dot tests, verbatim)
            raise StrictDialectError(
                f'Unexpected "." in "{m.group(1)}". If this is an '
                f'identifier, use double quotes: "{m.group(1)}" '
                f"(at position {m.start()})"
            )


def _validate_dotted_refs(q: str, spark, tables) -> None:
    """Unquoted ``a.b`` resolves ONLY when ``a`` is a table/alias in
    scope or a struct column; the reference rejects dotted access to
    FLAT columns named 'a.b' unless quoted (execute.dot tests)."""
    from pyspark.sql import types as T

    from .sqldialect import _ref_dtype

    mask = _string_mask(q)
    scope = _from_scope(q, tables)
    # double-dotted chains a.b.c: the reference parser stops at the second
    # dot — 'Unexpected "." in "b.c"' (execute.dot tests) — unless the
    # head is a struct-typed column or in-scope table (chained access)
    for m in re.finditer(
        r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", q
    ):
        if mask[m.start()] or q[max(0, m.start() - 1)] in ".]'\"`":
            continue
        head = m.group(1)
        if head in scope or isinstance(
            _ref_dtype(spark, head), T.StructType
        ):
            continue
        raise StrictDialectError(
            f'Unexpected "." in "{m.group(2)}.{m.group(3)}". If this is '
            f'an identifier, use double quotes: '
            f'"{m.group(2)}.{m.group(3)}" (at position {m.start()})'
        )
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
        # reference TableNotFoundError with qualified usage
        # (validation/tables.js:166-211, asserted by execute.dot tests)
        avail = ", ".join(_visible_tables(q, tables))
        raise StrictDialectError(
            f'Table "{qual}" not found in "{qual}.{m.group(2)}". '
            f"Available tables: {avail} (at position {m.start()})"
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
        # position = offset of the FOUND token (reference parse-layer
        # convention, asserted by execute.unnest tests)
        raise StrictDialectError(
            f'Expected VIEW after "LATERAL" but found "{m.group(1)}" '
            f"at position {m.start(1)}"
        )
    for m in re.finditer(r"\bLATERAL\s+VIEW\s+(?:OUTER\s+)?(\w+)\s*\(",
                         q, re.I):
        if mask[m.start()]:
            continue
        if m.group(1).upper() not in (
            "EXPLODE", "POSEXPLODE", "EXPLODE_OUTER", "POSEXPLODE_OUTER",
            "INLINE", "INLINE_OUTER", "JSON_TUPLE", "STACK", "UNNEST",
            "JSON_EACH",
        ):
            raise StrictDialectError(
                "LATERAL VIEW requires a table function like EXPLODE, "
                f'got "{m.group(1)}" at position {m.start(1)}'
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
    # column-alias-list arity: UNNEST exposes ONE column, JSON_EACH two
    # (key, value) — reference parse errors, asserted verbatim
    for m in re.finditer(
        r"\b(UNNEST|JSON_EACH)\s*\(", q, re.I
    ):
        if mask[m.start()]:
            continue
        open_idx = q.index("(", m.end() - 1)
        try:
            end = _balanced_arg(q, open_idx)
        except Exception:  # noqa: BLE001 — unbalanced: Spark will error
            continue
        am = re.match(
            r"\s*(?:AS\s+)?[A-Za-z_]\w*\s*\(([^)]*)\)", q[end:], re.I
        )
        if not am:
            continue
        n_alias = len([c for c in am.group(1).split(",") if c.strip()])
        if m.group(1).upper() == "UNNEST" and n_alias > 1:
            raise StrictDialectError(
                "UNNEST produces a single column; only one column alias "
                f"is allowed (at position {m.start()})"
            )
        if m.group(1).upper() == "JSON_EACH" and n_alias > 2:
            raise StrictDialectError(
                "JSON_EACH produces at most 2 columns (key, value); too "
                f"many column aliases (at position {m.start()})"
            )


def _validate_unnest_alias_select(q: str, tables=None) -> None:
    """``UNNEST(x) AS u`` exposes the column as ``u.unnest`` — selecting
    bare ``u`` is an unknown column in the reference
    (execute.unnest.test.js:402-411); the error lists the qualified
    columns in scope."""
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
        if bare not in aliases:
            continue
        avail: list[str] = []
        for v in _visible_tables(q, tables):
            tv = (tables or {}).get(v)
            cols = (
                list(tv.columns) if hasattr(tv, "columns")
                else list(tv[0].keys())
                if isinstance(tv, list) and tv else []
            )
            avail += [f"{v}.{c}" for c in cols]
        avail += [f"{a}.unnest" for a in aliases]
        raise StrictDialectError(
            f'Column "{bare}" not found. Available columns: '
            + ", ".join(avail)
        )


_WINDOW_ONLY_FUNCS = (
    "ROW_NUMBER", "RANK", "DENSE_RANK", "LAG", "LEAD", "NTILE",
    "PERCENT_RANK", "CUME_DIST", "FIRST_VALUE", "LAST_VALUE", "NTH_VALUE",
)


_AGGREGATE_FUNCS = {
    "COUNT", "SUM", "AVG", "MIN", "MAX", "COUNTIF", "COUNT_IF",
    "ARRAY_AGG", "STRING_AGG", "GROUP_CONCAT", "LISTAGG", "STDDEV",
    "STDDEV_SAMP", "STDDEV_POP", "VARIANCE", "VAR_SAMP", "VAR_POP",
    "MEDIAN", "PERCENTILE_CONT", "PERCENTILE_DISC", "APPROX_QUANTILE",
    "JSON_GROUP_ARRAY", "JSON_GROUP_OBJECT", "JSON_ARRAYAGG",
    "JSON_OBJECTAGG", "BOOL_AND", "BOOL_OR",
    "ANY_VALUE", "FIRST", "LAST", "MODE", "CORR", "COVAR_SAMP",
    "COVAR_POP", "BIT_AND", "BIT_OR", "BIT_XOR", "EVERY", "SOME", "ANY",
}


def _iter_calls_span(q: str):
    """Like _iter_calls but also yields the index just past the closing
    paren, for validating call SUFFIXES (WITHIN GROUP / FILTER)."""
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
        yield m.group(1).upper(), m.start(), args, arg_end


def _validate_aggregate_modifiers(q: str) -> None:
    """WITHIN GROUP is PERCENTILE_CONT-only (and excludes the positional
    value-argument form); FILTER attaches to aggregates only — reference
    validation messages asserted verbatim by execute.aggregate tests."""
    for name, pos, args, end in _iter_calls_span(q):
        tail = q[end:]
        if re.match(r"\s*WITHIN\s+GROUP\b", tail, re.I):
            if name != "PERCENTILE_CONT":
                raise StrictDialectError(
                    "WITHIN GROUP is only supported for PERCENTILE_CONT, "
                    f'not "{name}" (at position {pos})'
                )
            if len(args) >= 2:
                raise StrictDialectError(
                    "PERCENTILE_CONT: cannot combine WITHIN GROUP with a "
                    f"value argument (at position {pos})"
                )
        if (
            re.match(r"\s*FILTER\s*\(", tail, re.I)
            and name not in _AGGREGATE_FUNCS
        ):
            raise StrictDialectError(
                "FILTER cannot be applied to non-aggregate function "
                f'"{name}" (at position {pos})'
            )


def _validate_window_groupby(q: str) -> None:
    mask = _string_mask(q)

    def depth_at(idx: int) -> int:
        d = 0
        for i in range(idx):
            if not mask[i]:
                if q[i] == "(":
                    d += 1
                elif q[i] == ")":
                    d -= 1
        return d

    def depth0(pat):
        for m in re.finditer(pat, q, re.I):
            if not mask[m.start()] and depth_at(m.start()) == 0:
                return True
        return False

    # window-only functions need OVER (reference parse error, verbatim)
    for m in re.finditer(
        r"\b(" + "|".join(_WINDOW_ONLY_FUNCS) + r")\s*\(", q, re.I
    ):
        if mask[m.start()]:
            continue
        open_idx = q.index("(", m.end() - 1)
        try:
            end = _balanced_arg(q, open_idx)
        except Exception:  # noqa: BLE001
            continue
        if not re.match(r"\s*OVER\b", q[end:], re.I):
            raise StrictDialectError(
                f"{m.group(1).upper()}() requires an OVER clause at "
                f"position {m.start()}"
            )
        # window functions are select-list/ORDER BY only — a WHERE-clause
        # window call is rejected with the function named (reference)
        wm = None
        for w in re.finditer(r"\bWHERE\b", q[: m.start()], re.I):
            if not mask[w.start()] and depth_at(w.start()) == depth_at(
                m.start()
            ):
                wm = w
        if wm is not None and not re.search(
            r"\b(?:GROUP\s+BY|ORDER\s+BY|HAVING|SELECT)\b",
            q[wm.end(): m.start()], re.I,
        ):
            raise StrictDialectError(
                f"Window function {m.group(1).upper()} is not allowed in "
                "WHERE clause"
            )
    if depth0(r"\bOVER\s*\(") and depth0(r"\bGROUP\s+BY\b"):
        raise StrictDialectError(
            "Window functions are not supported in queries with "
            "aggregation (GROUP BY)"
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
                f"Set operation operands must have identical columns: "
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
                    f"Array literal elements must be constant literals — "
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
    _validate_known_tables(query, tables)
    _validate_literal_args(query)
    _validate_cast_targets(query)
    _validate_intervals(query)
    _validate_order_by_star(query)
    _validate_joins(query, tables)
    _validate_lateral(query)
    _validate_table_functions(query)
    _validate_unnest_alias_select(query, tables)
    _validate_window_groupby(query)
    _validate_aggregate_modifiers(query)
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
        start_msg = (
            "'SUBSTRING(string, start[, length]): start position must be"
            " a positive integer, got '"
        )
        start_tail = "'. SQL uses 1-based indexing.'"
        if len(args) == 2:
            if _literal_int(s) is not None:
                return None  # statically validated
            return (
                f"(CASE WHEN ({s}) IS NOT NULL AND ({s}) < 1 THEN "
                f"raise_error(concat({start_msg}, "
                f"CAST(({s}) AS STRING), {start_tail})) "
                f"ELSE substring(({x}), ({s})) END)"
            )
        ln = args[2]
        if _literal_int(s) is not None and _literal_int(ln) is not None:
            return None
        return (
            f"(CASE WHEN ({s}) IS NOT NULL AND ({s}) < 1 THEN "
            f"raise_error(concat({start_msg}, "
            f"CAST(({s}) AS STRING), {start_tail})) "
            f"WHEN ({ln}) IS NOT NULL AND ({ln}) < 0 THEN "
            f"raise_error(concat('SUBSTRING(string, start[, length]): "
            f"length must be a non-negative integer, got ', "
            f"CAST(({ln}) AS STRING))) "
            f"ELSE substring(({x}), ({s}), ({ln})) END)"
        )

    from .sqldialect import _rewrite_wrap_call

    return _rewrite_wrap_call(
        q,
        re.compile(r"\b(?:SUBSTRING|SUBSTR)\s*\(", re.I),
        _wrap_substring,
    )
