"""SQL-callable reference function pack for ``engine.execute_sql``.

The reference exposes dynamically-typed JSON helpers (JSON_VALUE returns
whatever the path points at — string, number, bool, object;
src/expression/evaluate.js:636-676) and GeoJSON-object spatial functions
(src/spatial). A Spark column has ONE type, so these register as UDFs with
the JSON-text convention: values that aren't plain strings are returned
JSON-encoded (a caller casts or ``from_json``s as needed); geometry flows
as GeoJSON/WKT text (functions/spatial.py's existing convention).

These are the COMPATIBILITY surface — row-at-a-time Python UDFs, the slow
path by design. Pipelines that care about throughput use the JVM-side
equivalents (`get_json_object`, `from_json`, queries_extras.json_pack);
spatial joins use operators/spatial_join.py's grid-banded path rather than
per-row predicates.

Registration is idempotent per session (keyed on an attribute tag) and
shadowing is intentional: a session-registered function wins over Spark's
builtin of the same name (verified for json_array_length), which lets the
pack widen builtins to the reference's dynamic-typing rules (e.g.
JSON_ARRAY_LENGTH over an ARRAY column, not just a JSON string).
"""
from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
)


def _jsonable(v: Any) -> Any:
    """Row/struct/array inputs → plain JSON-able Python values."""
    if hasattr(v, "asDict"):  # pyspark Row
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _parse_json_arg(v: Any) -> Any:
    """Reference JSON-arg coercion: strings must parse as JSON (invalid →
    error, evaluate.js:540-549); objects/arrays pass through."""
    if v is None:
        return None
    if isinstance(v, str):
        return json.loads(v)  # raises on invalid, like the reference
    return _jsonable(v)


def _encode(v: Any) -> str | None:
    """Result encoding: plain strings stay raw; everything else is JSON
    text (the comparator / caller decodes)."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    return json.dumps(v)


def _navigate(current: Any, path: str) -> Any:
    """Reference path navigation ("$.a.b[0]" or "a.b[0]",
    evaluate.js:661-676)."""
    import re as _re

    norm = path[1:] if path.startswith("$") else path
    for seg in _re.findall(r"\.?([^.\[]+)|\[(\d+)\]", norm):
        key, idx = seg
        if current is None:
            return None
        if idx:
            if not isinstance(current, list):
                return None
            i = int(idx)
            current = current[i] if i < len(current) else None
        else:
            if not isinstance(current, dict):
                return None
            current = current.get(key)
    return current


_REF_TYPE_NAMES = {
    "int": "number",
    "float": "number",
    "bool": "boolean",
    "str": "string",
    "list": "array",
    "dict": "object",
}


def _json_value(j: Any, path: Any) -> str | None:
    if j is None or path is None:
        return None
    # reference message shapes: evaluate.js:540-549 (invalid JSON) and
    # :653-659 (non-object first arg) — asserted verbatim by
    # test/execute/execute.errors.test.js
    try:
        v = _parse_json_arg(j)
    except (ValueError, TypeError) as exc:
        raise ValueError(
            "JSON_VALUE(expression, path): invalid JSON string. "
            "First argument must be valid JSON."
        ) from exc
    if not isinstance(v, (dict, list)):
        tname = _REF_TYPE_NAMES.get(type(j).__name__, type(j).__name__)
        raise ValueError(
            "JSON_VALUE(expression, path): first argument must be JSON "
            f"string or object, got {tname}"
        )
    return _encode(_navigate(v, str(path)))


def _json_type(j: Any) -> str | None:
    if j is None:
        return None
    try:
        v = _parse_json_arg(j)
    except (ValueError, TypeError) as exc:
        raise ValueError(
            "JSON_TYPE(value): invalid JSON string. Argument must be "
            "valid JSON."
        ) from exc
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _json_valid(j: Any) -> bool | None:
    if j is None:
        return None
    if not isinstance(j, str):
        return False
    try:
        json.loads(j)
        return True
    except (ValueError, TypeError):
        return False


def _json_keys(j: Any):
    if j is None:
        return None
    try:
        v = _parse_json_arg(j)
    except (ValueError, TypeError) as exc:
        raise ValueError(
            "JSON_KEYS(value): invalid JSON string. Argument must be "
            "valid JSON."
        ) from exc
    if not isinstance(v, dict):
        return None
    return list(v.keys())


def _json_array_length(j: Any):
    if j is None:
        return None
    try:
        v = _parse_json_arg(j)
    except (ValueError, TypeError) as exc:
        raise ValueError(
            "JSON_ARRAY_LENGTH(array): invalid JSON string"
        ) from exc
    if not isinstance(v, list):
        return None
    return len(v)


def _json_object(*args: Any) -> str:
    # reference message shapes (execute.errors.test.js asserts verbatim)
    if len(args) % 2 != 0:
        raise ValueError(
            "JSON_OBJECT(key1, value1[, ...]): requires an even number of"
            " arguments (key-value pairs)"
        )
    out = {}
    for i in range(0, len(args), 2):
        if args[i] is None:
            raise ValueError(
                "JSON_OBJECT(key1, value1[, ...]): key cannot be null. All"
                " keys must be non-null values."
            )
        out[str(args[i])] = _jsonable(args[i + 1])
    return json.dumps(out)


_TAG = "_squirreling_ref_funcs"


def register_reference_functions(spark) -> None:
    """Idempotently register the reference's SQL function pack (JSON +
    spatial) into the session.

    The idempotency tag lives on the SESSION, not the SparkContext:
    ``spark.newSession()`` shares the context but gets a fresh function
    registry, so a context-level tag would skip registration for every
    session after the first (json/spatial conformance would collapse in
    any isolated-session harness)."""
    if getattr(spark, _TAG, False):
        return
    setattr(spark, _TAG, True)

    from squirreling_spark.functions.spatial import register_spatial

    register_spatial(spark)

    reg = spark.udf.register
    for name in ("json_value", "json_query", "json_extract"):
        # identical in the reference (evaluate.js:636)
        reg(name, _json_value, StringType())
    reg("json_type", _json_type, StringType())
    reg("json_valid", _json_valid, BooleanType())
    reg("json_keys", _json_keys, ArrayType(StringType()))
    reg("json_array_length", _json_array_length, LongType())
    reg("json_object", _json_object, StringType())
    reg("ref_regexp_replace", _regexp_replace_occ, StringType())


def _regexp_replace_occ(s, pattern, repl, position, occurrence):
    """REGEXP_REPLACE with 1-based position + nth-occurrence (reference
    regexp.js:102-160; occurrence 0 = replace all). Registered under a
    distinct name — the 3/4-arg forms stay on Spark's JVM builtin."""
    import re as _re

    if s is None or pattern is None or repl is None:
        return None
    pos = 1 if position is None else int(position)
    occ = 0 if occurrence is None else int(occurrence)
    if pos < 1:
        raise ValueError(f"position must be a positive integer, got {position}")
    if occ < 0:
        raise ValueError(
            f"occurrence must be a non-negative integer, got {occurrence}"
        )
    prefix, search = s[: pos - 1], s[pos - 1:]
    java_repl = _re.sub(r"\$(\d)", r"\\\1", repl)
    if occ == 0:
        return prefix + _re.sub(pattern, java_repl, search)
    count = 0

    def _one(m):
        nonlocal count
        count += 1
        return m.expand(java_repl) if count == occ else m.group(0)

    return prefix + _re.sub(pattern, _one, search)
