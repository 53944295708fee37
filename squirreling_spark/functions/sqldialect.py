"""Reference-dialect SQL front end: a thin pre-parse rewrite so SQL written
for the reference engine runs through ``engine.execute_sql`` unchanged.

The reference's grammar accepts four things Spark's parser rejects:

- ``POSITIONAL JOIN`` (reference src/parse/joins.js:219-241, DuckDB-style
  row-position zip with NULL padding, src/execute/join.js:176-215)
- ``JSON_EACH(expr)`` as a FROM-clause table function, standalone or
  laterally joined ``JOIN JSON_EACH(t.col) AS j ON TRUE``
  (src/execute/execute.js:193-242)
- BigInt literals ``123n`` (src/parse/tokenize.js:49-57)
- case-insensitive ``LIKE`` by default (src/expression/binary.js:57-66)

Design: rewrite the query TEXT before Spark parses it, mapping each
construct onto the operator implementations that already exist
(`operators/positional_join.py`, `operators/json_each.py`,
`functions/dialect.like_ci`). The rewriter is string-literal aware (a
``POSITIONAL JOIN`` inside a quoted string is untouched) but is not a full
parser — it targets the reference's tested query shapes, which are all
single-level SELECTs.

Semantics notes (documented divergences, all at the type edge where a
dynamically-typed JS engine meets SQL):

- JSON_EACH emits ``key``/``value`` as STRING on both the object and array
  arms (the reference yields JS numbers for array indices / numeric
  values; one SQL column needs one type). Numeric comparisons still work
  through Spark's implicit casts; aggregate with an explicit CAST.
- JSON_EACH of NULL / invalid / scalar JSON yields zero rows (the
  reference raises on invalid input; ``from_json`` is forgiving).
- POSITIONAL JOIN output order follows each input's physical row order
  (same caveat as DuckDB: meaningful for freshly-scanned sorted sources);
  at 100 TB the numbering is the window-free two-level scheme of
  ``operators/positional_join.py`` — no single-task global window.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import SparkSession

from squirreling_spark.operators.positional_join import _RN, _with_rn

# Runtime object-vs-array dispatch for JSON_EACH: one expression yielding
# array<struct<key,value>> that `inline` / LATERAL VIEW explodes JVM-side
# (no Python boundary; scales linearly like operators/json_each.py).
_JE_DISPATCH = (
    "CASE WHEN ({x}) IS NULL THEN "
    "CAST(array() AS array<struct<key:string,value:string>>) "
    "WHEN startswith(ltrim(CAST(({x}) AS STRING)), '[') THEN "
    "transform(from_json(CAST(({x}) AS STRING), 'array<string>'), "
    "(v, i) -> struct(CAST(i AS STRING) AS key, v AS value)) "
    "ELSE transform(map_entries(from_json(CAST(({x}) AS STRING), "
    "'map<string,string>')), e -> struct(e.key AS key, e.value AS value)) "
    "END"
)


def _string_mask(q: str) -> list[bool]:
    """Per-character mask: True where the char sits inside a quoted region
    ('...' with '' escapes, "..." identifiers, `...` identifiers)."""
    mask = [False] * len(q)
    i, n = 0, len(q)
    while i < n:
        ch = q[i]
        if ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if q[j] == ch:
                    if ch == "'" and j + 1 < n and q[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i, min(j + 1, n)):
                mask[k] = True
            i = j + 1
        else:
            i += 1
    return mask


def _sub_outside_strings(q: str, pattern: re.Pattern, repl) -> str:
    """re.sub that skips matches starting inside string literals."""
    mask = _string_mask(q)
    out, last = [], 0
    for m in pattern.finditer(q):
        if mask[m.start()]:
            continue
        out.append(q[last : m.start()])
        out.append(repl(m))
        last = m.end()
    out.append(q[last:])
    return "".join(out)


_FROM_FIRST_RE = re.compile(r"^\s*FROM\b", re.I)


def _rewrite_from_first(q: str) -> str:
    """DuckDB-style FROM-first query (reference test/parse/parse.test.js:6
    — ``FROM tbl [WHERE ...]`` parses as ``SELECT * FROM tbl ...``)."""
    m = _FROM_FIRST_RE.match(q)
    if not m:
        return q
    return q[: m.start()] + "SELECT * " + q[m.end() - 4 :]


_DQUOTE_RE = re.compile(r'"((?:[^"]|"")*)"')


def _rewrite_double_quoted_idents(q: str) -> str:
    """ANSI double-quoted identifiers → Spark backticks (the reference
    treats ``"name with spaces"`` as an identifier, parse.test.js:267;
    Spark reads double quotes as string literals). Only applied under
    ``ident_quotes="ansi"`` — in the default dialect '"..."' stays a
    Spark string literal."""
    out, last = [], 0
    # process left-to-right, skipping single-quoted strings manually
    i, n = 0, len(q)
    while i < n:
        ch = q[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if q[j] == "'":
                    if j + 1 < n and q[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if ch == '"':
            m = _DQUOTE_RE.match(q, i)
            if m:
                out.append(q[last : i])
                ident = m.group(1).replace('""', '"').replace("`", "``")
                out.append(f"`{ident}`")
                last = m.end()
                i = m.end()
                continue
        i += 1
    out.append(q[last:])
    return "".join(out)


_BIGINT_RE = re.compile(r"(?<![\w$.])(\d+)n\b")


def _rewrite_bigint_literals(q: str) -> str:
    """``123n`` → ``CAST(123 AS BIGINT)`` (reference BigInt literal)."""
    return _sub_outside_strings(
        q, _BIGINT_RE, lambda m: f"CAST({m.group(1)} AS BIGINT)"
    )


_LIKE_RE = re.compile(r"\bLIKE\b", re.I)


def _rewrite_like_ci(q: str) -> str:
    """LIKE → ILIKE (reference default; `functions/dialect.like_ci`)."""
    return _sub_outside_strings(q, _LIKE_RE, lambda m: "ILIKE")


def _balanced_arg(q: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx (string-aware)."""
    mask = _string_mask(q)
    depth = 0
    for i in range(open_idx, len(q)):
        if mask[i]:
            continue
        if q[i] == "(":
            depth += 1
        elif q[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in JSON_EACH argument")


_JE_RE = re.compile(r"\bJSON_EACH\s*\(", re.I)
_JE_ALIAS_RE = re.compile(
    r"\s*(?:AS\s+)?([A-Za-z_]\w*)\s*(?:\(\s*([A-Za-z_]\w*)"
    r"\s*(?:,\s*([A-Za-z_]\w*))?\s*\))?",
    re.I,
)
_KEYWORDS = {
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "ON", "JOIN", "UNION",
    "INTERSECT", "EXCEPT", "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
    "LATERAL", "OFFSET", "QUALIFY", "WINDOW", "AS", "SELECT", "FROM",
}


def _rewrite_json_each_from(q: str) -> str:
    """Rewrite FROM-clause JSON_EACH into Spark constructs:

    - ``FROM JSON_EACH(x) [AS j[(k[, v])]]`` →
      ``FROM (SELECT key AS k, value AS v FROM
      (SELECT inline(<dispatch>)) __sq_je_i) AS j``
    - ``<t> JOIN JSON_EACH(x) [AS j[(k[, v])]] ON TRUE`` →
      ``<t> LATERAL VIEW inline(<dispatch>) j AS k, v``
      (zero JSON rows → row dropped, matching JOIN ON TRUE over an empty
      table function).
    """
    while True:
        mask = _string_mask(q)
        m = None
        for cand in _JE_RE.finditer(q):
            if not mask[cand.start()]:
                # Only FROM-position occurrences: preceding non-space token
                # must be FROM, JOIN, or ','. (Scalar JSON_EACH in SELECT is
                # an error in the reference too.)
                before = q[: cand.start()].rstrip()
                if re.search(r"(\bFROM|\bJOIN|,)$", before, re.I):
                    m = cand
                    break
        if m is None:
            return q
        open_idx = q.index("(", m.start())
        arg_end = _balanced_arg(q, open_idx)
        arg = q[open_idx + 1 : arg_end - 1].strip()
        dispatch = _JE_DISPATCH.format(x=arg)

        # Optional alias / column aliases after the call.
        alias, k_name, v_name = None, "key", "value"
        tail_end = arg_end
        am = _JE_ALIAS_RE.match(q, arg_end)
        if am and am.group(1) and am.group(1).upper() not in _KEYWORDS:
            alias = am.group(1)
            if am.group(2):
                k_name = am.group(2)
            if am.group(3):
                v_name = am.group(3)
            tail_end = am.end()

        before = q[: m.start()].rstrip()
        is_lateral = bool(re.search(r"\bJOIN$", before, re.I))
        if is_lateral:
            # `<t> JOIN JSON_EACH(expr) AS j ON TRUE` — consume the JOIN
            # keyword and the trailing ON TRUE, emit LATERAL VIEW.
            join_kw = re.search(r"\bJOIN\s*$", q[: m.start()], re.I)
            on_m = re.match(r"\s*ON\s+TRUE", q[tail_end:], re.I)
            on_end = tail_end + (on_m.end() if on_m else 0)
            alias = alias or f"__sq_je_{uuid.uuid4().hex[:8]}"
            q = (
                q[: join_kw.start()]
                + f" LATERAL VIEW inline({dispatch}) {alias} "
                + f"AS {k_name}, {v_name} "
                + q[on_end:]
            )
        else:
            alias = alias or f"__sq_je_{uuid.uuid4().hex[:8]}"
            inner = f"__sq_jei_{uuid.uuid4().hex[:8]}"
            q = (
                q[: m.start()]
                + f"(SELECT key AS {k_name}, value AS {v_name} FROM "
                + f"(SELECT inline({dispatch})) {inner}) AS {alias}"
                + q[tail_end:]
            )


_KW_GUARD = (
    r"(?!(?:WHERE|GROUP|ORDER|HAVING|LIMIT|ON|JOIN|UNION|INTERSECT|EXCEPT"
    r"|POSITIONAL|FULL|LEFT|RIGHT|INNER|CROSS|OFFSET|QUALIFY|WINDOW)\b)"
)
_POS_RE = re.compile(
    r"\bFROM\s+([A-Za-z_][\w.]*)"
    rf"(?:\s+(?:AS\s+)?{_KW_GUARD}([A-Za-z_]\w*))?"
    r"\s+POSITIONAL\s+JOIN\s+([A-Za-z_][\w.]*)"
    rf"(?:\s+(?:AS\s+)?{_KW_GUARD}([A-Za-z_]\w*))?",
    re.I,
)
_STAR_RE = re.compile(r"(\bSELECT\s+)\*", re.I)


def _rewrite_positional_join(
    q: str,
    spark: SparkSession,
    pos_order: dict[str, list[str]] | None = None,
) -> str:
    """``FROM a POSITIONAL JOIN b`` → full outer join of the two sides'
    row-numbered views on the window-free global row number
    (`operators/positional_join._with_rn` — parallel range numbering, no
    single-task WindowExec). ``SELECT *`` is expanded to the explicit
    column list so the internal row-number column stays hidden."""
    mask = _string_mask(q)
    m = _POS_RE.search(q)
    while m and mask[m.start()]:
        m = _POS_RE.search(q, m.end())
    if not m:
        return q
    lt, la, rt, ra = m.group(1), m.group(2), m.group(3), m.group(4)
    la = la or lt.split(".")[-1]
    ra = ra or rt.split(".")[-1]
    lv = f"__sq_posv_{uuid.uuid4().hex[:8]}"
    rv = f"__sq_posv_{uuid.uuid4().hex[:8]}"
    pos_order = pos_order or {}
    _with_rn(spark.table(lt), pos_order.get(lt)).createOrReplaceTempView(lv)
    _with_rn(spark.table(rt), pos_order.get(rt)).createOrReplaceTempView(rv)
    frag = (
        f"FROM {lv} AS {la} FULL OUTER JOIN {rv} AS {ra} "
        f"ON {la}.{_RN} = {ra}.{_RN}"
    )
    q = q[: m.start()] + frag + q[m.end() :]
    # Expand a bare SELECT * (the rn columns must not leak into it).
    star = _STAR_RE.search(q)
    if star and not _string_mask(q)[star.start()]:
        lcols = [c for c in spark.table(lt).columns]
        rcols = [c for c in spark.table(rt).columns]
        cols = ", ".join(
            [f"{la}.{c}" for c in lcols] + [f"{ra}.{c}" for c in rcols]
        )
        q = q[: star.start()] + star.group(1) + cols + q[star.end() :]
    return q


def rewrite_reference_sql(
    query: str,
    spark: SparkSession | None = None,
    like_mode: str = "ansi",
    pos_order: dict[str, list[str]] | None = None,
    ident_quotes: str = "spark",
) -> str:
    """Apply the reference-dialect rewrites. The three syntax extensions
    (POSITIONAL JOIN, FROM-clause JSON_EACH, ``123n``) are not valid Spark
    SQL, so rewriting them is always safe; ``like_mode="ci"`` opts into the
    reference's case-insensitive LIKE (off by default — ANSI semantics and
    the DuckDB oracle agree on case-sensitive LIKE).

    ``pos_order`` maps table names to sort keys defining row position for
    POSITIONAL JOIN. The reference (single-node, ordered arrays) zips
    physical row order; on a distributed engine that order is only
    well-defined given an explicit key — without a hint we zip the current
    scan order (deterministic for single-split files, the DuckDB caveat)."""
    if ident_quotes == "ansi" and '"' in query:
        query = _rewrite_double_quoted_idents(query)
    query = _rewrite_from_first(query)
    up = query.upper()
    if "POSITIONAL" in up:
        if spark is None:
            raise ValueError("POSITIONAL JOIN rewrite needs a SparkSession")
        # Iterate: each pass rewrites the first positional join found.
        prev = None
        while prev != query:
            prev = query
            query = _rewrite_positional_join(query, spark, pos_order)
            up = query.upper()
    if "JSON_EACH" in up:
        query = _rewrite_json_each_from(query)
    if _BIGINT_RE.search(query):
        query = _rewrite_bigint_literals(query)
    if like_mode == "ci":
        query = _rewrite_like_ci(query)
    return query
