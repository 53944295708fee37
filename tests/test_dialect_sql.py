"""Reference-dialect SQL through the headline ``execute_sql`` façade
(functions/sqldialect.py). Query strings are drawn from the reference's own
test shapes: test/execute/positional.test.js, test/execute/execute.json.test.js
(JSON_EACH in FROM), src/parse/tokenize.js:49-57 (``123n`` literals),
src/expression/binary.js:57-66 (case-insensitive LIKE)."""

import pytest

from squirreling_spark.engine import execute_sql
from squirreling_spark.functions.sqldialect import rewrite_reference_sql

TABLE_A = [
    {"id": 1, "name": "Alice"},
    {"id": 2, "name": "Bob"},
    {"id": 3, "name": "Charlie"},
]
TABLE_B = [
    {"code": "A", "value": 100},
    {"code": "B", "value": 200},
    {"code": "C", "value": 300},
]


def _rows(res):
    return res.collect()


# ---------------------------------------------------------------------------
# POSITIONAL JOIN (reference test/execute/positional.test.js)
# ---------------------------------------------------------------------------


def test_positional_join_equal_lengths(spark):
    res = execute_sql(
        spark,
        "SELECT tableA.name, tableB.code FROM tableA POSITIONAL JOIN tableB",
        tables={"tableA": TABLE_A, "tableB": TABLE_B},
    )
    rows = sorted(_rows(res), key=lambda r: r["name"])
    assert rows == [
        {"name": "Alice", "code": "A"},
        {"name": "Bob", "code": "B"},
        {"name": "Charlie", "code": "C"},
    ]


def test_positional_join_right_shorter_pads_null(spark):
    res = execute_sql(
        spark,
        "SELECT tableA.name, tableB.code FROM tableA POSITIONAL JOIN tableB",
        tables={"tableA": TABLE_A, "tableB": TABLE_B[:1]},
    )
    rows = sorted(_rows(res), key=lambda r: r["name"])
    assert rows == [
        {"name": "Alice", "code": "A"},
        {"name": "Bob", "code": None},
        {"name": "Charlie", "code": None},
    ]


def test_positional_join_left_shorter_pads_null(spark):
    res = execute_sql(
        spark,
        "SELECT tableA.name, tableB.code FROM tableA POSITIONAL JOIN tableB",
        tables={"tableA": TABLE_A[:1], "tableB": TABLE_B},
    )
    rows = sorted(_rows(res), key=lambda r: (r["name"] is None, r["code"]))
    assert rows == [
        {"name": "Alice", "code": "A"},
        {"name": None, "code": "B"},
        {"name": None, "code": "C"},
    ]


def test_positional_join_select_star_hides_rn(spark):
    res = execute_sql(
        spark,
        "SELECT * FROM tableA POSITIONAL JOIN tableB",
        tables={"tableA": TABLE_A, "tableB": TABLE_B},
    )
    assert res.columns == ["id", "name", "code", "value"]
    assert len(_rows(res)) == 3


def test_positional_join_with_aliases(spark):
    res = execute_sql(
        spark,
        "SELECT a.name, b.code FROM tableA a POSITIONAL JOIN tableB AS b",
        tables={"tableA": TABLE_A, "tableB": TABLE_B},
    )
    assert len(_rows(res)) == 3


# ---------------------------------------------------------------------------
# JSON_EACH in FROM (reference test/execute/execute.json.test.js:621-770)
# ---------------------------------------------------------------------------


def test_json_each_object(spark):
    res = execute_sql(
        spark, "SELECT * FROM JSON_EACH('{\"a\":1,\"b\":2}')"
    )
    rows = sorted(_rows(res), key=lambda r: r["key"])
    assert rows == [
        {"key": "a", "value": "1"},
        {"key": "b", "value": "2"},
    ]


def test_json_each_array_integer_keys(spark):
    res = execute_sql(spark, "SELECT * FROM JSON_EACH('[10,20,30]')")
    rows = sorted(_rows(res), key=lambda r: r["key"])
    assert rows == [
        {"key": "0", "value": "10"},
        {"key": "1", "value": "20"},
        {"key": "2", "value": "30"},
    ]


def test_json_each_lateral_over_table(spark):
    data = [
        {"id": 1, "json": '{"x": "foo", "y": "bar"}'},
        {"id": 2, "json": '{"z": "baz"}'},
    ]
    res = execute_sql(
        spark,
        "SELECT data.id, j.key, j.value FROM data "
        "JOIN JSON_EACH(data.json) AS j ON TRUE",
        tables={"data": data},
    )
    rows = sorted(_rows(res), key=lambda r: (r["id"], r["key"]))
    assert rows == [
        {"id": 1, "key": "x", "value": "foo"},
        {"id": 1, "key": "y", "value": "bar"},
        {"id": 2, "key": "z", "value": "baz"},
    ]


def test_json_each_null_and_empty_yield_zero_rows(spark):
    assert _rows(execute_sql(spark, "SELECT * FROM JSON_EACH(NULL)")) == []
    assert _rows(execute_sql(spark, "SELECT * FROM JSON_EACH('{}')")) == []
    assert _rows(execute_sql(spark, "SELECT * FROM JSON_EACH('[]')")) == []


def test_json_each_column_aliases(spark):
    res = execute_sql(
        spark,
        "SELECT k, v FROM JSON_EACH('{\"a\":1,\"b\":2}') AS j(k, v)",
    )
    rows = sorted(_rows(res), key=lambda r: r["k"])
    assert rows == [{"k": "a", "v": "1"}, {"k": "b", "v": "2"}]


def test_json_each_where_filter_numeric(spark):
    res = execute_sql(
        spark,
        "SELECT key, value FROM JSON_EACH('[10,20,30,40]') WHERE value > 15",
    )
    assert sorted(r["value"] for r in _rows(res)) == ["20", "30", "40"]


def test_json_each_aggregate_with_cast(spark):
    res = execute_sql(
        spark,
        "SELECT SUM(CAST(value AS BIGINT)) AS total "
        "FROM JSON_EACH('[1,2,3,4]')",
    )
    assert _rows(res) == [{"total": 10}]


def test_json_each_nested_values_stay_json_text(spark):
    res = execute_sql(
        spark, "SELECT * FROM JSON_EACH('{\"a\":{\"x\":1},\"b\":[1,2]}')"
    )
    rows = {r["key"]: r["value"] for r in _rows(res)}
    assert rows["a"] == '{"x":1}'
    assert rows["b"] == "[1,2]"


# ---------------------------------------------------------------------------
# BigInt literals ``123n`` (reference src/parse/tokenize.js:49-57)
# ---------------------------------------------------------------------------


def test_bigint_literal_select_and_where(spark):
    res = execute_sql(
        spark,
        "SELECT 9007199254740993n AS big, id FROM t WHERE id < 3n",
        tables={"t": [{"id": 1}, {"id": 2}, {"id": 3}]},
    )
    rows = sorted(_rows(res), key=lambda r: r["id"])
    assert rows == [
        {"big": 9007199254740993, "id": 1},
        {"big": 9007199254740993, "id": 2},
    ]


def test_bigint_literal_not_rewritten_inside_strings(spark):
    res = execute_sql(spark, "SELECT '12n' AS s, 5n AS v")
    assert _rows(res) == [{"s": "12n", "v": 5}]


# ---------------------------------------------------------------------------
# Case-insensitive LIKE (reference src/expression/binary.js:57-66)
# ---------------------------------------------------------------------------


def test_like_ci_mode(spark):
    tables = {"w": [{"s": "Hello"}, {"s": "WORLD"}, {"s": "hollow"}]}
    ci = execute_sql(
        spark, "SELECT s FROM w WHERE s LIKE 'h%'", tables=tables,
        like_mode="ci",
    )
    assert sorted(r["s"] for r in _rows(ci)) == ["Hello", "hollow"]
    ansi = execute_sql(
        spark, "SELECT s FROM w WHERE s LIKE 'h%'", tables=tables
    )
    assert sorted(r["s"] for r in _rows(ansi)) == ["hollow"]


def test_like_ci_does_not_touch_literals(spark):
    q = rewrite_reference_sql("SELECT 'I LIKE cats' AS s", like_mode="ci")
    assert q == "SELECT 'I LIKE cats' AS s"


# ---------------------------------------------------------------------------
# Rewriter unit behavior
# ---------------------------------------------------------------------------


def test_rewrite_noop_on_plain_sql(spark):
    q = "SELECT a, b FROM t WHERE a > 1 ORDER BY b"
    assert rewrite_reference_sql(q, spark=spark) == q


def test_rewrite_positional_inside_string_untouched(spark):
    q = "SELECT 'x POSITIONAL JOIN y' AS s"
    assert rewrite_reference_sql(q, spark=spark) == q


def test_positional_join_composes_with_where(spark):
    res = execute_sql(
        spark,
        "SELECT tableA.name, tableB.value FROM tableA POSITIONAL JOIN "
        "tableB WHERE tableB.value > 150",
        tables={"tableA": TABLE_A, "tableB": TABLE_B},
    )
    assert sorted(r["value"] for r in _rows(res)) == [200, 300]


# ---------------------------------------------------------------------------
# FROM-first queries + ANSI double-quoted identifiers
# (reference test/parse/parse.test.js:6, :267)
# ---------------------------------------------------------------------------


def test_from_first_query(spark):
    res = execute_sql(
        spark, "FROM tableA WHERE id > 1",
        tables={"tableA": TABLE_A},
    )
    assert res.columns == ["id", "name"]
    assert sorted(r["id"] for r in _rows(res)) == [2, 3]


def test_from_first_with_order_limit(spark):
    res = execute_sql(
        spark, "FROM tableB ORDER BY value DESC LIMIT 2",
        tables={"tableB": TABLE_B},
    )
    assert [r["value"] for r in _rows(res)] == [300, 200]


def test_from_first_not_triggered_mid_query(spark):
    q = "SELECT id FROM tableA"
    assert rewrite_reference_sql(q, spark=spark) == q


def test_double_quoted_identifiers_ansi_mode(spark):
    res = execute_sql(
        spark,
        'SELECT "col name" AS v FROM t WHERE "col name" > 1',
        tables={"t": [{"col name": 1}, {"col name": 5}]},
        ident_quotes="ansi",
    )
    assert _rows(res) == [{"v": 5}]


def test_double_quotes_stay_strings_by_default(spark):
    res = execute_sql(spark, 'SELECT "hello" AS s')
    assert _rows(res) == [{"s": "hello"}]


def test_extract_tables_handles_reference_dialect(spark):
    """extractTables must work on the same reference-syntax queries
    execute_sql accepts (reference src/index.js extractTables)."""
    from squirreling_spark.engine import extract_tables

    assert extract_tables(
        spark, "SELECT a.name FROM tblA a POSITIONAL JOIN tblB"
    ) == ["tblA", "tblB"]
    assert extract_tables(
        spark,
        "SELECT j.key FROM data JOIN JSON_EACH(data.json) AS j ON TRUE",
    ) == ["data"]
    assert extract_tables(spark, "FROM docs WHERE x > 1n") == ["docs"]
    import pytest

    with pytest.raises(ValueError, match="parse error"):
        extract_tables(spark, "NOT SQL AT ALL ;;;")


# ---------------------------------------------------------------------------
# Property tests: the rewriter must never touch string-literal content
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_LIT_CHARS = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="'\"`\\\x00"
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=150, deadline=None)
@given(
    lit=_LIT_CHARS,
    num=st.integers(min_value=0, max_value=2**60),
    like_ci=st.booleans(),
)
def test_rewrite_preserves_string_literals(lit, num, like_ci):
    """Whatever a single-quoted literal contains — POSITIONAL JOIN,
    JSON_EACH(, 123n, LIKE — the rewriter must pass it through verbatim,
    while the SAME constructs outside the literal rewrite."""
    q = f"SELECT '{lit}' AS s, {num}n AS v FROM t WHERE a LIKE 'x%'"
    out = rewrite_reference_sql(
        q, like_mode="ci" if like_ci else "ansi"
    )
    assert f"'{lit}'" in out                       # literal untouched
    assert f"CAST({num} AS BIGINT)" in out         # literal outside rewritten
    if like_ci:
        assert "ILIKE 'x%'" in out
    else:
        assert "LIKE 'x%'" in out


@settings(max_examples=100, deadline=None)
@given(lit=_LIT_CHARS)
def test_rewrite_noop_without_dialect_constructs(lit):
    """A plain-Spark query (no reference-only syntax outside strings)
    must come back byte-identical, whatever its literals contain."""
    q = f"SELECT col, '{lit}' AS s FROM tbl WHERE col > 5 ORDER BY col"
    assert rewrite_reference_sql(q) == q


# ---------------------------------------------------------------------------
# Round-5 session-2 rewrites: direct unit pins (the conformance floors in
# test_ref_conformance.py cover these end-to-end; these are the fast
# regression signal)
# ---------------------------------------------------------------------------


def test_array_literals_and_subscripts(spark):
    res = execute_sql(
        spark, "SELECT [1, 2, 3] AS arr, [10, 20, 30][2] AS third"
    )
    rows = _rows(res)
    assert rows == [{"arr": [1, 2, 3], "third": 30}]  # 0-based like JS


def test_unnest_from_and_lateral(spark):
    rows = _rows(
        execute_sql(spark, "SELECT * FROM UNNEST([1, 2, 3]) AS t")
    )
    assert rows == [{"unnest": 1}, {"unnest": 2}, {"unnest": 3}]
    t = [{"id": 1, "arr": [10, 20]}, {"id": 2, "arr": [30]}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT t.id, u.x FROM t JOIN UNNEST(t.arr) AS u(x) ON TRUE",
            tables={"t": t},
        )
    )
    assert sorted((r["id"], r["x"]) for r in rows) == [
        (1, 10), (1, 20), (2, 30)
    ]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT t.id, u.x FROM t LEFT JOIN UNNEST(t.arr) AS u(x)"
            " ON TRUE",
            tables={"t": t + [{"id": 3, "arr": []}]},
        )
    )
    assert (3, None) in [(r["id"], r["x"]) for r in rows]


def test_derived_column_names(spark):
    users = [{"id": 1, "name": "A", "age": 30}]
    res = execute_sql(
        spark,
        "SELECT COUNT(*), UPPER(name), age + 1, CAST(age AS INT) FROM"
        " users GROUP BY name, age",
        tables={"users": users},
    )
    assert res.columns == ["count_all", "upper_name", "age_+_1", "age_as_int"]


def test_date_dialect_semantics(spark):
    data = [{"a": "2023-12-31", "b": "2024-01-01"}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT DATE_DIFF('year', a, b) AS y, DATE_DIFF('day', a, b)"
            " AS d FROM data",
            tables={"data": data},
        )
    )
    assert rows == [{"y": 1, "d": 1}]  # boundary crossing, not full year
    ev = [{"ts": "2024-07-15T14:30:45"}]  # a Monday
    rows = _rows(
        execute_sql(
            spark,
            "SELECT EXTRACT(DOW FROM ts) AS dow, EXTRACT(SECOND FROM ts)"
            " AS s FROM events",
            tables={"events": ev},
        )
    )
    assert rows == [{"dow": 1, "s": 45}]  # JS getUTCDay; integer seconds


def test_loose_group_by_retry(spark):
    users = [
        {"id": 1, "name": "A", "city": "X"},
        {"id": 2, "name": "B", "city": "X"},
    ]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT city, name, COUNT(*) AS n FROM users GROUP BY city",
            tables={"users": users},
        )
    )
    assert rows[0]["n"] == 2 and rows[0]["name"] in ("A", "B")


def test_memory_table_void_columns(spark):
    data = [{"a": 10, "b": None}, {"a": 3, "b": None}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT a + b AS s, concat(b, 'x') AS c FROM data",
            tables={"data": data},
        )
    )
    assert all(r["s"] is None and r["c"] is None for r in rows)


# ---------------------------------------------------------------------------
# Alias-chaining retries (execute.group / execute.orderby shapes Spark
# rejects natively; engine retries with sqldialect.inline_select_aliases)
# ---------------------------------------------------------------------------


def test_group_by_chained_alias_retry(spark):
    data = [{"x": 1}, {"x": 1}, {"x": 2}]
    rows = sorted(
        _rows(
            execute_sql(
                spark,
                "SELECT x AS a, a + 1 AS b, COUNT(*) AS count FROM data "
                "GROUP BY b ORDER BY b",
                tables={"data": data},
            )
        ),
        key=lambda r: r["b"],
    )
    assert rows == [
        {"a": 1, "b": 2, "count": 2},
        {"a": 2, "b": 3, "count": 1},
    ]


def test_order_by_aggregate_of_alias_retry(spark):
    users = [{"age": 30}, {"age": 35}, {"age": 30}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT age AS a, COUNT(*) AS count FROM users GROUP BY a "
            "ORDER BY SUM(a)",
            tables={"users": users},
        )
    )
    assert [r["a"] for r in rows] == [35, 30]  # sums 35 < 60


def test_loose_group_by_star_expansion(spark):
    data = [{"id": 1, "age": 20, "city": "X"}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT * FROM data WHERE age > 100 GROUP BY city",
            tables={"data": data},
        )
    )
    assert rows == []  # empty groups, reference returns zero rows
    rows = _rows(
        execute_sql(
            spark,
            "SELECT * FROM data GROUP BY city",
            tables={"data": data},
        )
    )
    assert rows == [{"id": 1, "age": 20, "city": "X"}]


# ---------------------------------------------------------------------------
# Dtype-directed dynamic-typing rewrites (_rewrite_dynamic_typing): the
# reference evaluates per row (evaluate.js:574-633); with a statically
# typed column the whole-column outcome is decidable at rewrite time.
# ---------------------------------------------------------------------------


def test_dynamic_typing_array_fn_on_scalar_is_null(spark):
    data = [{"n": 5, "arr": [1, 2]}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT ARRAY_CONTAINS(n, 1) AS c, ARRAY_LENGTH(n) AS l "
            "FROM data",
            tables={"data": data},
        )
    )
    assert rows == [{"c": None, "l": None}]


def test_dynamic_typing_len_dispatches_arrays_to_size(spark):
    # reference LEN is array-only (evaluate.js:574-576): arrays get their
    # length, any non-array input is NULL — including strings.
    data = [{"arr": [1, 2, 3], "s": "ab"}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT LEN(arr) AS la, LEN(s) AS ls FROM data",
            tables={"data": data},
        )
    )
    assert rows == [{"la": 3, "ls": None}]


def test_dynamic_typing_array_length_beyond_depth_is_null(spark):
    data = [{"arr": [1, 2, 3]}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT ARRAY_LENGTH(arr, 2) AS l2, ARRAY_LENGTH(arr, 1) AS l1 "
            "FROM data",
            tables={"data": data},
        )
    )
    assert rows == [{"l2": None, "l1": 3}]


def test_correlated_unnest_count_decorrelates(spark):
    # reference execute.subquery.test.js:567 — a correlated UNNEST below a
    # scalar subquery's FROM is two correlation levels deep (Spark reaches
    # one); COUNT(*) over an unconditioned cross product factorizes to
    # |rest| * size(arr) and hoists out (sqldialect.
    # _rewrite_correlated_unnest_count)
    outers = [{"id": 1, "arr": [10, 20]}, {"id": 2, "arr": [30]},
              {"id": 3, "arr": []}]
    t = [{"k": 1}, {"k": 2}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT o.id, (SELECT COUNT(*) FROM t JOIN UNNEST(o.arr) "
            "AS u(x) ON TRUE) AS n FROM outers AS o ORDER BY o.id",
            tables={"outers": outers, "t": t},
        )
    )
    assert rows == [{"id": 1, "n": 4}, {"id": 2, "n": 2}, {"id": 3, "n": 0}]


def test_correlated_unnest_count_guards(spark):
    # a LOCAL unnest (qualifier resolves inside the subquery) must not be
    # hoisted — the factorization only applies to correlated refs
    outers = [{"id": 1, "arr": [10, 20]}, {"id": 2, "arr": [30]}]
    t = [{"k": 1}, {"k": 2}]
    rows = _rows(
        execute_sql(
            spark,
            "SELECT (SELECT COUNT(*) FROM outers o2 JOIN UNNEST(o2.arr) "
            "AS u(x) ON TRUE) AS n FROM t",
            tables={"outers": outers, "t": t},
        )
    )
    assert rows == [{"n": 3}, {"n": 3}]
