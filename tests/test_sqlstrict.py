"""Strict-mode validation (functions/sqlstrict.py): the reference's
REJECTION surface, opt-in via ``execute_sql(..., strict=True)``.

Behavioral spec: reference src/validation/functions.js (arity table +
validateFunctionArgs), src/parse/primary.js:136-142 (cast targets),
src/parse/joins.js (join shapes), src/expression/strings.js (runtime
value guards). Each static rule is unit-pinned here; the end-to-end
error cases are additionally replayed by the conformance harness
(execute.errors.test.js floor in tests/test_ref_conformance.py)."""
import pytest

from squirreling_spark.functions.sqlstrict import (
    StrictDialectError,
    strict_guards,
    validate_reference_sql,
)


def _rejects(q, tables=None):
    with pytest.raises(StrictDialectError):
        validate_reference_sql(q, tables=tables)


def _accepts(q, tables=None):
    validate_reference_sql(q, tables=tables)


# --- arity (reference FUNCTION_SIGNATURES) ---------------------------------

@pytest.mark.parametrize(
    "q",
    [
        "SELECT TRIM(name, age) FROM users",
        "SELECT REPLACE(name, 'a') FROM users",
        "SELECT CONCAT() FROM users",
        "SELECT RANDOM(1) FROM users",
        "SELECT STRING_AGG(name) FROM users",
        "SELECT DATE_DIFF('day', a) AS d FROM events",
        "SELECT FLOOR(value, 2) FROM data",
        "SELECT CEIL(value, 2) FROM data",
        "SELECT LAG() OVER (ORDER BY id) FROM sales",
    ],
)
def test_arity_rejections(q):
    _rejects(q)


def test_arity_standard_forms_accepted():
    _accepts("SELECT TRIM(BOTH 'x' FROM name) FROM users")
    _accepts("SELECT POSITION('a' IN name) FROM users")
    _accepts("SELECT SUBSTRING(name FROM 2 FOR 3) FROM users")
    # ordered-set percentile: the ORDER BY expression is the 2nd arg
    _accepts(
        "SELECT PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY v) FROM data"
    )


def test_udf_names_exempt_from_arity():
    with pytest.raises(StrictDialectError):
        validate_reference_sql("SELECT TRIM(a, b, c) FROM t")
    validate_reference_sql(
        "SELECT TRIM(a, b, c) FROM t", functions={"trim": object()}
    )


# --- literal argument values ------------------------------------------------

@pytest.mark.parametrize(
    "q",
    [
        "SELECT SUBSTRING(name, 0, 3) FROM users",
        "SELECT SUBSTRING(name, 1, -1) FROM users",
        "SELECT LEFT(text, -1) FROM data",
        "SELECT RIGHT(text, -1) FROM data",
        "SELECT REGEXP_SUBSTR(text, '[a-z]+', 0) FROM data",
        "SELECT * FROM JSON_EACH('not valid json')",
        "SELECT * FROM JSON_EACH('42')",
    ],
)
def test_literal_value_rejections(q):
    _rejects(q)


def test_valid_literals_accepted():
    _accepts("SELECT SUBSTRING(name, 1, 3) FROM users")
    _accepts("SELECT * FROM JSON_EACH('[1, 2]')")
    _accepts("SELECT * FROM JSON_EACH('{\"a\": 1}')")


# --- cast targets / intervals ------------------------------------------------

def test_cast_target_allowlist():
    _rejects("SELECT CAST(age AS BINARY) FROM users")
    _accepts("SELECT CAST(age AS STRING) FROM users")


def test_interval_rules():
    _rejects("SELECT INTERVAL 1 DAY FROM users")  # standalone
    _rejects("SELECT CURRENT_DATE + INTERVAL 1 FORTNIGHT FROM users")
    _accepts("SELECT CURRENT_DATE + INTERVAL 1 DAY FROM users")
    _accepts("SELECT CURRENT_DATE - INTERVAL 3 MONTHS FROM users")


# --- query shapes -------------------------------------------------------------

def test_order_by_positional_star():
    _rejects("SELECT * FROM users ORDER BY 1")


def test_comma_and_cross_join_need_table_function():
    _rejects("SELECT * FROM t, labels", tables={"t": [], "labels": []})
    _rejects(
        "SELECT * FROM t CROSS JOIN labels",
        tables={"t": [], "labels": []},
    )
    _accepts("SELECT * FROM t, UNNEST(t.arr) AS u", tables={"t": []})
    _accepts(
        "SELECT * FROM t CROSS JOIN UNNEST(t.arr) AS u", tables={"t": []}
    )


def test_lateral_shapes():
    _rejects("SELECT id FROM t LATERAL EXPLODE(tags) e AS tag")
    _rejects("SELECT id FROM t LATERAL VIEW EXPLODE(tags) AS tag")
    _rejects("SELECT id FROM t LATERAL VIEW EXPLODE(tags) e")
    _accepts("SELECT id, tag FROM t LATERAL VIEW EXPLODE(tags) e AS tag")
    _accepts("SELECT id, tag FROM t LATERAL VIEW OUTER EXPLODE(tags) e AS tag")
    # explicit-LATERAL join form is ACCEPTED (execute.unnest.test.js)
    _accepts("SELECT t.id, u.x FROM t JOIN LATERAL UNNEST(t.arr) AS u(x) ON TRUE")


def test_table_function_position():
    _rejects("SELECT EXPLODE([1, 2, 3])")
    _accepts("SELECT * FROM UNNEST([1, 2, 3]) AS u")


def test_unnest_alias_is_not_a_column():
    _rejects("SELECT tc_item FROM t CROSS JOIN UNNEST(t.arr) AS tc_item")


def test_visible_tables_skips_spaced_table_function():
    """'FROM UNNEST (x)' — whitespace before the call paren — is a table
    function, not a table, so it must not appear in TableNotFound
    'Available tables' lists (r9 advice)."""
    from squirreling_spark.functions.sqlstrict import _visible_tables

    vis = _visible_tables(
        "SELECT * FROM UNNEST ([1, 2]) AS u", {"users": []}
    )
    assert "UNNEST" not in vis
    assert vis == ["users"]  # falls back to the table map


def test_window_groupby_exclusion():
    _rejects(
        "SELECT region, ROW_NUMBER() OVER (ORDER BY region) AS rn "
        "FROM sales GROUP BY region"
    )
    # window INSIDE a subquery combined with outer GROUP BY is fine
    _accepts(
        "SELECT region, COUNT(*) FROM (SELECT region, ROW_NUMBER() "
        "OVER (ORDER BY region) AS rn FROM sales) GROUP BY region"
    )


def test_setop_name_agreement():
    _rejects(
        "SELECT id AS a FROM users WHERE id = 1 "
        "UNION SELECT id AS b FROM users WHERE id = 2"
    )
    _accepts(
        "SELECT id AS a FROM users WHERE id = 1 "
        "UNION SELECT age AS a FROM users WHERE id = 2"
    )


def test_array_literal_elements():
    _rejects("SELECT [x + 1] AS arr FROM singleRow")
    _accepts("SELECT [1, 2, 3] AS arr FROM singleRow")


def test_dotted_from_table_requires_quotes():
    _rejects(
        "SELECT * FROM dataset.parquet",
        tables={"dataset.parquet": []},
    )


# --- runtime guards (strict_guards rewrite) ----------------------------------

def test_strict_guards_wraps_column_start():
    out = strict_guards("SELECT SUBSTRING('hello', val, 2) FROM data")
    assert "raise_error" in out
    assert "start position must be a positive integer" in out
    assert "SQL uses 1-based indexing" in out


def test_strict_guards_leaves_literal_calls_alone():
    q = "SELECT SUBSTRING(name, 1, 3) FROM users"
    assert strict_guards(q) == q
