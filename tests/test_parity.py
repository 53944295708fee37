"""Parametrized parity gate: every inventory query with an oracle must
hash-match DuckDB at sf0.01 — the same check the driver runs."""

import pytest

from squirreling_spark import inventory
from tests.parity import compare

inventory.load_all()

WITH_ORACLE = sorted(inventory.ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf01):
    fn = inventory.QUERIES[name]
    errs = compare(name, fn, inventory.ORACLES[name], spark, sf01)
    assert not errs, "\n".join(errs)


# --- Gate self-tests: the round-1 driver failure classes must be caught ---
# (the pre-round-2 gate normalized Decimal->float / list->tuple and used
# Python ==, green-lighting queries the driver's hash rejected)


def test_gate_rejects_int_vs_float():
    """Spark BIGINT vs DuckDB DOUBLE (floor/ceil, HUGEINT count_if) must
    mismatch even though values are numerically equal."""
    import pandas as pd

    from tests.parity import _canon, _canon_cells

    a = _canon_cells(_canon(pd.DataFrame({"x": pd.array([3, 4], dtype="int64")})))
    b = _canon_cells(_canon(pd.DataFrame({"x": pd.array([3.0, 4.0], dtype="float64")})))
    assert a != b


def test_gate_rejects_list_columns():
    """A raw array column must hard-fail like the driver's canonicalizer."""
    import pandas as pd
    import pytest as _pytest

    from tests.parity import ListColumnError, _canon, _canon_cells

    df = pd.DataFrame({"x": [[1, 2], [3]], "y": [1, 2]})
    with _pytest.raises(ListColumnError):
        _canon_cells(_canon(df))


def test_gate_rejects_decimal_leak():
    """A Decimal reaching the output (instead of cast to double) must not
    silently equal the float the oracle produces."""
    import decimal

    import pandas as pd

    from tests.parity import _canon, _canon_cells

    a = _canon_cells(_canon(pd.DataFrame({"x": [decimal.Decimal("1.5")]})))
    b = _canon_cells(_canon(pd.DataFrame({"x": [1.5]})))
    assert a != b


def test_gate_accepts_date_vs_midnight_timestamp():
    """Round-1 calibration: Spark DATE vs DuckDB datetime64-midnight hashed
    equal in the driver (date_funcs green)."""
    import datetime

    import pandas as pd

    from tests.parity import _canon, _canon_cells

    a = _canon_cells(_canon(pd.DataFrame({"x": [datetime.date(1995, 1, 1)]})))
    b = _canon_cells(
        _canon(pd.DataFrame({"x": pd.to_datetime(["1995-01-01"])}))
    )
    assert a == b


NO_ORACLE = sorted(set(inventory.QUERIES) - set(inventory.ORACLES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(name, spark, sf01):
    df = inventory.QUERIES[name](spark, sf01)
    rows = df.collect()
    assert rows is not None and df.columns
