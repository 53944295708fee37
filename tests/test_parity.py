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


NO_ORACLE = sorted(set(inventory.QUERIES) - set(inventory.ORACLES))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(name, spark, sf01):
    df = inventory.QUERIES[name](spark, sf01)
    rows = df.collect()
    assert rows is not None and df.columns
