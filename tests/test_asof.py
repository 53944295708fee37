"""AS-OF join unit tests: backward/forward, ties, unmatched, multi-key."""

import datetime as dt

from squirreling_spark.operators.asof_join import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L10"), (1, _ts(20), "L20"), (2, _ts(5), "L5")],
        ["k", "ts", "lval"],
    )
    right = spark.createDataFrame(
        [(1, _ts(8), "R8"), (1, _ts(15), "R15"), (1, _ts(20), "R20"),
         (2, _ts(9), "R9")],
        ["k", "ts", "rval"],
    )
    return left, right


def test_backward_basic(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["lval"]): r["rval_right"]
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    # L10 ← R8; L20 ← R20 (equal ts is inclusive); L5 has no prior right
    assert out == {(1, "L10"): "R8", (1, "L20"): "R20", (2, "L5"): None}


def test_forward(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["lval"]): r["rval_right"]
        for r in asof_join(left, right, on="ts", by="k", direction="forward").collect()
    }
    assert out == {(1, "L10"): "R15", (1, "L20"): "R20", (2, "L5"): "R9"}


def test_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10), "L")], ["k1", "k2", "ts", "lval"]
    )
    right = spark.createDataFrame(
        [(1, "a", _ts(9), "match"), (1, "b", _ts(9), "wrong-key")],
        ["k1", "k2", "ts", "rval"],
    )
    rows = asof_join(left, right, on="ts", by=["k1", "k2"]).collect()
    assert rows[0]["rval_right"] == "match"
