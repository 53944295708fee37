"""Dialect shim tests: the reference's JS semantics (loose equality,
NULL-comparison→false, case-insensitive LIKE, Number() coercion)."""

from pyspark.sql import functions as F

from squirreling_spark.functions.dialect import (
    cmp_null_false,
    js_div,
    js_number,
    like_ci,
    loose_eq,
    soft_cast,
)


def _vals(spark, col):
    df = spark.createDataFrame([(1,)], ["x"]).select(col.alias("v"))
    return df.collect()[0]["v"]


def test_loose_eq(spark):
    df = spark.createDataFrame(
        [("5", 5), ("5.0", 5), ("a", 5), (None, None)],
        ["s", "n"],
    )
    got = [r["e"] for r in df.select(loose_eq("s", "n").alias("e")).collect()]
    assert got == [True, True, False, True]


def test_cmp_null_false(spark):
    df = spark.createDataFrame([(None,)], "x: int")
    row = df.select(
        cmp_null_false("x", "=", F.lit(1)).alias("eq"),
        cmp_null_false("x", "<", F.lit(1)).alias("lt"),
    ).collect()[0]
    assert row["eq"] is False and row["lt"] is False


def test_like_ci(spark):
    df = spark.createDataFrame([("Hello World",)], ["s"])
    assert df.select(like_ci("s", "%hello%").alias("m")).collect()[0]["m"]


def test_js_number(spark):
    df = spark.createDataFrame(
        [("42",), ("4.5",), ("true",), ("false",), ("abc",)], ["s"]
    )
    got = [r["n"] for r in df.select(js_number("s").alias("n")).collect()]
    assert got == [42.0, 4.5, 1.0, 0.0, None]


def test_js_div_by_zero(spark):
    df = spark.createDataFrame([(1.0, 0.0), (6.0, 2.0)], ["a", "b"])
    got = [r["d"] for r in df.select(js_div("a", "b").alias("d")).collect()]
    assert got == [None, 3.0]


def test_soft_cast(spark):
    df = spark.createDataFrame([("abc",), ("12",)], ["s"])
    got = [r["c"] for r in df.select(soft_cast("s", "int").alias("c")).collect()]
    assert got == [None, 12]
