"""UDF registry tests, including the reference's defining behavioral test:
expensive columns are evaluated only for rows that survive filters/limits
(reference test/execute/expensive.test.js:25-60 counts cell evaluations)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

from squirreling_spark.engine import execute_sql
from squirreling_spark.functions.registry import FunctionSpec, make_udf, register_functions


def test_sync_udf_in_sql(spark):
    register_functions(
        spark, {"SHOUT": FunctionSpec(apply=lambda s: s.upper() + "!", return_type=StringType())}
    )
    res = execute_sql(
        spark,
        "SELECT SHOUT(name) AS loud FROM people ORDER BY loud",
        tables={"people": [{"name": "ann"}, {"name": "bo"}]},
    )
    assert [r["loud"] for r in res.collect()] == ["ANN!", "BO!"]


def test_vectorized_udf(spark):
    spec = FunctionSpec(
        apply=lambda s: s * 2.0, return_type=DoubleType(), vectorized=True
    )
    register_functions(spark, {"DOUBLED": spec})
    res = execute_sql(
        spark,
        "SELECT DOUBLED(x) AS y FROM t ORDER BY y",
        tables={"t": [{"x": 1.5}, {"x": 2.5}]},
    )
    assert [r["y"] for r in res.collect()] == [3.0, 5.0]


def test_async_udf_batched(spark):
    async def llm_like(s):
        return f"<{s}>"

    register_functions(
        spark, {"ANNOTATE": FunctionSpec(apply=llm_like, return_type=StringType())}
    )
    res = execute_sql(
        spark,
        "SELECT ANNOTATE(name) AS tagged FROM people ORDER BY tagged",
        tables={"people": [{"name": "a"}, {"name": "b"}, {"name": "c"}]},
    )
    assert [r["tagged"] for r in res.collect()] == ["<a>", "<b>", "<c>"]


def test_expensive_udf_invocation_count(spark):
    """The reference's expensive.test.js, with a REAL invocation counter
    (Spark accumulator): an expensive UDF attached after a filter runs for
    exactly the surviving rows; a query not reading the UDF column runs it
    zero times (column pruning)."""
    sc = spark.sparkContext
    calls = sc.accumulator(0)

    def expensive(s):
        calls.add(1)
        return s + "!"

    from pyspark.sql.functions import udf

    exp_udf = udf(expensive, StringType()).asNondeterministic()
    df = spark.createDataFrame([(i, f"n{i}") for i in range(1000)], ["id", "name"])

    # (a) filter first → UDF evaluated only for survivors (collect, not
    # count — count() would prune the UDF column entirely, see (b))
    out = df.filter(F.col("id") >= 995).select("id", exp_udf("name").alias("x"))
    assert len(out.collect()) == 5
    assert calls.value == 5

    # (b) UDF column attached but never selected → pruned, zero evaluations
    calls2 = sc.accumulator(0)

    def expensive2(s):
        calls2.add(1)
        return s

    exp2 = udf(expensive2, StringType()).asNondeterministic()
    wide = df.withColumn("pricey", exp2("name"))
    assert wide.select("id").filter(F.col("id") < 10).count() == 10
    assert calls2.value == 0


def test_expensive_udf_not_pushed_into_scan(spark):
    """Plan discipline replacing reference lazy cells: an expensive
    (non-deterministic) UDF projected after a filter must stay above the
    filter in the optimized plan — rows removed by the filter are never
    evaluated."""
    expensive = FunctionSpec(
        apply=lambda s: s + "!", return_type=StringType(), expensive=True
    )
    udf = make_udf(expensive)
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], ["id", "name"]
    )
    out = df.filter(F.col("id") >= 98).select("id", udf(F.col("name")).alias("x"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the UDF Project must sit ABOVE the Filter (appear before it in the
    # plan tree printout)
    assert plan.index("pythonUDF") < plan.index("Filter") or "BatchEvalPython" not in plan
    assert sorted(r["x"] for r in out.collect()) == ["name98!", "name99!"]


def test_fixed_arity_enforced_at_analysis_time(spark):
    """Reference validates arguments {min,max} at parse time
    (src/validation/functions.js:262-294): Spark binds Python UDFs late,
    so the structured arity error surfaces at call time, naming the
    function and the accepted count."""
    import pytest

    from squirreling_spark.functions.registry import register_functions

    register_functions(
        spark,
        {"two_arg_fn": FunctionSpec(apply=lambda a, b: f"{a}|{b}")},
    )
    df = spark.createDataFrame([("x", "y")], ["a", "b"])
    df.createOrReplaceTempView("t_arity")
    assert spark.sql(
        "SELECT two_arg_fn(a, b) AS r FROM t_arity"
    ).collect()[0]["r"] == "x|y"
    with pytest.raises(Exception) as e:
        spark.sql("SELECT two_arg_fn(a) FROM t_arity").collect()
    assert "two_arg_fn" in str(e.value)


def test_ranged_arity_raises_udf_arity_error(spark):
    """min/max-bounded varargs UDF: wrong arity raises a structured
    UdfArityError naming the function and the expected range."""
    import pytest

    from squirreling_spark.functions.registry import UdfArityError

    spec = FunctionSpec(
        apply=lambda *args: "|".join(str(a) for a in args),
        min_args=1,
        max_args=3,
    )
    fn = make_udf(spec, name="joiner")
    df = spark.createDataFrame([("x", "y")], ["a", "b"])
    assert df.select(fn("a", "b").alias("r")).collect()[0]["r"] == "x|y"
    with pytest.raises(UdfArityError, match=r"joiner.*1\.\.3.*got 4"):
        fn("a", "b", "a", "b")
    with pytest.raises(UdfArityError, match="got 0"):
        fn()
