"""Scalar UDF registry — the reference's ``functions`` option.

Reference: hyparam/squirreling accepts
``functions: {NAME: {apply: (…args) => val | Promise<val>, arguments: {min,max}}}``
(src/types.d.ts:135-138, lookup src/expression/evaluate.js:687-694) — sync or
async scalar UDFs callable anywhere an expression goes; the README's flagship
example is an LLM call per row (README.md:79-94).

Spark-first mapping:
- sync Python callables → ``pandas_udf`` when vectorizable (Arrow batches,
  ~10-100× row-at-a-time), plain ``udf`` otherwise.
- **async** callables (LLM/API calls) → a pandas_udf that drives an asyncio
  event loop per Arrow batch with bounded concurrency: the Spark analogue of
  the reference's event-loop Promise batching. Each executor batch issues up
  to ``max_concurrency`` requests in flight — across a 1000-executor cluster
  that parallelism multiplies, so per-key rate limits belong in the callable.

Laziness discipline (reference lazy cells, src/types.d.ts:62-70): Spark has
no cell-level laziness, so expensive UDF columns must be attached AFTER
filters/limits. Marking the UDF non-deterministic stops Catalyst from
pushing it through filters or collapsing it into earlier projects — that is
``expensive=True`` below; tests/test_lazy_udf.py counts invocations the way
the reference's expensive.test.js does.
"""

from __future__ import annotations

import asyncio
import inspect
from dataclasses import dataclass
from typing import Any, Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StringType


@dataclass
class FunctionSpec:
    """A scalar UDF: sync or async ``apply``, Spark return type, and
    whether it is expensive (→ fenced from Catalyst reordering)."""

    apply: Callable[..., Any]
    return_type: DataType | str = StringType()
    expensive: bool = False
    max_concurrency: int = 64
    vectorized: bool = False  # apply takes/returns pandas Series


def _async_batched(fn: Callable, max_concurrency: int):
    """Wrap an async scalar fn into a batch evaluator running one asyncio
    loop per Arrow batch with a concurrency bound."""

    async def run_batch(values_cols):
        sem = asyncio.Semaphore(max_concurrency)

        async def one(args):
            async with sem:
                return await fn(*args)

        return await asyncio.gather(*(one(args) for args in zip(*values_cols)))

    def batch_eval(*cols: pd.Series) -> pd.Series:
        values = [c.tolist() for c in cols]
        out = asyncio.run(run_batch(values))
        return pd.Series(out)

    return batch_eval


def make_udf(spec: FunctionSpec):
    """Compile a FunctionSpec to a Spark column function."""
    if inspect.iscoroutinefunction(spec.apply):
        evaluator = _async_batched(spec.apply, spec.max_concurrency)
        udf = F.pandas_udf(evaluator, returnType=spec.return_type)
    elif spec.vectorized:
        udf = F.pandas_udf(spec.apply, returnType=spec.return_type)
    else:
        fn = spec.apply
        udf = F.pandas_udf(
            lambda *cols: pd.Series(
                [fn(*args) for args in zip(*(c.tolist() for c in cols))]
            ),
            returnType=spec.return_type,
        )
    if spec.expensive:
        udf = udf.asNondeterministic()
    return udf


def register_functions(
    spark: SparkSession, functions: dict[str, FunctionSpec | Callable]
) -> None:
    """Register UDFs for SQL use (reference evaluate.js:687-694 lookup)."""
    for name, spec in functions.items():
        if not isinstance(spec, FunctionSpec):
            spec = FunctionSpec(apply=spec)
        spark.udf.register(name, make_udf(spec))


def register_udtf(spark: SparkSession, name: str, cls, return_type: str) -> None:
    """Register a user-defined TABLE function (rows out per input row) —
    beyond the reference, whose table functions are hard-coded
    (UNNEST/EXPLODE/JSON_EACH only, src/execute/execute.js:153-242).

    ``cls`` is a plain class with an ``eval(self, *args)`` generator method
    yielding output tuples; usable in SQL FROM clauses and LATERAL joins.
    """
    from pyspark.sql.functions import udtf

    spark.udtf.register(name, udtf(cls, returnType=return_type))
