"""Query inventory registry: the SURVEY.md §2 coverage surface.

Each entry pairs a Spark DataFrame query (``(spark, sf_dir) -> DataFrame``)
with an equivalent DuckDB oracle SQL string. The driver (and our own parity
tests) run both at sf0.01 and compare row-count + schema + order-insensitive
value hash. Column names are aliased identically on both sides.

Entries without an oracle (genuinely non-SQL-expressible ops: LSH banding,
streaming state, etc.) get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    from squirreling_spark import (  # noqa: F401
        queries_relational,
        queries_joins,
        queries_functions,
        queries_nested,
        queries_window,
        queries_pipeline,
        queries_spatial,
        queries_extras,
        queries_analytics,
        queries_analytics2,
    )
