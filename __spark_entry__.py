"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing summary) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 inventory
implemented in ``squirreling_spark`` — each query is a (spark, sf_dir) ->
DataFrame callable with a DuckDB-equivalent oracle SQL where expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from squirreling_spark import inventory  # noqa: E402

inventory.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the end-to-end training-data pipeline (quality gate →
    exact dedup → reproducible shard layout) — the composition this
    engine exists to run; the TPC-H shapes and operator inventory back it
    in queries()."""
    return inventory.QUERIES["corpus_pipeline"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in grading
    priority order (inventory.GRADE_ORDER first: one representative per §2
    row + every pipeline operator, then remaining variants)."""
    return inventory.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted for genuinely
    non-SQL-expressible operators → driver does a rows-only check)."""
    q = inventory.ordered_queries()
    return {n: inventory.ORACLES[n] for n in q if n in inventory.ORACLES}
