"""Skew-handling operators: salted aggregation and salted joins.

At 100 TB, a handful of hot keys (one customer with 10% of all orders, the
empty-string document) turn a hash shuffle into one straggler task. Two
mitigations, composable with everything else in this engine:

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin``) — on by
  default in our session factory; handles sort-merge join skew at runtime.
- Explicit salting (this module) — for aggregations (two-phase: salt →
  partial agg → de-salt → final agg) and for broadcast-incompatible joins
  (replicate the small side per salt). Works on any Spark, any plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__sq_salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``aggs`` aggregate within (key, salt); ``final_aggs`` re-combine the
    partials per key. Example: total per key →
    ``aggs=[F.sum("x").alias("px")]``, ``final_aggs=[F.sum("px").alias("x")]``.
    Phase 1 spreads each hot key over ``salt_buckets`` reducers; phase 2
    combines ``salt_buckets`` rows per key — never a straggler."""
    salted = df.withColumn(
        _SALT, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, _SALT).agg(*aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Join a skewed fact side against a modest dimension side without a
    broadcast: the fact side gets a random salt, the dimension side is
    replicated once per salt value, and the join key becomes
    (key, salt) — hot keys spread over ``salt_buckets`` tasks.

    Use when the dimension is too big to broadcast but small enough to
    replicate ``salt_buckets``×."""
    salted_fact = skewed.withColumn(
        _SALT, (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(replicated, on + [_SALT], how)
    return out.drop(_SALT)
