"""Driver-oracle coverage for the UDF registry — the reference's
``functions`` option and its defining async/LLM path.

Reference: hyparam/squirreling accepts sync OR async scalar UDFs callable
anywhere an expression goes (src/types.d.ts:135-138, lookup
src/expression/evaluate.js:687-694); the README's flagship example is an
LLM call per row (README.md:79-94). Until round 4 our registry
(functions/registry.py) had only unit tests; this query runs all three
execution paths — plain sync scalar, Arrow-vectorized, and the asyncio
batch path — through ``engine.execute_sql`` against a DuckDB oracle:

- ``poly3`` (sync scalar): integer polynomial, row-at-a-time Python fn
  lifted to a pandas batch by the registry.
- ``rev_lower`` (vectorized): pandas-Series string transform, the Arrow
  fast path.
- ``llm_tag`` (async): a deterministic stand-in for an LLM/API call —
  ``await``s, then derives the "response" as an md5 prefix of the prompt,
  so DuckDB can replay it exactly. The registry drives one asyncio loop
  per Arrow batch with bounded concurrency (the Spark analogue of the
  reference's event-loop Promise batching).

The vectorized input is ASCII-sanitized first: DuckDB's ``reverse`` is
grapheme-aware while pandas ``[::-1]`` reverses code points, so combining
characters would diverge; digits/letters/spaces round-trip identically.
"""

from __future__ import annotations

import asyncio
import hashlib

import pandas as pd

from squirreling_spark.inventory import query
from squirreling_spark.qutil import t


def _poly3(x: int) -> int:
    return 3 * x * x + 5 * x + 7


def _rev_lower(s: pd.Series) -> pd.Series:
    return s.str.lower().str[::-1]


async def _llm_tag(prompt: str) -> str:
    # Stand-in for an LLM/API call: yields to the event loop like a real
    # request, then returns a deterministic, oracle-replayable "response".
    await asyncio.sleep(0)
    return hashlib.md5(("tag:" + prompt).encode("utf-8")).hexdigest()[:8]


@query(
    "udf_digest",
    oracle="""
    SELECT doc_id,
           3 * CAST(doc_id AS BIGINT) * CAST(doc_id AS BIGINT)
             + 5 * CAST(doc_id AS BIGINT) + 7 AS poly,
           reverse(lower(substring(
             regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), 1, 12))) AS rev12,
           substring(md5('tag:' || substring(text, 1, 40)), 1, 8) AS llm_resp
    FROM documents
    """,
)
def udf_digest(spark, sf):
    """Sync + vectorized + async UDFs through the engine façade
    (engine.execute_sql → functions/registry.py): registration, SQL
    lookup, arity inference, and the asyncio batch evaluator all sit on
    the executed path; the oracle replays each UDF as plain SQL. Full
    rows are compared (no checksum) — stronger than the digest rows."""
    from squirreling_spark.engine import execute_sql
    from squirreling_spark.functions.registry import FunctionSpec

    res = execute_sql(
        spark,
        """
        SELECT doc_id,
               poly3(CAST(doc_id AS BIGINT)) AS poly,
               rev_lower(substring(
                 regexp_replace(text, '[^a-zA-Z0-9 ]', ''), 1, 12)) AS rev12,
               llm_tag(substring(text, 1, 40)) AS llm_resp
        FROM udf_docs
        """,
        tables={"udf_docs": t(spark, sf, "documents")},
        functions={
            "poly3": FunctionSpec(apply=_poly3, return_type="bigint"),
            "rev_lower": FunctionSpec(
                apply=_rev_lower, vectorized=True, return_type="string"
            ),
            "llm_tag": FunctionSpec(
                apply=_llm_tag, return_type="string", max_concurrency=32
            ),
        },
    )
    return res.df
