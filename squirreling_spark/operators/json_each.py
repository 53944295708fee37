"""JSON_EACH — explode a JSON-object string column into (key, value) rows.

Reference semantics: hyparam/squirreling src/execute/execute.js:193-242 —
objects yield one row per entry as (key, value); usable in FROM and joined
laterally.

Spark-first implementation: parse to ``map<string,string>`` with
``from_json`` (JVM-side, codegen'd) and ``explode`` the map — no Python
boundary, arbitrarily wide objects, scales linearly with input. Top-level
JSON arrays can be handled the same way via ``from_json(... 'array<string>')``
+ ``posexplode`` (index, value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_each(
    df: DataFrame, json_col: str, id_cols: list[str] | None = None
) -> DataFrame:
    """Explode JSON object strings in ``json_col`` to (key, value) rows."""
    parsed = F.from_json(F.col(json_col), "map<string,string>")
    cols = [F.col(c) for c in (id_cols or [])]
    return df.select(*cols, F.explode(parsed).alias("key", "value"))


def json_each_array(
    df: DataFrame, json_col: str, id_cols: list[str] | None = None
) -> DataFrame:
    """Explode JSON array strings in ``json_col`` to (index, value) rows."""
    parsed = F.from_json(F.col(json_col), "array<string>")
    cols = [F.col(c) for c in (id_cols or [])]
    return df.select(*cols, F.posexplode(parsed).alias("index", "value"))
