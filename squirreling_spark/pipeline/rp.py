"""Random-projection (Johnson–Lindenstrauss) dimensionality reduction
for embedding columns — the ANN/clustering prefilter that cuts vector
FLOPs by d_in/d_out while approximately preserving pairwise distances.

Spark-first: the projection matrix is never materialized. Each entry is
a DETERMINISTIC ±1 sign computed inline from (j, k) by an integer PRF —
``((j · (k+7) · 2654435761) mod 1000003) mod 2`` — so the whole
projection is one codegen'd higher-order-function expression per row:
no shuffle, no broadcast, no Python; a 100 TB corpus projects at scan
bandwidth, and any engine (the DuckDB oracle included) reproduces the
exact same matrix from the formula. Signs are scaled by 1/sqrt(d_out)
(the JL normalization — here exact binary 1/4 for d_out=16, so the
scaling is bit-exact too).

Sum order parity: Spark's sequential ``aggregate`` fold and DuckDB's
``list_sum(list_transform(...))`` produce bit-identical doubles (the
established ``_D_COS`` oracle precedent), so projected values hash-match
cross-engine after the shared round-to-6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PRF_MUL = 2654435761
_PRF_MOD = 1000003


def _sign_sql(j: str, k: str) -> str:
    """±1 sign of projection entry (j 1-based input dim, k 0-based output
    dim) — identical integer arithmetic in Spark SQL and DuckDB."""
    return (
        f"(CASE WHEN (({j} * ({k} + 7) * {_PRF_MUL}) % {_PRF_MOD}) % 2 = 0"
        f" THEN 1.0 ELSE -1.0 END)"
    )


def project_expr(vec: str, d_in: int = 64, d_out: int = 16) -> Column:
    """array<double> column: the d_out-dim JL projection of ``vec``.

    Components are RAW doubles — bit-identical across engines (IEEE
    products + sequential fold). Do NOT round inside the projection:
    ROUND(x, 6) materializes 1-ulp-DIFFERENT doubles per engine for the
    same decimal value, and downstream norms amplify that onto rounding
    boundaries (observed as a 6th-decimal l2_ratio flip at two SFs).
    Round/format only at the output layer."""
    scale = d_out ** 0.5
    return F.expr(
        f"transform(sequence(0, {d_out - 1}), k ->"
        f" aggregate(sequence(1, {d_in}), cast(0.0 as double),"
        f" (acc, j) -> acc + cast({vec}[j - 1] as double)"
        f" * {_sign_sql('j', 'k')}) / {scale!r})"
    )


def project_oracle_expr(vec: str, d_in: int = 64, d_out: int = 16) -> str:
    """The DuckDB rendering of ``project_expr`` (1-based list indexing)."""
    scale = d_out ** 0.5
    return (
        f"list_transform(generate_series(0, {d_out - 1}), k ->"
        f" list_sum(list_transform(generate_series(1, {d_in}), j ->"
        f" {vec}[j] * {_sign_sql('j', 'k')})) / {scale!r})"
    )


def project_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    d_in: int = 64,
    d_out: int = 16,
) -> DataFrame:
    """(id, proj) — the row-local JL projection; plan is a single
    whole-stage-codegen projection over the scan."""
    return df.select(
        F.col(id_col), project_expr(vec_col, d_in, d_out).alias("proj")
    )
