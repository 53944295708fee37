"""Hashed-feature linear text classifier — the fastText-style quality
model every large-scale training-data pipeline runs over its corpus
(CCNet / RedPajama / FineWeb all gate documents on a linear classifier
score before anything expensive sees them).

Spark-first shape: the model is LINEAR over HASHED bag-of-words features,
so scoring factorizes per token — `score(doc) = mean_t w[h(t)] + b` —
and the whole thing runs as a row-local fold over the token array
(`transform` + `aggregate`), entirely inside whole-stage codegen. No
explode, no shuffle, no Python: at 100 TB this scores at scan speed,
which is exactly why production pipelines use linear models for the
first quality gate.

Two weight sources:
- ``weights=None``: weights derived from the bucket hash itself
  (md5-folded to a rational in [-1, 1)) — fully engine-portable, which
  is what lets the DuckDB oracle replay scoring bit-for-bit.
- ``weights=DataFrame(bucket, weight)``: an externally-trained model.
  Token buckets explode and broadcast-join the weight table (vocab-sized,
  ≤ n_buckets rows — always broadcastable), then mean per doc: one
  narrow shuffle on doc id. Both paths are tested equal when fed the
  same weights (tests/test_classify.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tokenizer shared with pipeline.text: lowercase word extraction.
_TOKS = "filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')"

# Bucket of one token: first 8 md5 hex chars → 32-bit int, mod n_buckets.
_BUCKET = "CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT) % {n}"

# Hash-derived weight of one BUCKET id (as a string expression over `b`):
# md5('w:' || bucket) folded to 6 hex chars (24 bits), mapped affinely to
# [-1, 1). Pure integer→double arithmetic — identical in any engine.
_W_OF_BUCKET = (
    "(CAST(conv(substring(md5(concat('w:', CAST({b} AS STRING))), 1, 6),"
    " 16, 10) AS DOUBLE) / 8388608.0 - 1.0)"
)


def token_buckets(text_col: str, n_buckets: int = 1 << 20) -> F.Column:
    """array<bigint> of hashed feature buckets, one per token."""
    return F.expr(
        f"transform({_TOKS.format(col=text_col)},"
        f" x -> {_BUCKET.format(n=n_buckets)})"
    )


def hashed_weights_table(
    spark, n_buckets: int = 1 << 20
) -> DataFrame:
    """Materialize the hash-derived weight for every bucket as a
    (bucket, weight) table — stands in for a trained model's weights in
    tests, and demonstrates the broadcast path's input contract."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        F.expr(_W_OF_BUCKET.format(b="id")).alias("weight"),
    )


def linear_quality_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1 << 20,
    bias: float = 0.05,
    threshold: float = 0.0,
    weights: DataFrame | None = None,
    round_digits: int = 6,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra_cols, n_tokens, logit, keep) per document.

    logit = bias + mean over tokens of w[bucket(token)]; ``keep`` is the
    decision at ``threshold``. The logit (not a sigmoid probability) is
    emitted: sigmoid is monotone, so thresholding the logit is the same
    decision, and avoiding `exp` keeps the value bit-identical across
    engines (exp differs in the last ulp between libm implementations).
    Empty documents get logit = bias (no token evidence).

    ``extra_cols`` ride along through the scoring (row-local in the
    hash-weights path, F.first through the broadcast path's groupBy), so
    a downstream consumer never has to join the corpus back against its
    own scores — the join would cost two corpus shuffles at scale.
    """
    if weights is None:
        scored = score_parts(
            df, text_col, id_col, n_buckets, extra_cols=extra_cols
        )
    else:
        _DEC = "DECIMAL(38,25)"
        exploded = df.select(
            F.col(id_col),
            *(extra_cols or []),
            F.explode_outer(token_buckets(text_col, n_buckets)).alias(
                "bucket"
            ),
        )
        scored = (
            exploded.join(F.broadcast(weights), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.count("bucket").cast("bigint").alias("n_tokens"),
                F.coalesce(
                    F.sum(F.col("weight").cast(_DEC)).cast("double"),
                    F.lit(0.0),
                ).alias("__wsum"),
                *[F.first(c).alias(c) for c in extra_cols or []],
            )
        )
    logit = logit_from_parts(bias, round_digits)
    return scored.select(
        id_col,
        *(extra_cols or []),
        "n_tokens",
        logit.alias("logit"),
        (logit > threshold).alias("keep"),
    )


def score_parts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1 << 20,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra_cols, n_tokens, __wsum): the expensive per-token work
    of the hash-weights path, WITHOUT the final logit/keep projection.

    Split out so pipelines can stage it: the token fold is a
    higher-order-function expression (interpreted, not codegen), and
    Catalyst's predicate pushdown re-inlines a derived ``keep`` filter
    below the projection — evaluating the fold twice per row. Computing
    parts first, carrying (n_tokens, __wsum) through whatever exchange
    the pipeline already has, and deriving logit/keep AFTER it keeps the
    fold at exactly one evaluation per row (pipeline/export.py's
    curate_and_shard: measured 10.0s → ~4s at replicated-sf1 dedup).

    Weights are 24-bit rationals (k/2^23 - 1), exactly representable at
    decimal scale 25 — accumulating in decimal makes the sum identical
    under ANY partition layout / fold order AND across engines, so both
    paths (and the DuckDB oracle) agree bit-for-bit."""
    _DEC = "DECIMAL(38,25)"
    toks = _TOKS.format(col=text_col)
    bucket = _BUCKET.format(n=n_buckets)
    w_sum = (
        f"CAST(aggregate(transform({toks},"
        f" x -> CAST({_W_OF_BUCKET.format(b=bucket)} AS {_DEC})),"
        f" CAST(0 AS {_DEC}),"
        f" (acc, v) -> CAST(acc + v AS {_DEC})) AS DOUBLE)"
    )
    return df.select(
        F.col(id_col),
        *(extra_cols or []),
        F.expr(f"size({toks})").cast("bigint").alias("n_tokens"),
        F.expr(w_sum).alias("__wsum"),
    )


def logit_from_parts(bias: float = 0.05, round_digits: int = 6) -> F.Column:
    """The cheap second stage over (n_tokens, __wsum) columns."""
    return F.round(
        F.lit(bias)
        + F.when(F.col("n_tokens") > 0, F.col("__wsum") / F.col("n_tokens"))
        .otherwise(F.lit(0.0)),
        round_digits,
    )
