"""Sparse retrieval scoring at corpus scale — BM25 ranking over the
document corpus for a fixed query-term set, the classic quality-retrieval
primitive (rank the corpus against a trusted query, keep the head — the
importance-resampling / DSIR-style selection step of an LLM data
pipeline; also the standard search-index scoring function).

Spark-first shape: per-document term frequencies are array folds inside
one codegen'd projection (no explode, no per-term shuffle — the term set
is a fixed literal list); corpus statistics (N, Σdl, per-term document
frequencies) are ONE map-side-combined aggregate that broadcasts back as
a 1-row cross join; the final score is a single arithmetic projection
followed by a TakeOrderedAndProject top-k. The corpus is scanned exactly
once, nothing shuffles except the k survivors.

Determinism contract (the repo float policy): the classic BM25 idf is
``ln((N-df+0.5)/(df+0.5))`` — libm ``ln`` is NOT correctly rounded and
differs across engines, so this implementation keeps the idf as the
exact RATIONAL ``(N-df+0.5)/(df+0.5)`` (same monotone ranking for a
fixed N; always positive, so no BM25+ floor needed). Every remaining
operation (+,-,*,/) is IEEE-correctly-rounded and evaluated in a FIXED
left-associative order that the DuckDB oracle mirrors token-for-token,
and constants (k1=1.25, b=0.75, k1+1=2.25) are exactly representable
doubles — so scores are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from squirreling_spark.pipeline.text import tokens
from squirreling_spark.qutil import spread

K1 = 1.25  # exactly representable (5/4) — keeps every product exact-input
B = 0.75  # exactly representable (3/4)


def _eq(term: str):
    # single-arg closure: a 2-param lambda would make F.filter pass the
    # ARRAY INDEX as the second argument, shadowing the captured term
    return lambda x: x == F.lit(term)


def bm25_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    topk: int = 20,
) -> DataFrame:
    """Top-``topk`` documents by BM25 (rational-idf variant) against the
    fixed ``terms`` query. Returns ``(id, dl, tf1..tfN, score)`` ordered
    score DESC then id ASC (deterministic tie-break).

    Scale shape: tf columns are per-row array folds (one scan, zero
    shuffles); (N, Σdl, df_i) is one 1-row aggregate broadcast back;
    top-k is TakeOrderedAndProject — at 100 TB this is scan bandwidth
    plus a k-row driver fetch, with no full sort and no wide shuffle.
    """
    toks = tokens(text_col)
    d = spread(df, by=[id_col]).select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("dl"),
        *[
            F.size(F.filter(toks, _eq(term)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, term in enumerate(terms, 1)
        ],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int"))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(1, len(terms) + 1)
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    # avgdl and per-term scores: FIXED left-associative evaluation order,
    # mirrored exactly by bm25_oracle_sql — do not reorder.
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = None
    for i in range(1, len(terms) + 1):
        tf = F.col(f"tf{i}").cast("double")
        dfq = F.col(f"df{i}").cast("double")
        idf = (F.col("n_docs").cast("double") - dfq + F.lit(0.5)) / (
            dfq + F.lit(0.5)
        )
        tfs = (tf * F.lit(K1 + 1.0)) / (
            tf
            + F.lit(K1)
            * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl").cast("double") / avgdl)
        )
        term_score = idf * tfs
        score = term_score if score is None else score + term_score
    return (
        j.select(
            id_col,
            "dl",
            *[f"tf{i}" for i in range(1, len(terms) + 1)],
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(topk)
    )


def bm25_oracle_sql(
    terms: list[str],
    topk: int = 20,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL mirroring ``bm25_rank`` operation-for-operation (same
    left-associative arithmetic, same exact constants) so scores are
    bit-identical."""
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms, 1)
    )
    df_cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(1, len(terms) + 1)
    )
    score_terms = " + ".join(
        f"(((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * ((CAST(tf{i} AS DOUBLE) * 2.25)"
        f" / (CAST(tf{i} AS DOUBLE) + 1.25 * (1.0 - 0.75 + 0.75"
        f" * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))"
        for i in range(1, len(terms) + 1)
    )
    tf_list = ", ".join(f"tf{i}" for i in range(1, len(terms) + 1))
    return f"""
    WITH tok AS (
      SELECT {id_col},
             string_split(trim(regexp_replace({text_col}, '\\s+', ' ', 'g')),
                          ' ') AS tk
      FROM {table}
    ),
    d AS (
      SELECT {id_col}, CAST(len(tk) AS BIGINT) AS dl,
             {tf_cols}
      FROM tok
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             {df_cols}
      FROM d
    )
    SELECT {id_col}, dl, {tf_list},
           {score_terms} AS score
    FROM d, s
    ORDER BY score DESC, {id_col} LIMIT {topk}"""


RRF_SCALE = 1_000_000_000_000  # 1/(k+rank) quantized to 1e-12 resolution


def rrf_fuse(
    systems: dict[str, DataFrame],
    id_col: str,
    k: int = 60,
    topk: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    several retrieval systems' top-k lists — the standard way to combine
    a sparse (BM25) and a dense (embedding) retriever without score
    calibration: ``rrf(d) = Σ_systems 1/(k + rank_s(d))``.

    EXACT cross-engine arithmetic: each contribution is the integer
    ``RRF_SCALE div (k + rank)`` (binary floats like 1/61 don't exist;
    the quantized integer does, identically, in any engine), so the
    fused ordering is bit-reproducible and quantization IS the operator
    contract. Documents missing from a system's list contribute 0.

    Each input DataFrame must have columns ``(id_col, rank)`` (1-based).
    Distributed shape: the inputs are top-k lists — BOUNDED at
    |systems|·k rows by construction — so the union + one groupBy and
    the final global ranking window are all constant-size regardless of
    corpus scale; the expensive work happened inside the per-system
    retrievers. Returns (id, rank_<system>..., n_systems, rrf_score,
    fused_rank) for the fused top-``topk``."""
    from pyspark.sql import Window

    names = sorted(systems)
    tagged = None
    for name in names:
        part = systems[name].select(
            F.col(id_col),
            F.lit(name).alias("__sys"),
            F.col("rank").cast("bigint").alias("__r"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    contrib = tagged.withColumn(
        "__c",
        F.expr(f"CAST({RRF_SCALE} div (CAST({k} AS BIGINT) + __r)"
               f" AS BIGINT)"),
    )
    agg = contrib.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("__sys") == n, F.col("__r"))).alias(
                f"rank_{n}"
            )
            for n in names
        ],
        F.count(F.lit(1)).cast("bigint").alias("n_systems"),
        F.sum("__c").cast("bigint").alias("rrf_score"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    return (
        agg.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("fused_rank") <= topk)
    )
