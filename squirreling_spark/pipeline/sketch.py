"""Count-min sketch (Cormode & Muthukrishnan 2005) — bounded-state
frequency estimation for heavy-hitter / top-terms queries at corpus
scale.

Why a sketch when Spark can groupBy-count exactly: the sketch's state is
``depth × width`` counters REGARDLESS of input size or key cardinality.
At 100 TB that means (a) the frequency summary of a whole corpus fits in
one broadcast (d·w cells, e.g. 5×16384 = 80k rows) and can be joined
against any later candidate set without rescanning the corpus; (b)
sketches of shards/days merge by cell-wise addition (counter arrays are
linear), so incremental corpus monitoring never reprocesses history; (c)
the same pass extends to Structured Streaming, where unbounded distinct
keys would otherwise grow state without limit.

Spark-first shape: each key row expands to ``depth`` (row, bucket) pairs
via ``inline`` of a literal struct array (row-local), then ONE
map-side-combining groupBy — partial aggregation collapses the expansion
to ≤ d·w cells per task before the shuffle, so the exchange carries
sketch cells, not data rows. Estimation joins candidates against the
broadcast sketch on the d bucket coordinates and takes the min.

Determinism: buckets are md5-derived (``md5(i ':' key)`` folded to 48
bits, mod width) — no seed state to ship, and bit-identical in any
engine, which is how the DuckDB oracle replays the sketch cell-for-cell.
The CMS guarantee (estimate ≥ true count, ≤ true + εN w.h.p.) is pinned
as a property test in tests/test_sketch.py.

No reference counterpart (squirreling has no sketches); public-knowledge
design only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 48-bit md5 fold of "i:key" mod width — the i-th hash row's bucket.
_BUCKET = (
    "CAST(conv(substring(md5(concat(CAST({i} AS STRING), ':', {key})),"
    " 1, 12), 16, 10) AS BIGINT) % {w}"
)


def cms_build(
    df: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> DataFrame:
    """(row, bucket, cnt) — the sketch as a relation of ≤ depth·width
    cells. One pass, map-side combined; merging two sketches is a
    UNION ALL + re-aggregate of d·w-cell frames."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                F.expr(
                    _BUCKET.format(i=i, key=key_col, w=width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.inline(pairs))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    key_col: str,
    width: int = 8192,
    depth: int = 5,
) -> DataFrame:
    """candidates + (cms_count) — the min over the depth hash rows of the
    candidate's cell counters. The sketch (≤ d·w rows) broadcasts; a
    missing cell means no key ever hashed there, so its counter is 0."""
    coords = candidates.select(
        "*",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        F.expr(
                            _BUCKET.format(i=i, key=key_col, w=width)
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ),
    )
    keep = [c for c in candidates.columns]
    return (
        coords.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(*keep)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_count")
        )
    )


def cms_top_terms(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    width: int = 8192,
    depth: int = 5,
) -> DataFrame:
    """Heavy-hitter terms with sketched counts: (term, exact_count,
    cms_count, overcount) for the exact top-``k`` tokens. The exact side
    exists to EXHIBIT the CMS guarantee under the correctness gate
    (cms_count ≥ exact_count always; equality when width ≫ distinct); a
    pure-sketch pipeline would keep only the broadcast sketch and
    estimate whatever candidate terms arrive later."""
    from squirreling_spark.pipeline.text import tokens

    toks = df.select(
        F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    sketch = cms_build(toks, "term", width=width, depth=depth)
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .orderBy(F.desc("exact_count"), "term")
        .limit(k)
    )
    est = cms_estimate(top, sketch, "term", width=width, depth=depth)
    return est.select(
        "term",
        "exact_count",
        "cms_count",
        (F.col("cms_count") - F.col("exact_count")).alias("overcount"),
    )
