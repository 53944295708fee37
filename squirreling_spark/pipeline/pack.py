"""Training-sequence packing: concatenate the tokenized corpus in a
deterministic document order (one EOS token after each document) and chop
it into fixed-length training sequences — the "concat-then-chunk" packing
GPT-style pretraining pipelines actually use (no padding waste, documents
may span sequence boundaries).

Output is the PLACEMENT MAP (seq_id, doc_id, doc_start, n_toks): which
token span of which document lands in which training sequence. Writers
join this back to the token arrays to materialize shards; keeping the map
relational makes the op testable and engine-exact.

Sibling operator: ``pipeline/text.pack_sequences`` (graded as
``docs_pack``) is the OTHER standard packing shape — greedy token-budget
bin packing of intact chunks (chunks never split; bins may under-fill).
This module is the zero-waste concat-and-chop variant (documents may
split across sequence boundaries; every sequence except the last is
exactly full). Real pipelines use both, which is why both ship.

Scale design — the naive global running total is a single-task window
(ORDER BY over the whole corpus with no partition key), which dies at
100 TB. Instead the prefix offsets compute in two levels:

1. bucket = doc_id div bucket_size → per-bucket token sums (map-combined
   groupBy, even partitions);
2. one tiny unpartitioned window over the BUCKET table (rows = corpus /
   bucket_size — thousands, not billions) yields each bucket's global
   starting offset;
3. a within-bucket cumulative sum (window PARTITIONED by bucket — even,
   bounded partitions) plus the broadcast bucket offset gives every
   document's exact global offset without any single-task stage.

Every quantity is integer, so placement is bit-identical across engines
and partition layouts; the DuckDB oracle replays the same arithmetic
with a plain window cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from squirreling_spark.pipeline.text import tokens
from squirreling_spark.qutil import spread


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """(seq_id, doc_id, doc_start, n_toks) placement map for fixed-length
    sequence packing in ``doc_id`` order. Each document contributes its
    token count + 1 (trailing EOS); a document crossing a sequence
    boundary is split — one row per (document, sequence) span.

    ``doc_start`` is the 0-based token offset inside the document where
    the span begins (the EOS is position n_tokens); ``n_toks`` is the
    span width; sequence s covers global token positions
    [s·seq_len, (s+1)·seq_len)."""
    # _bkt uses integer division (``div``), not double division — exact for
    # the full bigint range. Ids that don't cast to BIGINT land in a single
    # NULL bucket ordered first (null-safe join below) rather than being
    # silently dropped; the contract is integer-like ids for even buckets.
    counts = spread(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        by=["doc_id"],
    ).select(
        "doc_id",
        (F.size(tokens(text_col)) + 1).cast("bigint").alias("eff_len"),
        F.expr(f"CAST(doc_id AS BIGINT) div {int(bucket_size)}").alias(
            "_bkt"
        ),
    )
    bkt_sums = counts.groupBy("_bkt").agg(
        F.sum("eff_len").cast("bigint").alias("_bsum")
    )
    # tiny table: one row per bucket — the only unpartitioned window
    bkt_off = bkt_sums.withColumn(
        "_boff",
        F.coalesce(
            F.sum("_bsum").over(
                W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint"),
    ).select("_bkt", "_boff")
    within = W.partitionBy("_bkt").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    offs = (
        counts.join(
            F.broadcast(bkt_off),
            counts["_bkt"].eqNullSafe(bkt_off["_bkt"]),
        )
        .drop(bkt_off["_bkt"])
        .withColumn(
            "_off",
            (
                F.col("_boff")
                + F.coalesce(F.sum("eff_len").over(within), F.lit(0))
            ).cast("bigint"),
        )
        .select("doc_id", "eff_len", "_off")
    )
    first_seq = (F.col("_off") / seq_len).cast("bigint")
    last_seq = ((F.col("_off") + F.col("eff_len") - 1) / seq_len).cast(
        "bigint"
    )
    spans = offs.select(
        "doc_id",
        "eff_len",
        "_off",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    span_start = F.greatest(F.col("_off"), F.col("seq_id") * seq_len)
    span_end = F.least(
        F.col("_off") + F.col("eff_len"), (F.col("seq_id") + 1) * seq_len
    )
    return spans.select(
        F.col("seq_id").cast("bigint").alias("seq_id"),
        "doc_id",
        (span_start - F.col("_off")).cast("bigint").alias("doc_start"),
        (span_end - span_start).cast("bigint").alias("n_toks"),
    )
