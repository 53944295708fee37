"""Deterministic shuffle-shard export — the last step of a training-data
pipeline: write the cleaned corpus as N shards whose contents AND order
are a reproducible pseudo-random shuffle (so a training run streams
shards sequentially yet sees an i.i.d.-like document order, and a rerun
of the pipeline bit-reproduces the same shards).

Spark-first shape: shard id and intra-shard sort key are both md5-derived
from the document id — no RNG state, no driver-side shuffling. The
physical export is ``df.repartition(n, shard).sortWithinPartitions(key)``
+ a partitioned write: ONE hash exchange and a per-task sort, no global
sort, no window over the whole corpus. ``shard_assignments`` materializes
the same (shard, pos) as DATA — a per-shard window whose partitions are
corpus/n_shards rows, the same bounded slice a writer task holds — so
the layout itself sits under the correctness gate.

At 100 TB: n_shards scales with the corpus (e.g. ~10 GB per shard), the
exchange is the only corpus-wide movement, and the md5 keys are uniform
so shard sizes concentrate tightly (no skewed writer task).

No reference counterpart (squirreling is a read-only query engine);
public-knowledge design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# 48-bit md5 folds: shard of an id, and the intra-shard shuffle key.
_SHARD = (
    "CAST(conv(substring(md5(CAST({id} AS STRING)), 1, 12), 16, 10)"
    " AS BIGINT) % {n}"
)
_POSKEY = "substring(md5(concat('pos:', CAST({id} AS STRING))), 1, 12)"


def shard_assignments(
    df: DataFrame, id_col: str, n_shards: int = 16
) -> DataFrame:
    """input columns + (shard, pos, shard_n_docs): the deterministic
    shuffle layout. pos is 1-based within the shard, ordered by the md5
    shuffle key (id tiebreak for the astronomically-unlikely collision);
    shard_n_docs rides along so consumers can plan reads without a
    second pass."""
    shard = F.expr(_SHARD.format(id=id_col, n=n_shards))
    poskey = F.expr(_POSKEY.format(id=id_col))
    w = W.partitionBy("shard").orderBy("__poskey", id_col)
    return (
        df.select("*", shard.alias("shard"), poskey.alias("__poskey"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "shard_n_docs",
            F.count(F.lit(1)).over(W.partitionBy("shard")).cast("bigint"),
        )
        .drop("__poskey")
    )


def write_shards(
    df: DataFrame, id_col: str, path: str, n_shards: int = 16
) -> None:
    """The physical export: one hash exchange on the shard id, per-task
    sort by the shuffle key, one file per shard. Same layout as
    ``shard_assignments`` without materializing positions."""
    shard = F.expr(_SHARD.format(id=id_col, n=n_shards))
    poskey = F.expr(_POSKEY.format(id=id_col))
    (
        df.select("*", shard.alias("shard"), poskey.alias("__poskey"))
        .repartition(n_shards, "shard")
        # shard leads the sort so the partitioned writer's required
        # ordering (partition cols first) is already satisfied — without
        # it, FileFormatWriter inserts its own NON-STABLE sort on shard
        # and scrambles the shuffle order (caught by test_export.py).
        .sortWithinPartitions("shard", "__poskey", id_col)
        .drop("__poskey")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def curate_and_shard(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_shards: int = 8,
) -> DataFrame:
    """The end-to-end curation pipeline as ONE lazy DataFrame graph —
    quality gate → exact dedup → reproducible shard layout — the
    composition a training-data run actually executes, expressed so
    Catalyst plans it globally (the classifier's row-local fold fuses
    into the scan; only the dedup groupBy and the shard exchange move
    data):

      1. hashed-linear score PARTS (pipeline/classify.py::score_parts)
         with fingerprint and stratum columns riding along — ONE
         row-local pass over the scan, no score-vs-corpus self-join;
      2. exact dedup on the normalized fingerprint as a single
         map-combined ``min_by`` aggregate (the min-id survivor's whole
         row in one shuffle — no representative-join back);
      3. the quality gate AFTER the dedup exchange: exact duplicates
         have identical normalized text, the classifier tokenizes on
         non-alphanumerics, so every member of a fingerprint group has
         the SAME token list → the same logit → the same keep bit;
         gating the representative is exactly gating the group, and the
         interpreted token fold — the expensive expression — is
         evaluated ONCE per corpus row instead of being re-inlined into
         a pushed-down keep predicate (full pipeline at replicated sf1:
         9.2s → 1.9s, scale ratio 5.1× → 1.3×);
      4. deterministic shuffle-shard layout (shard_assignments).

    Exactly TWO corpus-keyed exchanges total (dedup, shard) — the
    earlier score-join-semijoin draft cost four.

    Returns (id, stratum cols…, logit, shard, pos, shard_n_docs) for the
    surviving documents."""
    from squirreling_spark.pipeline.classify import (
        logit_from_parts,
        score_parts,
    )
    from squirreling_spark.pipeline.dedup import normalized_fingerprint

    passthrough = [c for c in df.columns if c not in (id_col, text_col)]
    parts = score_parts(
        df.select("*", normalized_fingerprint(text_col).alias("__fp")),
        text_col,
        id_col,
        extra_cols=[*passthrough, "__fp"],
    )
    carry = [id_col, *passthrough, "n_tokens", "__wsum"]
    reps = (
        parts.groupBy("__fp")
        .agg(F.min_by(F.struct(*carry), F.col(id_col)).alias("__best"))
        .select(*[F.col(f"__best.{c}").alias(c) for c in carry])
    )
    logit = logit_from_parts()
    survivors = (
        reps.withColumn("logit", logit)
        .filter(F.col("logit") > 0.0)
        .select(id_col, *passthrough, "logit")
    )
    return shard_assignments(survivors, id_col, n_shards=n_shards)
