"""K-means (Lloyd) over an embedding column — pure DataFrame rounds.

The clustering primitive behind two training-data jobs:
- semantic curation / SemDeDup-style pruning (cluster the corpus by
  embedding, then dedup or downsample WITHIN clusters — Abbas et al. 2023),
- IVF index training (the centroids feed ``similarity.assign_cells`` /
  ``ivf_topk``; today's queries use ad-hoc every-Nth-vector centroids).

Scale shape per iteration (the whole point at 100 TB):
- assignment: centroids (k rows) broadcast, ONE streaming pass over the
  corpus; nearest-centroid is a map-side-combining ``max_by`` aggregate
  (similarity.assign_cells), so the corpus × k product collapses inside
  each task — no window, no shuffle of the product;
- update: element-wise mean keyed on (cluster, dim) — k × dim keys,
  map-side partial sums, then a k-row rollup. Decimal accumulation keeps
  centroids bit-identical under any partitioning; components are rounded
  to ``round_digits`` each round so the fixpoint is engine-reproducible.
- per-round centroids are ``persist()``-ed and materialized via a
  SQL-path ``count()`` (k-row frames). NOT ``localCheckpoint``: checkpoint
  materializes through the RDD path, which skips AQE and exchange reuse —
  measured 2.5x slower per round here. Two rounds of lineage on top of a
  cached k-row frame is trivially re-optimizable; for long iteration
  chains on a real cluster, ``checkpoint()`` adds fault tolerance at the
  cost of an HDFS write.

Determinism: seeds are the ``k`` lowest-id vectors (no RNG to ship),
assignment tie-breaks on (sim DESC, centroid id ASC), means are
decimal-exact — the full run is reproducible across engines, which is how
the DuckDB oracle for ``kmeans_embeddings`` can replay it exactly.

Empty clusters simply drop out of the centroid set (both engines derive
centroids from the assignment groupBy); k shrinks rather than re-seeding —
the standard Lloyd behavior when a seed loses all members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from squirreling_spark.pipeline.similarity import assign_cells
from squirreling_spark.qutil import det_round, spread


def _mean_centroids(
    assigned: DataFrame, round_digits: int
) -> DataFrame:
    """(cent_id, cent_vec, n_vecs) — decimal-exact element-wise mean per
    cluster, components rounded, array rebuilt in dimension order."""
    per_dim = (
        assigned.select(
            "cell", F.posexplode("__v").alias("dim", "v")
        )
        .groupBy("cell", "dim")
        .agg(
            det_round(
                F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                round_digits,
            ).alias("mean_v"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_dim.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_v"))
            ).alias("__pairs"),
            F.min("n").alias("n_vecs"),
        )
        .select(
            F.col("cell").alias("cent_id"),
            F.transform(
                "__pairs", lambda p: p.getField("mean_v")
            ).alias("cent_vec"),
            "n_vecs",
        )
    )


def _lloyd(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int,
    round_digits: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared Lloyd loop: returns (last-round assignments, final numeric
    centroids (cent_id, cent_vec, n_vecs))."""
    emb = spread(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    )
    cents = (
        emb.orderBy("__id")
        .limit(k)
        .select(
            F.col("__id").alias("cent_id"), F.col("__v").alias("cent_vec")
        )
        .persist()
    )
    cents.count()
    assigned = None
    for it in range(iters):
        prev = cents
        assigned = assign_cells(emb, prev, c_id="__id", c_vec="__v")
        cents = _mean_centroids(assigned, round_digits).persist()
        cents.count()
        # Once this round's centroids are materialized in cache, the
        # previous round's k-row frame is dead weight — EXCEPT on the
        # final round, where the returned `assigned` still reads it
        # (unpersisting would force a full lineage replay on first use).
        if it < iters - 1:
            prev.unpersist()
    return assigned, cents


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Trained centroids in NUMERIC form (cent_id, cent_vec
    array<double>, n_vecs) — for consumers like IVF index training, where
    ad-hoc every-Nth-vector centroids cost real recall (measured at
    sf0.01: nprobe=2 recall 0.46 ad-hoc vs 0.86 trained)."""
    _, cents = _lloyd(df, vec_col, id_col, k, iters, round_digits)
    return cents


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    round_digits: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd rounds; returns ``(assignments, clusters)``:
    assignments = (id, cluster) for every input row (last round);
    clusters = (cluster_id, n_vecs, centroid) with the centroid serialized
    to a fixed-precision '/'-joined string (portable across engines; raw
    array outputs crash the driver canonicalizer)."""
    assigned, cents = _lloyd(df, vec_col, id_col, k, iters, round_digits)
    assignments = assigned.select(
        F.col("__id").alias(id_col), F.col("cell").alias("cluster")
    )
    clusters = cents.select(
        F.col("cent_id").alias("cluster_id"),
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.array_join(
            F.transform(
                "cent_vec",
                lambda v: F.format_string(f"%.{round_digits}f", v),
            ),
            "/",
        ).alias("centroid"),
    )
    return assignments, clusters
