"""Similarity search over embedding columns (array<float>).

- ``cosine`` builds a codegen'd cosine expression (no UDF): elements are
  cast to double so results are bit-identical across engines and partition
  layouts.
- ``cosine_topk_bruteforce``: exact baseline. Query side is broadcast; the
  corpus streams through one pass, and per-query top-k is a
  TakeOrderedAndProject-style window — O(corpus) per query, no quadratic
  shuffle. Right answer up to ~10^3 queries × any corpus size.
- ``ivf_topk``: the scale path. Corpus is bucketed by nearest centroid
  (inverted file); a query probes only ``nprobe`` cells, cutting scanned
  rows by ~|cells|/nprobe. Centroid assignment is one broadcast join; at
  100 TB the corpus is written bucketed-by-cell so probes prune partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from squirreling_spark.qutil import spread


def _to_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Queries broadcast;
    similarity rounded before ranking so ordering is reproducible."""
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), round_digits)
    scored = (
        spread(corpus)  # vector math is CPU-bound: use every core
        .join(F.broadcast(queries), F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, sim.alias("sim"))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """IVF build: tag every corpus row with its nearest centroid cell.
    Centroids broadcast; one pass over the corpus, rank-1 per row."""
    sim = cosine(F.col(c_vec), F.col(cent_vec))
    w = Window.partitionBy(c_id).orderBy(F.desc(F.round(sim, 6)), F.col(cent_id))
    return (
        spread(corpus)
        .crossJoin(F.broadcast(centroids))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r", cent_vec)
        .withColumnRenamed(cent_id, "cell")
    )


def ivf_topk(
    queries: DataFrame,
    corpus_with_cells: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF search: rank centroids per query, probe top-``nprobe`` cells,
    then exact cosine inside the probed cells only."""
    cent_sim = F.round(cosine(F.col(q_vec), F.col("cent_vec")), 6)
    wq = Window.partitionBy(q_id).orderBy(F.desc(cent_sim), F.col("cent_id"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select(q_id, q_vec, F.col("cent_id").alias("cell"))
    )
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), 6)
    scored = (
        corpus_with_cells.join(F.broadcast(probes), "cell")
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, sim.alias("sim"))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )
