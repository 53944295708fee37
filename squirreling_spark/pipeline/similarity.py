"""Similarity search over embedding columns (array<float>).

- ``cosine`` builds a codegen'd cosine expression (no UDF): elements are
  cast to double so results are bit-identical across engines and partition
  layouts.
- ``cosine_topk_bruteforce``: exact baseline. Query side is broadcast; the
  corpus streams through one pass; per-query top-k is a two-stage
  (partition-local then global) ranking so no task ever receives a whole
  query's corpus — see ``_topk_per_query``. Right answer up to ~10^3
  queries × any corpus size.
- ``ivf_topk``: the scale path. Corpus is bucketed by nearest centroid
  (inverted file — assignment is a map-side-combining ``max_by``
  aggregate); a query probes only ``nprobe`` cells, cutting scanned rows
  by ~|cells|/nprobe. Centroids broadcast; at 100 TB the corpus is
  written bucketed-by-cell so probes prune partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from squirreling_spark.qutil import det_round, spread


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


def cosine_pre(a: Column, b: Column, n2a: Column, n2b: Column) -> Column:
    """``cosine`` with the two squared norms supplied as precomputed
    columns (r12, guide §1.2 per-task work): in a pair-producing stage
    (corpus × centroids, candidate verify, in-cell self-join) the HOF
    ``cosine`` re-folds ``norm2`` of BOTH sides on every output row —
    2/3 of the stage's FLOPs recompute row-constant values. Projecting
    each side's ``norm2`` ONCE (per corpus row / into the broadcast
    relation) and dividing here is bit-identical: ``norm2`` is the same
    fold expression, and ``dot / sqrt(n2a * n2b)`` is the exact IEEE
    operation sequence of ``cosine()`` (same invariant the block-matrix
    ε-join's numpy verifier relies on)."""
    return dot(_to_double(a), _to_double(b)) / F.sqrt(n2a * n2b)


def norm2d(col: Column) -> Column:
    """``norm2`` over the double-cast vector — the precomputed-side
    companion of ``cosine_pre``."""
    return norm2(_to_double(col))


def _topk_per_query(
    scored: DataFrame, k: int, q_id: str, c_id: str
) -> DataFrame:
    """Skew-safe per-query top-k over (q_id, c_id, sim) rows.

    A single ``Window.partitionBy(q_id)`` would shuffle O(corpus × queries)
    rows into #queries partitions — with few queries that's a handful of
    giant tasks at scale. Instead: (1) local top-k per (physical partition,
    q_id) — the shuffle key includes the input partition id, so the same
    row volume spreads over #partitions × #queries balanced buckets and
    each task ranks a bounded slice; (2) global top-k over the surviving
    ≤ #partitions × k rows per query — trivially small."""
    local = scored.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid", q_id).orderBy(
        F.col("sim").desc(), F.col(c_id)
    )
    pruned = (
        local.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__pid")
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )


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
    """Exact top-k by cosine for each query vector. Queries broadcast; the
    corpus streams through one pass; similarity rounded before ranking so
    ordering is reproducible; ranking via the skew-safe two-stage top-k.
    Squared norms precomputed per side (``cosine_pre``): the corpus norm
    folds once per corpus row, not once per (row, query)."""
    sim = F.round(
        cosine_pre(
            F.col(q_vec), F.col(c_vec), F.col("__n2q"), F.col("__n2c")
        ),
        round_digits,
    )
    scored = (
        spread(corpus)  # vector math is CPU-bound: use every core
        .withColumn("__n2c", norm2d(F.col(c_vec)))
        .join(
            F.broadcast(
                queries.withColumn("__n2q", norm2d(F.col(q_vec)))
            ),
            F.col(q_id) != F.col(c_id),
        )
        .select(q_id, c_id, sim.alias("sim"))
    )
    return _topk_per_query(scored, k, q_id, c_id)


def label_centroids(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Element-wise mean vector per label — the k-means / IVF-build
    primitive. posexplode to (label, dim, value) rows, then a decimal-exact
    partial-aggregated mean per (label, dim), then re-assembled in dim
    order. The (label, dim) key space is labels × dim — high-cardinality
    enough to spread, bounded enough that the final per-label rollup is
    tiny. Decimal accumulation keeps centroids identical under any
    partitioning (plain double sums drift with partition layout)."""
    exploded = spread(df).select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v"),
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_v"))
            ).alias("__pairs"),
            F.first("n").alias("n_vectors"),
        )
        .select(
            "label",
            "n_vectors",
            F.transform(
                F.col("__pairs"),
                lambda p: F.format_string(
                    f"%.{round_digits}f", F.round(p.getField("mean_v"), round_digits)
                ),
            ).alias("centroid_parts"),
        )
        .select(
            "label",
            "n_vectors",
            F.array_join("centroid_parts", "/").alias("centroid"),
        )
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
    Centroids broadcast; one pass over the corpus. Nearest-centroid is a
    ``max_by`` HASH AGGREGATE, not a window: the partial (map-side) merge
    keeps one candidate per corpus row per task, so the corpus × centroids
    product collapses before the shuffle — a row_number window here would
    sort-and-shuffle the whole product. Tie-break: highest sim, then
    smallest centroid id (struct comparison on (sim, -cent_id)).

    Both sides' squared norms are projected ONCE (corpus row / broadcast
    relation) instead of re-folded per (row, centroid) — bit-identical
    values, ~3× fewer FLOPs in the corpus × k stage (``cosine_pre``)."""
    sim = F.round(
        cosine_pre(
            F.col(c_vec), F.col(cent_vec), F.col("__n2r"), F.col("__n2c")
        ),
        6,
    )
    other_cols = [c for c in corpus.columns if c != c_id]
    return (
        spread(corpus)
        .withColumn("__n2r", norm2d(F.col(c_vec)))
        .crossJoin(
            F.broadcast(
                centroids.withColumn("__n2c", norm2d(F.col(cent_vec)))
            )
        )
        .groupBy(c_id)
        .agg(
            F.max_by(
                F.col(cent_id), F.struct(sim, (-F.col(cent_id)).alias("nid"))
            ).alias("cell"),
            *[F.first(c).alias(c) for c in other_cols],
        )
        .select(c_id, *other_cols, "cell")
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
    then exact cosine inside the probed cells only. The corpus-side
    squared norm folds once per corpus row (``cosine_pre``), not once
    per (row, probing query); the query norm rides the broadcast."""
    cent_sim = F.round(cosine(F.col(q_vec), F.col("cent_vec")), 6)
    wq = Window.partitionBy(q_id).orderBy(F.desc(cent_sim), F.col("cent_id"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= nprobe)
        .select(
            q_id,
            q_vec,
            F.col("cent_id").alias("cell"),
            norm2d(F.col(q_vec)).alias("__n2q"),
        )
    )
    sim = F.round(
        cosine_pre(
            F.col(q_vec), F.col(c_vec), F.col("__n2q"), F.col("__n2c")
        ),
        6,
    )
    scored = (
        corpus_with_cells.withColumn("__n2c", norm2d(F.col(c_vec)))
        .join(F.broadcast(probes), "cell")
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, sim.alias("sim"))
    )
    return _topk_per_query(scored, k, q_id, c_id)


def knn_join_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 3,
    planes: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate kNN self-join: every vector's top-k neighbors, at scale.

    The all-pairs kNN join (corpus x corpus) is the one similarity shape
    brute force can never survive — O(n^2) rows at 100 TB. Here candidates
    come from the same deterministic sign-hyperplane LSH bands as
    embedding_lsh_dedup (pipeline/dedup.py): only pairs sharing >= 1 band
    are scored with exact cosine, then ranked per vector by the skew-safe
    two-stage top-k. Vectors whose true neighbors never collide in a band
    are missed (sign-LSH recall < 1) — raise planes/bands for recall.

    Plan shape: band self-join keyed on (band_idx, band_key) — evenly
    hash-partitioned, never a cross product; candidate pairs symmetrized
    by a cheap union (a neighbor list is directional); two embedding
    joins on id; no window ever sees more than one partition x id slice."""
    from squirreling_spark.pipeline.dedup import hyperplane_lsh_candidates

    cand = hyperplane_lsh_candidates(df, vec_col, id_col, planes, bands, dim)
    sym = cand.union(
        cand.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__ea"),
        norm2d(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__eb"),
        norm2d(F.col(vec_col)).alias("__nb"),
    )
    scored = (
        sym.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.col("id_a").alias("q_id"),
            F.col("id_b").alias("vec_id"),
            F.round(
                cosine_pre(
                    F.col("__ea"),
                    F.col("__eb"),
                    F.col("__na"),
                    F.col("__nb"),
                ),
                6,
            ).alias("sim"),
        )
    )
    return _topk_per_query(scored, k, "q_id", "vec_id")


def label_outliers(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    k: int = 5,
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """The k LEAST-typical vectors of each label: decimal-exact label
    centroid, cosine(vector, own-label centroid), bottom-k per label —
    the mislabeled-point / noisy-example detector of an embedding-curated
    corpus (flag for review or drop before training).

    Scale shape: centroids are labels × dim rows (map-side-combined
    decimal means) broadcast back to the corpus; similarity is one
    codegen'd pass; the per-label bottom-k reuses the skew-safe two-stage
    ranking (partition-local prune, then a tiny global rank) so a label
    with half the corpus never lands in one task."""
    cents_arr = (
        spread(df)
        .select(
            F.col(label_col).alias("__lbl"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "dim", "v"
            ),
        )
        .groupBy("__lbl", "dim")
        .agg(
            det_round(
                F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                round_digits,
            ).alias("mean_v")
        )
        .groupBy("__lbl")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_v"))
            ).alias("__pairs")
        )
        .select(
            "__lbl",
            F.transform("__pairs", lambda p: p.getField("mean_v")).alias(
                "__cent"
            ),
        )
    )
    sim = F.round(cosine(F.col(vec_col), F.col("__cent")), round_digits)
    scored = (
        spread(df)
        .join(F.broadcast(cents_arr), F.col(label_col) == F.col("__lbl"))
        .select(
            F.col(id_col),
            F.col(label_col).alias("label"),
            sim.alias("sim"),
        )
    )
    # bottom-k = top-k over ascending sim: two-stage, like _topk_per_query
    # but ordered (sim ASC, id) and partitioned by label.
    local = scored.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid", "label").orderBy(
        F.col("sim").asc(), F.col(id_col)
    )
    pruned = (
        local.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__pid")
    )
    w = Window.partitionBy("label").orderBy(F.col("sim").asc(), F.col(id_col))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "label", "sim", "rank")
    )


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame | None = None,
    threshold: float = 0.8,
    cent_mod: int | None = None,
    k: int | None = None,
    iters: int = 2,
) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the embedding
    space, then inside each cluster mark a vector as a semantic duplicate
    if a LOWER-id vector in the same cluster sits within ``threshold``
    cosine — keep-first greedy, deterministic under any partitioning.
    Catches paraphrases/near-translations that survive lexical dedup.

    Scale shape: the quadratic step is CLUSTER-BLOCKED — the in-cell
    self-join keys on the cell id, so cost is Σ|cell|², bounded by cluster
    granularity (more centroids → smaller cells → cheaper verify), never
    the corpus square. Centroids broadcast; cell assignment is the same
    map-combined ``max_by`` aggregate as the IVF build (no window over the
    corpus × centroids product). Output: (vec_id, cell, n_close, is_dup) —
    n_close = lower-id in-cell neighbors within threshold.

    ``centroids`` defaults to a k-means-TRAINED set (pipeline/cluster.py,
    ``iters`` Lloyd rounds) with ``k = ceil(sqrt(n))`` — the classic IVF
    sizing that balances the two products: assignment is O(n·k) = O(n^1.5)
    and the in-cell pairwise step is O(n²/k) = O(n^1.5), so neither term
    goes quadratic as the corpus grows (the previous every-``cent_mod``-th
    default grew k WITH the corpus, making assignment O(n²/cent_mod) —
    18.9× wall at 10× data in the round-5 scale probe). Sizing k needs
    ``df.count()`` — one cheap column-pruned job at build time; pass ``k``
    explicitly to skip it, or pass ``centroids`` / legacy ``cent_mod`` to
    override the construction entirely."""
    if centroids is None:
        if cent_mod is not None:
            centroids = df.filter(F.col(id_col) % cent_mod == 0).select(
                F.col(id_col).alias("cent_id"),
                F.col(vec_col).alias("cent_vec"),
            )
        else:
            from .cluster import kmeans_centroids

            if k is None:
                import math

                n = df.count()
                k = max(4, math.isqrt(max(n - 1, 0)) + 1)  # ceil(sqrt(n))
            centroids = kmeans_centroids(
                df, vec_col, id_col, k=k, iters=iters
            ).select("cent_id", "cent_vec")
    assigned = assign_cells(
        df.select(id_col, vec_col), centroids, c_id=id_col, c_vec=vec_col
    )
    a = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
        norm2d(F.col(vec_col)).alias("__na"),
    )
    b = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
        norm2d(F.col(vec_col)).alias("__nb"),
    )
    # norms fold once per side row; the in-cell pair product reuses them
    # (cosine_pre — bit-identical, ~3× fewer FLOPs in the Σ|cell|² stage)
    sim = F.round(
        cosine_pre(
            F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
        ),
        6,
    )
    close = (
        a.join(b, "cell")
        .filter(F.col("__idb") < F.col("__ida"))
        .select("cell", "__ida", sim.alias("__sim"))
        .filter(F.col("__sim") >= threshold)
        .groupBy("__ida")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_close"))
    )
    return (
        assigned.join(close, assigned[id_col] == close["__ida"], "left")
        .select(
            F.col(id_col).alias("vec_id"),
            "cell",
            F.coalesce("n_close", F.lit(0)).cast("bigint").alias("n_close"),
            (F.coalesce("n_close", F.lit(0)) > 0).alias("is_dup"),
        )
    )


def cosine_block_join(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 512,
    round_digits: int = 6,
) -> DataFrame:
    """EXACT all-pairs cosine ε-join as a block-matrix product.

    The naive exact verifier (a < b theta-join + the per-pair HOF dot
    product) materializes O(n²) join ROWS and evaluates an interpreted
    64-term fold on every one. Same asymptotics, different constants —
    the classical block-nested-loop formulation every distributed
    exact-similarity system uses:

    1. every vector is hashed to one of ``m = ceil(n/block)`` blocks by
       ``xxhash64(id) % m`` — membership depends only on the id, NEVER on
       physical layout, so the blocks subtree can be recomputed on both
       sides of the self-join (or on task retry on a real cluster) and
       always packs identically;
    2. each block packs to ONE row (ids + a ``block×d`` matrix) via
       ``applyInPandas``;
    3. the m(m+1)/2 unordered block pairs come from ``spark.range(m)``
       cross ``spark.range(m)`` (tiny, id-only — no data in the
       nested-loop); two bid equi-joins attach the packed matrices, so
       shuffle volume is O(n·m) = O(n²/block) VALUES instead of O(n²)
       rows — ``block`` is the replication divisor;
    4. one ``mapInPandas`` per block pair runs a single dgemm
       (``Va @ Vb.T`` — BLAS, ~raw-FLOP speed) with a
       ``threshold - 10^-round_digits`` slack mask, then recomputes the
       few survivors with a LEFT-TO-RIGHT float64 fold over dims — the
       exact IEEE operation sequence of the ``cosine()`` HOF expression
       (products, then a sequential ``acc + v`` fold; ``norm2`` the same)
       — so emitted sims are bit-identical to the HOF plan and the DuckDB
       oracle, and the BLAS value only ever decides membership with 1e-6
       slack against a ~1e-14 error bound.

    Still O(n²) FLOPs — an exact ε-join on unstructured vectors cannot
    beat that (this fixture is isotropic with planted near-dups; centroid
    triangle-inequality pruning measurably removes nothing, which is WHY
    ``dedup_embedding_lsh`` is the approximate default at scale) — but
    the work is dense linear algebra on O(n²/block) shuffled values, not
    an interpreted fold on O(n²) shuffled rows. Rounding happens
    Spark-side (``F.round``) on the bit-identical raw sim, keeping the
    round semantics of the previous plan."""
    import math

    spark = df.sparkSession
    n = df.count()
    m = max(1, math.ceil(n / block))

    # NULL / ragged vectors would otherwise raise inside the packing
    # task's np.array construction (or the dgemm) — filter them out
    # row-locally before blocking, matching the defensive handling in the
    # image decode paths. A NULL vector has no cosine to anything, and a
    # wrong-dimension vector is malformed input, so dropping is the
    # correct ε-join semantics (the HOF verifier yields NULL sims for
    # them, which never pass the threshold either). Reference dimension =
    # the first non-null row's (one LIMIT-1 probe; no extra full scan).
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).filter(F.col("vec").isNotNull())
    ref = e.select(F.size("vec").alias("d")).first()
    if ref is not None:
        e = e.filter(F.size("vec") == int(ref["d"]))
    e = e.withColumn("bid", F.pmod(F.xxhash64(F.col("id")), F.lit(m)))

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("id")
        return pd.DataFrame(
            {
                "bid": [int(pdf["bid"].iloc[0])],
                "ids": [pdf["id"].tolist()],
                "vecs": [[list(v) for v in pdf["vec"]]],
            }
        )

    blocks = e.groupBy("bid").applyInPandas(
        _pack, schema="bid bigint, ids array<bigint>, vecs array<array<double>>"
    )

    pairs = (
        spark.range(m)
        .select(F.col("id").alias("pa"))
        .crossJoin(spark.range(m).select(F.col("id").alias("pb")))
        .filter(F.col("pa") <= F.col("pb"))
    )
    joined = (
        pairs.join(
            blocks.select(
                F.col("bid").alias("pa"),
                F.col("ids").alias("ids_a"),
                F.col("vecs").alias("vecs_a"),
            ),
            "pa",
        )
        .join(
            blocks.select(
                F.col("bid").alias("pb"),
                F.col("ids").alias("ids_b"),
                F.col("vecs").alias("vecs_b"),
            ),
            "pb",
        )
    )

    slack = 10.0 ** (-round_digits)
    thr = threshold

    def _emit(batches):
        import numpy as np
        import pandas as pd

        def seq_norm2(V):
            acc = np.zeros(V.shape[0])
            for d in range(V.shape[1]):
                acc = acc + V[:, d] * V[:, d]
            return acc

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                Va = np.array([np.asarray(v) for v in row.vecs_a])
                Vb = np.array([np.asarray(v) for v in row.vecs_b])
                na, nb = seq_norm2(Va), seq_norm2(Vb)
                G = Va @ Vb.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    mask = G / np.sqrt(np.outer(na, nb)) >= thr - slack
                # each unordered vector pair appears in exactly one
                # unordered block pair; within the diagonal block pair
                # the full grid holds both orientations + self-pairs, so
                # keep the id_a < id_b triangle there
                if row.pa == row.pb:
                    mask &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(mask)
                if len(ii) == 0:
                    continue
                Ac, Bc = Va[ii], Vb[jj]
                acc = np.zeros(len(ii))
                for d in range(Ac.shape[1]):
                    acc = acc + Ac[:, d] * Bc[:, d]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = acc / np.sqrt(na[ii] * nb[jj])
                ida, idb = ids_a[ii], ids_b[jj]
                yield pd.DataFrame(
                    {
                        "id_a": np.minimum(ida, idb),
                        "id_b": np.maximum(ida, idb),
                        "sim_raw": sim,
                    }
                )

    raw = joined.mapInPandas(
        _emit, schema="id_a bigint, id_b bigint, sim_raw double"
    )
    return raw.select(
        "id_a",
        "id_b",
        F.round(F.col("sim_raw"), round_digits).alias("sim"),
    ).filter(F.col("sim") >= threshold)
