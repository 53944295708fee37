"""Product quantization (PQ) for approximate nearest neighbour at scale
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the codebook behind FAISS's IVF-PQ indexes).

Why this exists at 100 TB: a 64-dim float64 embedding is 512 bytes; its
PQ code is ``m`` small ints (m=4 here → 4 bytes at ksub ≤ 256). The
corpus-sized state that search must touch shrinks ~128×, which is the
difference between an ANN sweep that fits in cluster memory and one that
doesn't. Search reads ONLY the code table; the full vectors are touched
just once at encode time (and optionally for re-ranking the final
candidates).

Spark-first shapes:
- **Train** (`pq_codebooks`): each vector splits into ``m`` disjoint
  subvectors; per subspace, a k-means codebook of ``ksub`` centroids.
  All ``m`` subspace Lloyd rounds run in ONE job per iteration — the
  subspace id is just another grouping key: assignment is a broadcast
  join on ``sub`` + a map-combined ``max_by`` per (vector, subspace);
  means are decimal-exact per (sub, centroid, dim). No per-subspace
  driver loop.
- **Encode** (`pq_encode`): one more assignment pass → (id, sub, code)
  rows, m per vector.
- **Search** (`pq_adc_topk`): asymmetric distance computation. The
  query-to-centroid lookup table (queries × m × ksub rows — tiny) is
  broadcast; each corpus CODE row joins its partial dot/norm, and the
  per-(query, vector) totals reduce with ONE map-combined aggregate.
  Because subspaces are disjoint, the reconstruction identities are
  exact: dot(q, x̂) = Σ_s dot(q_s, c_s[code_s]) and |x̂|² = Σ_s |c_s|²,
  so the approximate cosine is the EXACT cosine of the reconstruction —
  fully deterministic and oracle-replayable. The m partial sums add in
  fixed subspace order (conditional single-element aggregates), not in
  shuffle order, so results are partition-independent without decimals.

Determinism: seeds are the ``ksub`` lowest-id vectors (same convention
as pipeline/cluster.py), assignment tie-breaks on (sim DESC, centroid id
ASC), means are decimal-accumulated and det-rounded — the whole
build+search replays bit-for-bit in DuckDB (`knn_pq_adc` oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from squirreling_spark.pipeline.similarity import (
    _topk_per_query,
    cosine,
    cosine_pre,
    dot,
    norm2,
    norm2d,
)
from squirreling_spark.qutil import det_round, spread


def subspace_frame(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int,
    dsub: int,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(__id, *extra_cols, sub, subvec): each vector exploded into its m
    disjoint subvectors. ``inline`` of a literal struct array — row-local.
    ``extra_cols`` ride along unchanged (e.g. the IVF cell id, so encode
    can emit inverted-list rows without a second corpus join)."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub"),
                F.slice(
                    F.col(vec_col).cast("array<double>"), s * dsub + 1, dsub
                ).alias("subvec"),
            )
            for s in range(m)
        ]
    )
    return df.select(
        F.col(id_col).alias("__id"), *(extra_cols or []), F.inline(slices)
    )


def _assign_codes(
    frame: DataFrame,
    cents: DataFrame,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Nearest codebook centroid per (vector, subspace): broadcast join
    on the subspace id, then a map-side-combining max_by — the corpus ×
    ksub product collapses inside each task (same shape as
    similarity.assign_cells). Squared norms fold once per (vector, sub)
    row / broadcast centroid, not per product row (``cosine_pre``)."""
    sim = F.round(
        cosine_pre(
            F.col("subvec"), F.col("cent_vec"), F.col("__n2s"), F.col("__n2c")
        ),
        6,
    )
    return (
        frame.withColumn("__n2s", norm2d(F.col("subvec")))
        .join(
            F.broadcast(cents.withColumn("__n2c", norm2d(F.col("cent_vec")))),
            "sub",
        )
        .groupBy("__id", "sub")
        .agg(
            F.max_by(
                "cent_id",
                F.struct(sim.alias("s"), (-F.col("cent_id")).alias("nid")),
            ).alias("code"),
            F.first("subvec").alias("subvec"),
            *[F.first(c).alias(c) for c in extra_cols or []],
        )
    )


def _codebook_means(assigned: DataFrame, round_digits: int) -> DataFrame:
    """Decimal-exact element-wise mean per (sub, code) — the subspace
    variant of cluster._mean_centroids."""
    per_dim = (
        assigned.select(
            "sub",
            F.col("code").alias("cent_id"),
            F.posexplode("subvec").alias("dim", "v"),
        )
        .groupBy("sub", "cent_id", "dim")
        .agg(
            det_round(
                F.sum(F.col("v").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)),
                round_digits,
            ).alias("mean_v")
        )
    )
    return (
        per_dim.groupBy("sub", "cent_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_v"))
            ).alias("__p")
        )
        .select(
            "sub",
            "cent_id",
            F.transform("__p", lambda p: p.getField("mean_v")).alias(
                "cent_vec"
            ),
        )
    )


def pq_codebooks(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    iters: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Train the m per-subspace codebooks: (sub, cent_id, cent_vec)."""
    dsub = dim // m
    frame = subspace_frame(spread(df, by=[id_col]), vec_col, id_col, m, dsub)
    seed_ids = (
        df.select(F.col(id_col).alias("__sid")).orderBy("__sid").limit(ksub)
    )
    cents = (
        frame.join(
            F.broadcast(seed_ids), frame["__id"] == F.col("__sid")
        )
        .select(
            "sub",
            F.col("__id").alias("cent_id"),
            F.col("subvec").alias("cent_vec"),
        )
        .persist()
    )
    cents.count()
    for it in range(iters):
        prev = cents
        assigned = _assign_codes(frame, prev)
        cents = _codebook_means(assigned, round_digits).persist()
        cents.count()
        if it < iters - 1:
            prev.unpersist()
    return cents


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra_cols, sub, code) — the corpus compressed to m small
    ints per vector. This (not the vectors) is what search reads."""
    dsub = dim // m
    frame = subspace_frame(
        spread(df, by=[id_col]), vec_col, id_col, m, dsub, extra_cols=extra_cols
    )
    return _assign_codes(frame, codebooks, extra_cols=extra_cols).select(
        F.col("__id").alias(id_col), *(extra_cols or []), "sub", "code"
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 4,
    dim: int = 64,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k: per (query, vector), approximate cosine
    of the query against the PQ reconstruction, computed from the code
    table + broadcast lookup table only.

    ``exclude_self`` drops corpus rows whose id equals the query id — the
    right default when queries are drawn from the corpus itself. Pass
    False when queries come from a SEPARATE id space: an id collision
    there is a legitimate neighbor, not a self-match."""
    dsub = dim // m
    qsub = subspace_frame(queries, q_vec, q_id, m, dsub)
    tbl = (
        qsub.join(F.broadcast(codebooks), "sub")
        .select(
            F.col("__id").alias("__q"),
            "sub",
            F.col("cent_id").alias("code"),
            dot(F.col("subvec"), F.col("cent_vec")).alias("pdot"),
            norm2(F.col("cent_vec")).alias("pnorm2"),
        )
    )
    qn = queries.select(
        F.col(q_id).alias("__q"), norm2(F.col(q_vec)).alias("qn2")
    )
    parts = (
        codes.join(F.broadcast(tbl), ["sub", "code"])
        .groupBy(F.col("__q"), F.col(c_id))
        .agg(
            *[
                F.sum(
                    F.when(F.col("sub") == s, F.col("pdot"))
                ).alias(f"d{s}")
                for s in range(m)
            ],
            *[
                F.sum(
                    F.when(F.col("sub") == s, F.col("pnorm2"))
                ).alias(f"n{s}")
                for s in range(m)
            ],
        )
    )
    adot = F.col("d0")
    rn2 = F.col("n0")
    for s in range(1, m):
        adot = adot + F.col(f"d{s}")
        rn2 = rn2 + F.col(f"n{s}")
    sim = F.round(adot / F.sqrt(F.col("qn2") * rn2), 6)
    scored = parts.join(F.broadcast(qn), "__q")
    if exclude_self:
        scored = scored.filter(F.col("__q") != F.col(c_id))
    scored = scored.select(
        F.col("__q").alias(q_id), c_id, sim.alias("sim")
    )
    return _topk_per_query(scored, k, q_id, c_id)


def pq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    rerank: int = 40,
    m: int = 4,
    dim: int = 64,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """ADC candidate generation + exact re-rank — the standard PQ recipe
    (measured at sf0.01: recall@5 0.10 raw ADC at ksub=8 → 0.88 with
    ksub=32 + rerank=100; see tests/test_pq_recall.py). The compressed
    sweep touches only the code table; full vectors are fetched for just
    ``rerank`` candidates per query (a broadcast-sized set), so the
    memory story survives: corpus-scale state stays ~128× smaller than
    the raw vectors."""
    cand = pq_adc_topk(
        queries, codes, codebooks, k=rerank, m=m, dim=dim,
        q_id=q_id, q_vec=q_vec, c_id=c_id,
    ).select(q_id, c_id)
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), 6)
    rer = (
        corpus.join(F.broadcast(cand), c_id)
        .join(F.broadcast(queries), q_id)
        .select(q_id, c_id, sim.alias("sim"))
    )
    return _topk_per_query(rer, k, q_id, c_id)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + PQ-coded residuals — the composition
# FAISS ships as `IVFx,PQy` and the standard billion-scale ANN layout
# (Jégou et al. 2011 §V; no reference counterpart — squirreling has no
# vector search). IVF buys selectivity (search touches only the probed
# cells' lists, ~nprobe/k_coarse of the corpus); PQ buys density (each
# list stores m small ints per vector, not the vector). Encoding the
# RESIDUAL x − c(x) instead of x is what makes the two compose: residuals
# are centered near zero, so one shared ksub-way codebook per subspace
# quantizes them far more finely than it could quantize raw vectors.
# ---------------------------------------------------------------------------


def ivfpq_build(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k_coarse: int = 8,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
    coarse_iters: int = 1,
    pq_iters: int = 1,
    round_digits: int = 6,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the index: ``(coarse, codebooks, codes)``.

    - coarse: (cent_id, cent_vec, n_vecs) — k-means coarse quantizer
      (pipeline/cluster.py, deterministic lowest-id seeds).
    - codebooks: (sub, cent_id, cent_vec) — per-subspace codebooks
      trained on RESIDUALS.
    - codes: (id, cell, sub, code) — the inverted-list code table; the
      cell id rides through encode's own (id, sub) aggregate
      (``extra_cols``), so emitting list-partitioned codes costs no
      second corpus join. This table — m ints + a cell id per vector —
      is the ONLY corpus-scale state search reads.
    """
    from squirreling_spark.pipeline.cluster import kmeans_centroids
    from squirreling_spark.pipeline.similarity import assign_cells

    coarse = kmeans_centroids(
        df, vec_col, id_col, k=k_coarse, iters=coarse_iters,
        round_digits=round_digits,
    )
    cells = assign_cells(
        df.select(id_col, vec_col), coarse, c_id=id_col, c_vec=vec_col
    )
    resid = cells.join(
        F.broadcast(
            coarse.select(F.col("cent_id").alias("cell"), "cent_vec")
        ),
        "cell",
    ).select(
        id_col,
        "cell",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            "cent_vec",
            lambda a, b: a - b,
        ).alias("__resid"),
    )
    # r12 (guide §5): every downstream consumer — codebook seeding, each
    # Lloyd round, the final encode — otherwise replays the full corpus
    # assignment + residual chain (measured 4 full recomputes per build
    # at sf0.1). One corpus-sized MEMORY_AND_DISK persist amortizes it;
    # at 100 TB this is the standard "materialize the training frame"
    # step (FAISS trains on a sample for the same reason) and spills
    # rather than OOMs.
    resid = resid.persist()
    codebooks = pq_codebooks(
        resid, "__resid", id_col, m=m, ksub=ksub, dim=dim, iters=pq_iters,
        round_digits=round_digits,
    )
    codes = pq_encode(
        resid, "__resid", id_col, codebooks, m=m, dim=dim,
        extra_cols=["cell"],
    )
    return coarse, codebooks, codes


def ivfpq_search(
    queries: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    m: int = 4,
    dim: int = 64,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    round_digits: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC search over the probed cells' inverted lists only.
    ``exclude_self``: see ``pq_adc_topk`` — set False when query ids live
    in a separate id space from corpus ids.

    The reconstruction is x̂ = c + r̂ with disjoint subspaces, so both
    terms of cosine(q, x̂) decompose EXACTLY into table lookups:

        dot(q, x̂)  = dot(q, c) + Σ_s dot(q_s, cb_s[code_s])
        |x̂|²       = |c|² + 2·Σ_s dot(c_s, cb_s[code_s]) + Σ_s |cb_s[code_s]|²

    Three broadcast-sized tables feed a single pass over the code rows:
    probes (queries × nprobe: dot(q,c), |c|²), qtab (queries × m × ksub:
    dot(q_s, cb)), ctab (k_coarse × m × ksub: the cross term and code
    norms — query-independent, could be precomputed at build). The join
    of codes against broadcast probes IS the inverted-list restriction:
    only rows whose cell a query probes survive, ~nprobe/k_coarse of the
    corpus, and everything reduces in ONE map-combined aggregate with
    fixed-subspace-order partial sums (partition-independent, no
    decimals needed) before the two-stage top-k."""
    from pyspark.sql import Window

    dsub = dim // m
    cent_sim = F.round(
        cosine(F.col(q_vec), F.col("cent_vec")), round_digits
    )
    wq = Window.partitionBy(q_id).orderBy(
        F.desc(cent_sim), F.col("cent_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(coarse))
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select(
            F.col(q_id).alias("__q"),
            F.col("cent_id").alias("cell"),
            dot(
                F.col(q_vec).cast("array<double>"), F.col("cent_vec")
            ).alias("qc_dot"),
            norm2(F.col("cent_vec")).alias("cn2"),
        )
    )
    qsub = subspace_frame(queries, q_vec, q_id, m, dsub)
    qtab = qsub.join(F.broadcast(codebooks), "sub").select(
        F.col("__id").alias("__q"),
        "sub",
        F.col("cent_id").alias("code"),
        dot(F.col("subvec"), F.col("cent_vec")).alias("qdot"),
    )
    csub = subspace_frame(
        coarse.select(F.col("cent_id").alias("cell"), "cent_vec"),
        "cent_vec",
        "cell",
        m,
        dsub,
    )
    ctab = csub.join(F.broadcast(codebooks), "sub").select(
        F.col("__id").alias("cell"),
        "sub",
        F.col("cent_id").alias("code"),
        dot(F.col("subvec"), F.col("cent_vec")).alias("xdot"),
        norm2(F.col("cent_vec")).alias("pn2"),
    )
    qn = queries.select(
        F.col(q_id).alias("__q"),
        norm2(F.col(q_vec).cast("array<double>")).alias("qn2"),
    )
    parts = (
        codes.join(F.broadcast(probes), "cell")
        .join(F.broadcast(qtab), ["__q", "sub", "code"])
        .join(F.broadcast(ctab), ["cell", "sub", "code"])
        .groupBy("__q", c_id)
        .agg(
            F.first("qc_dot").alias("qc_dot"),
            F.first("cn2").alias("cn2"),
            *[
                F.sum(F.when(F.col("sub") == s, F.col("qdot"))).alias(
                    f"d{s}"
                )
                for s in range(m)
            ],
            *[
                F.sum(F.when(F.col("sub") == s, F.col("xdot"))).alias(
                    f"x{s}"
                )
                for s in range(m)
            ],
            *[
                F.sum(F.when(F.col("sub") == s, F.col("pn2"))).alias(
                    f"n{s}"
                )
                for s in range(m)
            ],
        )
    )
    adot = F.col("qc_dot")
    xsum = F.lit(0.0)
    nsum = F.lit(0.0)
    for s in range(m):
        adot = adot + F.col(f"d{s}")
        xsum = xsum + F.col(f"x{s}")
        nsum = nsum + F.col(f"n{s}")
    rn2 = F.col("cn2") + F.lit(2.0) * xsum + nsum
    sim = F.round(adot / F.sqrt(F.col("qn2") * rn2), round_digits)
    scored = parts.join(F.broadcast(qn), "__q")
    if exclude_self:
        scored = scored.filter(F.col("__q") != F.col(c_id))
    scored = scored.select(
        F.col("__q").alias(q_id), c_id, sim.alias("sim")
    )
    return _topk_per_query(scored, k, q_id, c_id)


def ivfpq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    k: int = 5,
    rerank: int = 40,
    nprobe: int = 2,
    m: int = 4,
    dim: int = 64,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF-PQ candidate generation + exact re-rank of the survivors —
    the full FAISS-style serving path: compressed inverted-list sweep
    first, full vectors fetched only for ``rerank`` candidates per query
    (a broadcast-sized set)."""
    cand = ivfpq_search(
        queries, coarse, codebooks, codes, k=rerank, nprobe=nprobe, m=m,
        dim=dim, q_id=q_id, q_vec=q_vec, c_id=c_id,
    ).select(q_id, c_id)
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), 6)
    rer = (
        corpus.join(F.broadcast(cand), c_id)
        .join(F.broadcast(queries), q_id)
        .select(q_id, c_id, sim.alias("sim"))
    )
    return _topk_per_query(rer, k, q_id, c_id)


def int8_quantize(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    levels: int = 127,
) -> DataFrame:
    """Symmetric per-vector INT8 scalar quantization — the storage tier
    below PQ (4× smaller than float32 with near-exact recall; what
    vector stores call SQ8): ``scale = max|x| / levels``, ``code_i =
    floor(x_i/scale + 0.5)`` clamped to ±levels.

    Determinism: ``scale`` is one IEEE division of exact inputs;
    ``floor(x/scale + 0.5)`` is exact half-toward-+∞ rounding (both
    engines' ``floor`` is exact, unlike their ROUND(double) tie
    behavior); the reconstruction error folds left-associative like
    every repo cosine, then quantizes via det_round — so every output
    is bit-identical cross-engine. All-row-local: one scan, zero
    shuffle, zero Python; at 100 TB this runs at ingest bandwidth and
    the codes write 4× less than the raw vectors.

    Output: (id, n_dims, scale, n_clipped, fp_codes — md5 of the
    '/'-joined codes, the list-free code contract — l2_err rounded to
    1e-9)."""
    # Two-stage select: codes/scale materialize as named columns once, so
    # the downstream fingerprint, clip count, and error fold reuse them
    # instead of re-expanding the quantization expression tree per
    # consumer (measured 2.5s -> ~1s on the sf0.1 bench row).
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(float(levels))
    raw_code = lambda x: F.floor(x / scale + F.lit(0.5))
    code = lambda x: F.greatest(
        F.lit(-levels).cast("bigint"),
        F.least(F.lit(levels).cast("bigint"), raw_code(x)),
    )
    staged = df.select(
        F.col(id_col),
        v.alias("__v"),
        scale.alias("scale"),
        F.transform(v, code).alias("__codes"),
        F.size(F.filter(v, lambda x: F.abs(raw_code(x)) > levels))
        .cast("bigint")
        .alias("n_clipped"),
    )
    l2_err = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.col("__codes"),
            lambda x, c: (x - c * F.col("scale"))
            * (x - c * F.col("scale")),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, e: acc + e,
    )
    from squirreling_spark.qutil import det_round

    return staged.select(
        F.col(id_col),
        F.size("__v").cast("bigint").alias("n_dims"),
        "scale",
        "n_clipped",
        F.md5(F.array_join(F.col("__codes"), "/")).alias("fp_codes"),
        det_round(l2_err, 9).alias("l2_err"),
    )
