"""Corpus-hygiene queries: segment dedup, repetition signals, benchmark
contamination, stratified sampling, TF-IDF terms — the data-cleaning pass a
training pipeline runs over raw documents (beyond the reference's operator
set; the reference stops at relational ops, see SURVEY.md §2 north-star
note). Each query has an exact DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from squirreling_spark import inventory
from squirreling_spark import queries_pipeline  # noqa: F401  (registers the dedup_minhash_lsh oracle this module's cluster oracle builds on)
from squirreling_spark.inventory import query
from squirreling_spark.pipeline.corpus import (
    contamination_check,
    dedup_segments,
    repetition_stats,
    stratified_sample,
    tfidf_top_terms,
)
from squirreling_spark.pipeline.dedup import dedup_clusters
from squirreling_spark.qutil import t

# Shared oracle fragment: whitespace-normalized token array per document.
_TK = (
    "SELECT doc_id, source, string_split(trim(regexp_replace(text, '\\s+', "
    "' ', 'g')), ' ') AS t FROM documents"
)

_BENCH_MOD = 97  # pseudo-benchmark: every 97th document


@query(
    "dedup_segments",
    oracle=f"""
    WITH tk AS ({_TK}),
    seg AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(t[(i*8+1):((i+1)*8)], ' ') AS seg
      FROM tk, unnest(generate_series(0,
             CAST(ceil(len(t) / 8.0) AS INT) - 1)) AS u(i)
    ),
    keeper AS (
      SELECT seg, min(struct_pack(d := doc_id, i := seg_idx)) AS k
      FROM seg GROUP BY seg
    ),
    marked AS (
      SELECT s.doc_id, s.seg_idx, s.seg,
             struct_pack(d := s.doc_id, i := s.seg_idx) != k.k AS is_dup
      FROM seg s JOIN keeper k USING (seg)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(count(*) - sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CASE WHEN count(*) > sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
                THEN md5(string_agg(CASE WHEN NOT is_dup THEN seg END,
                                    ' ' ORDER BY seg_idx))
           END AS clean_fp
    FROM marked GROUP BY doc_id
    """,
)
def dedup_segments_q(spark, sf):
    """CCNet-style corpus-wide segment dedup (pipeline/corpus.py): 8-token
    windows, first occurrence by (doc_id, seg_idx) survives, documents
    re-assembled from surviving segments. min-struct keeper aggregate +
    segment-keyed join — no windows, scales by segment cardinality."""
    return dedup_segments(t(spark, sf, "documents"), "text", "doc_id")


@query(
    "text_repetition",
    oracle=f"""
    WITH tk AS ({_TK}),
    bg AS (
      SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS ndis,
             t[i] || ' ' || t[i+1] AS bg
      FROM tk, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ),
    per_bg AS (
      SELECT doc_id, bg, count(*) AS c, min(n) AS n, min(ndis) AS ndis
      FROM bg GROUP BY doc_id, bg
    ),
    per_doc AS (
      SELECT doc_id, min(n) AS n, min(ndis) AS ndis,
             sum(c) AS n_bigrams,
             max(struct_pack(c := c, b := bg)) AS top,
             coalesce(sum(c) FILTER (c > 1), 0) AS dup_bg
      FROM per_bg GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           top.b AS top_bigram,
           CAST(top.c AS BIGINT) AS top_bigram_count,
           round(2 * top.c / n, 6) AS top_bigram_token_frac,
           round(dup_bg / n_bigrams, 6) AS dup_bigram_frac,
           round(1 - ndis / n, 6) AS dup_token_frac
    FROM per_doc
    """,
)
def text_repetition_q(spark, sf):
    """Gopher-style repetition filters (pipeline/corpus.py): top-bigram
    coverage, duplicated-bigram fraction, duplicated-token fraction per
    document. Two doc-keyed aggregations, map-side partials, no windows."""
    return repetition_stats(t(spark, sf, "documents"), "text", "doc_id")


@query(
    "contamination_check",
    oracle=f"""
    WITH tk AS ({_TK}),
    g AS (
      SELECT doc_id, array_to_string(t[i:i+2], ' ') AS ng
      FROM tk, unnest(generate_series(1, len(t) - 2)) AS u(i)
    ),
    bench AS (
      SELECT DISTINCT ng FROM g WHERE doc_id % {_BENCH_MOD} = 0
    )
    SELECT g.doc_id, CAST(count(DISTINCT g.ng) AS BIGINT) AS n_hits
    FROM g JOIN bench USING (ng)
    WHERE g.doc_id % {_BENCH_MOD} <> 0
    GROUP BY g.doc_id
    """,
)
def contamination_check_q(spark, sf):
    """Benchmark decontamination scan (pipeline/corpus.py): corpus documents
    sharing any word 3-gram with the held-out set (doc_id % 97 = 0 here;
    a real benchmark table plugs into the same predicate). N-gram-keyed
    join, benchmark side distinct'd first — AQE broadcasts it when small."""
    return contamination_check(
        t(spark, sf, "documents"),
        "text",
        "doc_id",
        bench_pred=lambda c: c % _BENCH_MOD == 0,
        n=3,
    )


@query(
    "sample_stratified",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             md5('mix:' || CAST(doc_id AS VARCHAR)) AS hh,
             20 + (CAST(substr(source, 4) AS INT) * 7) % 60 AS rate
      FROM documents
    )
    SELECT doc_id, source,
           CAST(((instr('0123456789abcdef', hh[1]) - 1) * 4096
               + (instr('0123456789abcdef', hh[2]) - 1) * 256
               + (instr('0123456789abcdef', hh[3]) - 1) * 16
               + (instr('0123456789abcdef', hh[4]) - 1)) % 100
             AS BIGINT) AS bucket,
           CAST(rate AS BIGINT) AS rate
    FROM h
    WHERE ((instr('0123456789abcdef', hh[1]) - 1) * 4096
         + (instr('0123456789abcdef', hh[2]) - 1) * 256
         + (instr('0123456789abcdef', hh[3]) - 1) * 16
         + (instr('0123456789abcdef', hh[4]) - 1)) % 100 < rate
    """,
)
def sample_stratified_q(spark, sf):
    """Deterministic stratified sampling / domain mixing
    (pipeline/corpus.py): per-source keep-rate 20 + (src_num*7) mod 60
    percent, membership from a salted md5 bucket of doc_id. Row-local —
    zero shuffles; a document's fate never changes as the corpus grows."""
    return stratified_sample(
        t(spark, sf, "documents"),
        "doc_id",
        "source",
        rate_col=lambda s: 20
        + (F.expr("cast(substring(source, 4) as int)") * 7) % 60,
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tk AS ({_TK}),
    tok AS (SELECT doc_id, unnest(t) AS term FROM tk),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    s AS (
      SELECT doc_id, term, tf, df, (tf * n_docs) / df AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    ),
    r AS (
      SELECT doc_id, term, tf, df, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
      FROM s
    )
    SELECT doc_id, term, tf, df, round(score, 6) AS tfidf, rank
    FROM r WHERE rank <= 3
    """,
)
def tfidf_top_terms_q(spark, sf):
    """Top-3 TF-IDF terms per document (pipeline/corpus.py). idf kept as
    the exact rational n_docs/df (one IEEE division, bit-identical across
    engines — ln() is libm-dependent and is not); ties break on term."""
    return tfidf_top_terms(t(spark, sf, "documents"), "text", "doc_id")


# Near-dup CLUSTERS: LSH candidate pairs -> connected components. The
# oracle reuses the dedup_minhash_lsh pair SQL (registered by
# queries_pipeline, imported above) and closes it transitively with a
# recursive CTE — min reachable id == the propagation fixpoint.
_PAIRS_SQL = inventory.ORACLES["dedup_minhash_lsh"]


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id,
           least(s, min(d)) AS cluster_id,
           CAST(count(DISTINCT d) FILTER (WHERE d <> s) + 1 AS BIGINT)
             AS cluster_size
    FROM reach GROUP BY s
    """,
)
def dedup_clusters_q(spark, sf):
    """Duplicate GROUPS from MinHash+LSH pairs via distributed connected
    components (pipeline/dedup.py::connected_components): min-label
    propagation with pointer-jumping shortcut edges — O(log diameter)
    rounds, one node-keyed shuffle per round. Output (doc_id, cluster_id,
    cluster_size); keep `doc_id = cluster_id` for one canonical doc per
    near-dup cluster. This is the step between candidate pairs and an
    actually-deduplicated corpus at 100 TB."""
    return dedup_clusters(
        t(spark, sf, "documents"), "text", "doc_id", num_hashes=32, bands=8
    )


_FP_NORM = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


@query(
    "dedup_incremental",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, {_FP_NORM} AS fingerprint FROM documents
    ),
    seen AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 3 = 0),
    batch AS (
      SELECT fingerprint, min(doc_id) AS keep_id,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM fp WHERE doc_id % 3 <> 0 GROUP BY fingerprint
    )
    SELECT b.fingerprint, b.keep_id, b.n_copies
    FROM batch b LEFT JOIN seen s USING (fingerprint)
    WHERE s.fingerprint IS NULL
    """,
)
def dedup_incremental_q(spark, sf):
    """Incremental (daily-batch) dedup: docs with doc_id % 3 == 0 play the
    historical fingerprint store; the rest are the new batch. Batch-local
    exact dedup + LEFT ANTI join against the store
    (pipeline/dedup.py::incremental_dedup) — at 100 TB the store is
    bucketed on fingerprint so only the day's batch shuffles."""
    from squirreling_spark.pipeline.dedup import (
        incremental_dedup,
        normalized_fingerprint,
    )

    docs = t(spark, sf, "documents")
    seen = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(normalized_fingerprint("text").alias("fingerprint"))
    )
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    out = incremental_dedup(batch, seen, "text", "doc_id")
    return out.select(
        "fingerprint", "keep_id", F.col("n_copies").cast("bigint").alias("n_copies")
    )


_CC_SQL = inventory.ORACLES["dedup_clusters"]


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH base AS ({_CC_SQL}),
    j AS (
      SELECT b.cluster_id, b.doc_id, d.n_chars
      FROM base b JOIN documents d USING (doc_id)
    ),
    r AS (
      SELECT cluster_id, doc_id, n_chars,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY cluster_id) AS csize
      FROM j
    )
    SELECT cluster_id, doc_id AS keep_id,
           CAST(n_chars AS BIGINT) AS keep_quality,
           CAST(csize AS BIGINT) AS cluster_size
    FROM r WHERE rn = 1
    """,
)
def dedup_keep_best_q(spark, sf):
    """Survivor selection per near-dup cluster: MinHash+LSH pairs ->
    connected components -> keep the HIGHEST-QUALITY member (quality =
    n_chars here; ties -> lowest doc_id) instead of blindly the lowest id
    (pipeline/dedup.py::cluster_representatives — map-side max_by, no
    cross-cluster window). The step that turns dedup clustering into the
    actual keep/drop decision a corpus pipeline ships."""
    from squirreling_spark.pipeline.dedup import cluster_representatives

    docs = t(spark, sf, "documents")
    clusters = dedup_clusters(docs, "text", "doc_id", num_hashes=32, bands=8)
    reps = cluster_representatives(
        clusters,
        docs.select("doc_id", F.col("n_chars").alias("quality")),
    )
    return reps.select(
        "cluster_id",
        "keep_id",
        F.col("keep_quality").cast("bigint").alias("keep_quality"),
        "cluster_size",
    )


@query(
    "quality_adaptive_filter",
    oracle="""
    WITH cut AS (
      SELECT source,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars) AS cutoff
      FROM documents GROUP BY source
    ),
    k AS (
      SELECT d.source, cutoff, doc_id, n_chars >= cutoff AS keep
      FROM documents d JOIN cut USING (source)
    )
    SELECT source, cutoff,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(doc_id) FILTER (WHERE keep), 0) AS BIGINT)
             AS kept_id_sum
    FROM k GROUP BY source, cutoff
    """,
)
def quality_adaptive_filter_q(spark, sf):
    """Per-source adaptive quality cutoff (keep docs at/above their
    source's median length — pipeline/corpus.py::adaptive_quality_filter):
    the FineWeb-style alternative to a global threshold. Summary output
    per source: cutoff, totals, and the surviving-id sum (value-checks
    WHICH rows survived, not just how many)."""
    from squirreling_spark.pipeline.corpus import adaptive_quality_filter

    docs = t(spark, sf, "documents")
    kept = adaptive_quality_filter(docs, "n_chars", "source", 0.5)
    kept_stats = kept.groupBy("source").agg(
        F.first("cutoff").alias("cutoff"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
    )
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    return kept_stats.join(totals, "source").select(
        "source", "cutoff", "n_total", "n_kept", "kept_id_sum"
    )


@query(
    "ngram_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (
        SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - 1)) AS i
        FROM tok WHERE len(tk) >= 2
      )
    ),
    ref AS (SELECT * FROM bg WHERE doc_id % 5 = 0),
    c2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM ref GROUP BY w1, w2
    ),
    c1 AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM ref GROUP BY w1
    ),
    v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM ref),
    sc AS (
      SELECT bg.doc_id, coalesce(c2.c2, 0) AS c2, coalesce(c1.c1, 0) AS c1
      FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
    ),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(count(*) FILTER (WHERE c2 = 0) AS BIGINT) AS n_oov,
             CAST(sum(c2) AS BIGINT) AS sum_c2,
             CAST(sum(c1) AS BIGINT) AS sum_c1
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, n_oov,
           CAST(n_oov AS DOUBLE) / n_bigrams AS oov_rate,
           CAST(sum_c2 + n_bigrams AS DOUBLE)
             / (sum_c1 + n_bigrams * v) AS lm_score
    FROM per, v
    """,
)
def ngram_lm_score_q(spark, sf):
    """CCNet-style bigram-LM quality scoring
    (pipeline/corpus.py::ngram_lm_score): docs with doc_id % 5 == 0 play
    the trusted reference slice; every document gets an OOV rate and a
    pooled add-one likelihood score. All per-bigram math stays in integer
    counts (exact, order-independent); one double division per document."""
    from squirreling_spark.pipeline.corpus import ngram_lm_score

    docs = t(spark, sf, "documents")
    ref = docs.filter(F.col("doc_id") % 5 == 0)
    return ngram_lm_score(docs, ref, "text", "doc_id")


@query(
    "boilerplate_frac",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (
        SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - 1)) AS i
        FROM tok WHERE len(tk) >= 2
      )
    ),
    top AS (
      SELECT w1, w2, 1 AS boiler
      FROM bg GROUP BY w1, w2
      ORDER BY count(*) DESC, w1, w2 LIMIT 20
    ),
    m AS (
      SELECT bg.doc_id, top.boiler
      FROM bg LEFT JOIN top USING (w1, w2)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(coalesce(sum(boiler), 0) AS BIGINT) AS n_boiler,
           CAST(coalesce(sum(boiler), 0) AS DOUBLE) / count(*)
             AS boiler_frac
    FROM m GROUP BY doc_id
    """,
)
def boilerplate_frac_q(spark, sf):
    """Per-document boilerplate exposure
    (pipeline/corpus.py::boilerplate_stats): fraction of each document's
    bigrams that belong to the corpus's 20 most frequent bigrams — the
    template-page signal. Counts stay integer (exact, order-independent);
    one double division per document."""
    from squirreling_spark.pipeline.corpus import boilerplate_stats

    return boilerplate_stats(t(spark, sf, "documents"), "text", "doc_id")


@query(
    "pagerank_docs",
    oracle=f"""
    WITH pairs AS ({_PAIRS_SQL}),
    und AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    deg AS (
      SELECT s AS node, CAST(count(*) AS BIGINT) AS deg
      FROM und GROUP BY s
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    p0 AS (
      SELECT node, deg, 1000000000000 // n AS pr FROM deg, nn
    ),
    c1 AS (
      SELECT u.d AS node, sum(p.pr // p.deg) AS cs
      FROM und u JOIN p0 p ON u.s = p.node GROUP BY u.d
    ),
    p1 AS (
      SELECT deg.node, deg.deg,
             (150000000000 // n) + (17 * coalesce(c1.cs, 0)) // 20 AS pr
      FROM deg LEFT JOIN c1 ON deg.node = c1.node, nn
    ),
    c2 AS (
      SELECT u.d AS node, sum(p.pr // p.deg) AS cs
      FROM und u JOIN p1 p ON u.s = p.node GROUP BY u.d
    ),
    p2 AS (
      SELECT deg.node, deg.deg,
             (150000000000 // n) + (17 * coalesce(c2.cs, 0)) // 20 AS pr
      FROM deg LEFT JOIN c2 ON deg.node = c2.node, nn
    )
    SELECT node AS doc_id, deg AS degree, CAST(pr AS BIGINT) AS pr_scaled
    FROM p2
    """,
)
def pagerank_docs_q(spark, sf):
    """Damped rank over the MinHash-LSH similarity graph
    (pipeline/graph.py::pagerank, 2 rounds, d=17/20, 1e12 fixed point):
    importance scores for importance-weighted sampling — central documents
    in near-dup neighborhoods are often the canonical source. All-integer
    arithmetic makes the iterative run exact, so the oracle unrolls both
    rounds and value-hash checks them."""
    from squirreling_spark.pipeline.dedup import minhash_lsh_candidates
    from squirreling_spark.pipeline.graph import pagerank

    pairs = minhash_lsh_candidates(
        t(spark, sf, "documents"), "text", "doc_id", 32, 8
    )
    return pagerank(pairs, "id_a", "id_b", iters=2)


@query(
    "dedup_substrings",
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS t
      FROM documents
    ),
    win AS (
      SELECT doc_id,
             CASE WHEN len(t) < 16 THEN [array_to_string(t, ' ')]
                  ELSE list_transform(generate_series(1, len(t) - 15),
                         i -> array_to_string(t[i:i+15], ' '))
             END AS ws
      FROM tk
    ),
    h AS (
      SELECT doc_id, md5(u.w) AS h
      FROM win, unnest(ws) AS u(w)
    ),
    shared AS (
      SELECT h, count(DISTINCT doc_id) > 1 AS is_shared
      FROM h GROUP BY h
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN is_shared THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           round(sum(CASE WHEN is_shared THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS dup_frac
    FROM h JOIN shared USING (h)
    GROUP BY doc_id
    """,
)
def dedup_substrings_q(spark, sf):
    """Cross-document duplicated-substring profile (pipeline/dedup.py::
    substring_dup_profile): sliding 16-token hashed windows, per-doc
    fraction that appears verbatim in another document — the
    window-hash form of exact-substring dedup (Lee et al. ACL'22),
    shuffle-partitioned on the window hash. Flags boilerplate, licenses,
    and memorizable spans that survive document-level dedup."""
    from squirreling_spark.pipeline.dedup import substring_dup_profile

    return substring_dup_profile(t(spark, sf, "documents"), "text", "doc_id")


@query(
    "bm25_rank",
    oracle=__import__(
        "squirreling_spark.pipeline.retrieval", fromlist=["bm25_oracle_sql"]
    ).bm25_oracle_sql(["query", "merge", "customer"], topk=25),
)
def bm25_rank_q(spark, sf):
    """BM25 retrieval ranking (pipeline/retrieval.py::bm25_rank): top-25
    documents for the fixed query {query, merge, customer} — the
    importance-resampling / search-scoring primitive. Rational idf
    (exact (N-df+0.5)/(df+0.5), no libm ln) keeps scores bit-identical
    across engines; tf folds are one codegen'd scan, stats broadcast
    back as a 1-row aggregate, top-k is TakeOrderedAndProject."""
    from squirreling_spark.pipeline.retrieval import bm25_rank

    return bm25_rank(
        t(spark, sf, "documents"), "text", "doc_id",
        ["query", "merge", "customer"], topk=25,
    )


def _doremi_round_sql(t: int, eta: int = 4, floor_ppm: int = 10_000) -> str:
    """One unrolled reweighting round (mirrors domain_reweight's integer
    arithmetic: every divisor positive, so DuckDB's // == Spark's DIV)."""
    M = 1_000_000
    prev = f"w{t - 1}"
    return f"""
    k{t} AS (
      SELECT s.domain, s.loss FROM scored s JOIN {prev} USING (domain)
      WHERE s.bucket < least({M}, {prev}.w_ppm * {prev}.n_dom)
    ),
    st{t} AS (
      SELECT domain, CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(loss) AS BIGINT) AS ks
      FROM k{t} GROUP BY domain
    ),
    m{t} AS (
      SELECT domain, nk, ks // nk AS kmean,
             (CAST(sum(ks) OVER () AS BIGINT))
               // (CAST(sum(nk) OVER () AS BIGINT)) AS amean
      FROM st{t}
    ),
    u{t} AS (
      SELECT {prev}.* EXCLUDE (w_ppm),
             CAST(coalesce(m{t}.nk, 0) AS BIGINT) AS n_kept_r{t},
             greatest(
               ({prev}.w_ppm
                * coalesce(greatest({M} + {eta} * (m{t}.kmean - m{t}.amean),
                                    0), {M})) // {M},
               {floor_ppm}) AS wr
      FROM {prev} LEFT JOIN m{t} USING (domain)
    ),
    w{t} AS (
      SELECT * EXCLUDE (wr),
             (wr * {M}) // (CAST(sum(wr) OVER () AS BIGINT)) AS w_ppm,
             (wr * {M}) // (CAST(sum(wr) OVER () AS BIGINT)) AS w{t}_ppm
      FROM u{t}
    )"""


@query(
    "domain_reweight",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS tk
      FROM documents
    ),
    scored AS (
      SELECT source AS domain,
             (1000000 * CAST(len(list_distinct(tk)) AS BIGINT))
               // CAST(len(tk) AS BIGINT) AS loss,
             ('0x' || substring(md5('doremi:' || CAST(doc_id AS VARCHAR)),
                                1, 12))::BIGINT % 1000000 AS bucket
      FROM tok
    ),
    w0 AS (
      SELECT domain, n_docs, mean_loss,
             CAST(count(*) OVER () AS BIGINT) AS n_dom,
             1000000 // CAST(count(*) OVER () AS BIGINT) AS w_ppm
      FROM (
        SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(loss) AS BIGINT) // CAST(count(*) AS BIGINT)
                 AS mean_loss
        FROM scored GROUP BY domain
      )
    ),
    {_doremi_round_sql(1)},
    {_doremi_round_sql(2)}
    SELECT domain, n_docs, mean_loss, n_kept_r1, w1_ppm, n_kept_r2, w2_ppm
    FROM w2
    """,
)
def domain_reweight_q(spark, sf):
    """DoReMi-style domain mixture optimization (pipeline/corpus.py::
    domain_reweight): two multiplicative-update rounds over the 20
    sources with per-document type-token-ratio (ppm, integer) as the
    loss proxy — high-excess-loss domains gain weight, the sample
    re-draws under the new mixture, and the loop re-measures. All
    arithmetic integer (clamped factors, positive divisors), so the
    DuckDB oracle unrolls both rounds exactly."""
    from squirreling_spark.pipeline.corpus import domain_reweight

    docs = t(spark, sf, "documents")
    toks = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    staged = docs.select(
        "doc_id",
        "source",
        (
            F.lit(1_000_000).cast("bigint")
            * F.size(F.array_distinct(toks)).cast("bigint")
        ).alias("__a"),
        F.size(toks).cast("bigint").alias("__b"),
    ).select(
        "doc_id", "source", F.expr("__a DIV __b").alias("ttr_loss")
    )
    return domain_reweight(
        staged, "doc_id", "source", "ttr_loss", rounds=2
    )


@query(
    "dsir_sample",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                          ' ') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM (
        SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
        FROM tok WHERE len(tk) >= 2
      )
    ),
    tgt AS (SELECT * FROM bg WHERE doc_id % 5 = 0),
    tc2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS t_c2
            FROM tgt GROUP BY 1, 2),
    tc1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS t_c1 FROM tgt GROUP BY 1),
    tv AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS t_v FROM tgt),
    rc2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS r_c2
            FROM bg GROUP BY 1, 2),
    rc1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS r_c1 FROM bg GROUP BY 1),
    rv AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS r_v FROM bg),
    per AS (
      SELECT bg.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(coalesce(t_c2, 0)) AS BIGINT) AS t2,
             CAST(sum(coalesce(t_c1, 0)) AS BIGINT) AS t1,
             CAST(sum(coalesce(r_c2, 0)) AS BIGINT) AS r2,
             CAST(sum(coalesce(r_c1, 0)) AS BIGINT) AS r1
      FROM bg
      LEFT JOIN tc2 USING (w1, w2) LEFT JOIN tc1 USING (w1)
      LEFT JOIN rc2 USING (w1, w2) LEFT JOIN rc1 USING (w1)
      GROUP BY bg.doc_id
    ),
    x AS (
      SELECT doc_id, n_bigrams,
             CAST(t2 + n_bigrams AS DOUBLE)
               / (t1 + n_bigrams * t_v) AS lm_target,
             CAST(r2 + n_bigrams AS DOUBLE)
               / (r1 + n_bigrams * r_v) AS lm_raw
      FROM per, tv, rv
    ),
    y AS (
      SELECT doc_id, n_bigrams, lm_target, lm_raw,
             lm_target / lm_raw AS importance,
             least(1000000, CAST(floor(lm_target / lm_raw * 500000.0 + 0.5)
                                 AS BIGINT)) AS rate_ppm,
             ('0x' || substring(md5('dsir:' || CAST(doc_id AS VARCHAR)),
                                1, 12))::BIGINT % 1000000 AS bucket
      FROM x
    )
    SELECT doc_id, n_bigrams, lm_target, lm_raw, importance, rate_ppm,
           bucket, bucket < rate_ppm AS keep
    FROM y
    """,
)
def dsir_sample_q(spark, sf):
    """DSIR-style importance resampling (pipeline/corpus.py::
    dsir_importance_sample): target model = the trusted slice
    (doc_id % 5 == 0, the ngram_lm_score convention), raw model = the
    corpus itself; keep probability ∝ lm_target/lm_raw at a 50% base
    rate. One bigram explode, four count joins, one rollup, a row-local
    integer keep decision — every double is a single correctly-rounded
    op on bit-identical inputs, so the oracle replays the whole
    selection exactly."""
    from squirreling_spark.pipeline.corpus import dsir_importance_sample

    docs = t(spark, sf, "documents")
    target = docs.filter(F.col("doc_id") % 5 == 0)
    return dsir_importance_sample(docs, target, "text", "doc_id")


@query(
    "dedup_clusters_distributed",
    oracle=inventory.ORACLES["dedup_clusters"],
)
def dedup_clusters_distributed_q(spark, sf):
    """The DISTRIBUTED connected-components arm under the full oracle:
    same MinHash-LSH pairs, but pointer-jumping min-label propagation
    (driver_threshold=0) instead of the small-graph driver union-find —
    the arm a >5M-edge collision graph takes at 100 TB. Until now this
    arm was unit-tested and scale-probed but not value-graded; the
    oracle (recursive-CTE transitive closure) is identical to
    dedup_clusters', so both arms are now proven to produce the same
    labeling on the real fixture."""
    from squirreling_spark.pipeline.dedup import dedup_clusters

    return dedup_clusters(
        t(spark, sf, "documents"), "text", "doc_id",
        num_hashes=32, bands=8, driver_threshold=0,
    )


@query(
    "remove_dup_substrings",
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS t
      FROM documents
    ),
    win AS (
      SELECT doc_id, len(t) AS n, t,
             unnest(CASE WHEN len(t) < 16 THEN [1]
                         ELSE generate_series(1, len(t) - 15) END) AS i
      FROM tk
    ),
    winh AS (
      SELECT doc_id, n, i,
             md5(CASE WHEN n < 16 THEN array_to_string(t, ' ')
                      ELSE array_to_string(t[i:i+15], ' ') END) AS h
      FROM win
    ),
    shared AS (
      SELECT h FROM (SELECT h, doc_id FROM winh GROUP BY h, doc_id)
      GROUP BY h HAVING count(*) > 1
    ),
    cov AS (
      SELECT DISTINCT doc_id, p FROM (
        SELECT doc_id,
               unnest(generate_series(i, least(i + 15, n))) AS p
        FROM winh JOIN shared USING (h)
      )
    ),
    tokens AS (
      SELECT doc_id, i AS p, t[i] AS tok FROM (
        SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM tk
      )
    ),
    kept AS (
      SELECT tokens.doc_id, tokens.p, tokens.tok
      FROM tokens LEFT JOIN cov
        ON tokens.doc_id = cov.doc_id AND tokens.p = cov.p
      WHERE cov.p IS NULL
    ),
    stats AS (SELECT doc_id, len(t) AS n_tokens FROM tk)
    SELECT s.doc_id,
           CAST(s.n_tokens AS BIGINT) AS n_tokens,
           CAST(s.n_tokens - coalesce(k.cnt, 0) AS BIGINT) AS n_removed,
           coalesce(k.txt, '') AS clean_text
    FROM stats s LEFT JOIN (
      SELECT doc_id, count(*) AS cnt,
             string_agg(tok, ' ' ORDER BY p) AS txt
      FROM kept GROUP BY doc_id
    ) k USING (doc_id)
    """,
)
def remove_dup_substrings_q(spark, sf):
    """Duplicated-substring REMOVAL (pipeline/dedup.py::
    remove_dup_substrings): drop every token covered by a 16-token window
    that appears verbatim in another document, reassemble the survivors —
    the transform step that `dedup_substrings` (profile-only) feeds in a
    real pipeline (Lee et al. ACL'22). The oracle replays window
    hashing, shared-window detection, token coverage, and the ordered
    reassembly, so clean_text itself is value-checked."""
    from squirreling_spark.pipeline.dedup import remove_dup_substrings

    return remove_dup_substrings(t(spark, sf, "documents"), "text", "doc_id")


@query(
    "remove_boilerplate",
    oracle="""
    WITH lined AS (
      SELECT doc_id,
             'corpus header line v' || CAST(doc_id % 5 AS VARCHAR)
               || chr(10) ||
             array_to_string(
               list_transform(
                 generate_series(0, CAST(ceil(len(t) / 10.0) AS BIGINT) - 1),
                 i -> array_to_string(t[i*10+1:i*10+10], ' ')
               ), chr(10)) AS text
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
      )
    ),
    lines AS (
      SELECT doc_id, i AS p, ln[i] AS line,
             lower(trim(ln[i])) AS norm
      FROM (
        SELECT doc_id, ln,
               unnest(generate_series(1, len(ln))) AS i
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ln FROM lined)
      )
    ),
    boiler AS (
      SELECT norm FROM (
        SELECT norm, doc_id FROM lines WHERE norm <> '' GROUP BY norm, doc_id
      ) GROUP BY norm HAVING count(*) >= 2
    ),
    flagged AS (
      SELECT l.doc_id, l.p, l.line,
             (b.norm IS NOT NULL AND l.norm <> '') AS dropped
      FROM lines l LEFT JOIN boiler b ON l.norm = b.norm
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
                               chr(10) ORDER BY p), '') AS clean_text
    FROM flagged GROUP BY doc_id
    """,
)
def remove_boilerplate_q(spark, sf):
    """C4-style boilerplate LINE removal (pipeline/corpus.py::
    remove_boilerplate_lines). The fixture corpus has no line structure,
    so the query synthesizes it deterministically: a planted header line
    (5 variants, each shared by ~1/5 of the corpus — guaranteed
    boilerplate) plus the text re-flowed as 10-token lines (any
    cross-document duplicate chunk drops too — the algorithm decides,
    and the oracle replays the same decision). clean_text itself is
    value-checked."""
    from squirreling_spark.pipeline.corpus import remove_boilerplate_lines
    from squirreling_spark.qutil import spread

    toks = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    n = F.size(toks)
    n_lines = F.ceil(n / F.lit(10.0)).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
        ),
        "\n",
    )
    lined = spread(
        t(spark, sf, "documents").select("doc_id", "text"), by=["doc_id"]
    ).select(
        "doc_id",
        F.concat(
            F.lit("corpus header line v"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("\n"),
            body,
        ).alias("lined"),
    )
    return remove_boilerplate_lines(lined, "lined", "doc_id", min_docs=2)


@query(
    "pack_sequences",
    oracle="""
    WITH counts AS (
      SELECT doc_id,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                              ' ')) + 1 AS eff_len
      FROM documents
    ),
    offs AS (
      SELECT doc_id, eff_len,
             coalesce(sum(eff_len) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM counts
    ),
    spans AS (
      SELECT doc_id, eff_len, off,
             unnest(generate_series(CAST(off // 512 AS BIGINT),
                                    CAST((off + eff_len - 1) // 512
                                         AS BIGINT))) AS seq_id
      FROM offs
    )
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           doc_id,
           CAST(greatest(off, seq_id * 512) - off AS BIGINT) AS doc_start,
           CAST(least(off + eff_len, (seq_id + 1) * 512)
                - greatest(off, seq_id * 512) AS BIGINT) AS n_toks
    FROM spans
    """,
)
def pack_sequences_q(spark, sf):
    """Training-sequence packing (pipeline/pack.py::pack_sequences):
    concatenate the corpus in doc_id order (one EOS per document) and
    chop into 512-token training sequences — the GPT-style
    concat-then-chunk packing, emitted as the (seq_id, doc_id,
    doc_start, n_toks) placement map. The engine computes global offsets
    with a two-level cumulative sum (per-bucket sums + a bucket-count-
    sized window + within-bucket windows) so no stage runs as a single
    task; the oracle is the plain one-window cumsum — integer-exact, so
    the two formulations must agree row-for-row."""
    from squirreling_spark.pipeline.pack import pack_sequences

    return pack_sequences(
        t(spark, sf, "documents"), "text", "doc_id", seq_len=512
    )


@query(
    "pii_scrub",
    oracle="""
    WITH injected AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex'
                  || CAST(doc_id % 7 AS VARCHAR) || '.org or call 415-555-'
                  || lpad(CAST(doc_id % 97 AS VARCHAR), 4, '0')
                  || ' via https://h' || CAST(doc_id % 5 AS VARCHAR)
                  || '.net/x from 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST(doc_id % 100 AS VARCHAR) || '.'
                  || CAST(doc_id % 40 AS VARCHAR) AS t0
      FROM documents
    ),
    e AS (
      SELECT doc_id,
             len(regexp_extract_all(t0,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
               AS n_email,
             regexp_replace(t0,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
               '<EMAIL>', 'g') AS t1
      FROM injected
    ),
    p AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t1,
               '(?:\\+?[0-9]{1,2}[ .\\-]?)?\\(?[0-9]{3}\\)?[ .\\-][0-9]{3}[ .\\-][0-9]{4}'))
               AS n_phone,
             regexp_replace(t1,
               '(?:\\+?[0-9]{1,2}[ .\\-]?)?\\(?[0-9]{3}\\)?[ .\\-][0-9]{3}[ .\\-][0-9]{4}',
               '<PHONE>', 'g') AS t2
      FROM e
    ),
    u AS (
      SELECT doc_id, n_email, n_phone,
             len(regexp_extract_all(t2, 'https?://[^ ]+')) AS n_url,
             regexp_replace(t2, 'https?://[^ ]+', '<URL>', 'g') AS t3
      FROM p
    )
    SELECT doc_id,
           regexp_replace(t3, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b',
             '<IPV4>', 'g') AS scrubbed,
           CAST(n_email AS BIGINT) AS n_email,
           CAST(n_phone AS BIGINT) AS n_phone,
           CAST(n_url AS BIGINT) AS n_url,
           CAST(len(regexp_extract_all(t3,
             '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT)
             AS n_ipv4
    FROM u
    """,
)
def pii_scrub_q(spark, sf):
    """PII redaction over every scrub category (pipeline/text.py::
    scrub_pii — the SAME operator text_scrub grades, here exercised on
    all four pattern kinds at once with real-world phone separator
    forms). Each doc gets one planted email, phone, URL, and IPv4
    (deterministic, replayed by the oracle); the scrubbed text itself is
    value-checked, pinning the Java-vs-RE2 shared regex subset."""
    from squirreling_spark.pipeline.text import scrub_pii

    injected = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".org or call 415-555-"),
            F.lpad((F.col("doc_id") % 97).cast("string"), 4, "0"),
            F.lit(" via https://h"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".net/x from 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit("."), (F.col("doc_id") % 100).cast("string"),
            F.lit("."), (F.col("doc_id") % 40).cast("string"),
        ).alias("text"),
    )
    return scrub_pii(injected, "text", "doc_id")


# lm_bucket_sample replays ngram_lm_score's full oracle as its scoring CTE
_LM_SCORE_ORACLE = inventory.ORACLES["ngram_lm_score"]


@query(
    "lm_bucket_sample",
    oracle=f"""
    WITH scored AS ({_LM_SCORE_ORACLE}),
    cuts AS (
      SELECT quantile_cont(lm_score, 0.25) AS p25,
             quantile_cont(lm_score, 0.75) AS p75
      FROM scored
    ),
    bucketed AS (
      SELECT s.doc_id, s.lm_score,
             CASE WHEN s.lm_score > floor(c.p75 * 1000000000 + 0.5)
                                    / 1000000000 THEN 'head'
                  WHEN s.lm_score > floor(c.p25 * 1000000000 + 0.5)
                                    / 1000000000 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored s, cuts c
    )
    SELECT doc_id, lm_score, bucket,
           (CAST('0x' || substring(md5('lmb:' ||
              CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100)
             < (CASE bucket WHEN 'head' THEN 100 WHEN 'middle' THEN 50
                            ELSE 10 END) AS kept
    FROM bucketed
    """,
)
def lm_bucket_sample_q(spark, sf):
    """CCNet perplexity-bucket sampling (pipeline/corpus.py::
    lm_bucket_sample): quality scores from the pooled bigram LM
    (reference slice = every 5th doc, as in ngram_lm_score), quartile
    cutoffs det-rounded to 1e-9, head/middle/tail buckets kept at
    100/50/10%. The oracle replays the scoring CTE, DuckDB's
    quantile_cont at the exact binary fractions 0.25/0.75, the rounded
    comparisons, and the salted-md5 keep rule."""
    from squirreling_spark.pipeline.corpus import lm_bucket_sample

    docs = t(spark, sf, "documents")
    ref = docs.filter(F.col("doc_id") % 5 == 0)
    return lm_bucket_sample(docs, ref, "text", "doc_id")


@query(
    "gopher_quality_filter",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lines,
             text
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, t -> length(t)))
               AS BIGINT) AS sum_wlen,
             CAST(length(text) - length(replace(text, '#', ''))
                + (length(text) - length(replace(text, '...', ''))) // 3
                + length(text) - length(replace(text, '…', ''))
               AS BIGINT) AS n_symbols,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(list_sum(list_transform(lines, l ->
               CASE WHEN left(ltrim(l), 1) IN ('•', '-', '*')
               THEN 1 ELSE 0 END)) AS BIGINT) AS n_bullet_lines,
             CAST(list_sum(list_transform(lines, l ->
               CASE WHEN rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…'
               THEN 1 ELSE 0 END)) AS BIGINT) AS n_ellipsis_lines,
             CAST(len(list_filter(toks,
               t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
               AS n_alpha_words,
             CAST(len(list_intersect(list_transform(toks, t -> lower(t)),
               ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
               AS BIGINT) AS n_stopwords
      FROM s
    )
    SELECT doc_id, n_words, sum_wlen, n_symbols, n_lines, n_bullet_lines,
           n_ellipsis_lines, n_alpha_words, n_stopwords,
           (n_words >= 50 AND n_words <= 100000
            AND sum_wlen >= 3 * n_words AND sum_wlen <= 10 * n_words
            AND n_symbols * 10 <= n_words
            AND n_bullet_lines * 10 <= n_lines * 9
            AND n_ellipsis_lines * 10 <= n_lines * 3
            AND n_alpha_words * 10 >= n_words * 8
            AND n_stopwords >= 2) AS keep
    FROM c
    """,
)
def gopher_quality_filter_q(spark, sf):
    """The Gopher document-quality rule set (Rae et al. 2021 A1.1 —
    pipeline/text.gopher_quality): word-count bounds, mean-word-length
    band, symbol/bullet/ellipsis ratios, alphabetic-word fraction, and
    the 2-stop-word rule, every ratio evaluated by integer
    cross-multiplication so both engines agree bit-for-bit. One scan,
    zero shuffle, zero Python — the canonical pretraining cleaning
    stage next to text_quality's heuristic score. The fixture's 10–99
    word documents split genuinely on the 50-word floor."""
    from squirreling_spark.pipeline.text import gopher_quality

    return gopher_quality(t(spark, sf, "documents"), "text", "doc_id")


@query(
    "c4_quality_filter",
    oracle="""
    WITH lined AS (
      SELECT doc_id,
             'short line' || chr(10) ||
             array_to_string(
               list_transform(
                 generate_series(0, CAST(ceil(len(t) / 10.0) AS BIGINT) - 1),
                 i -> array_to_string(t[i*10+1:i*10+10], ' ') ||
                      CASE (doc_id + i) % 3 WHEN 0 THEN '.'
                           WHEN 1 THEN '!' ELSE '' END),
               chr(10))
             || CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
                  'please enable javascript to view this page.'
                ELSE '' END
             || CASE WHEN doc_id % 41 = 0 THEN chr(10) ||
                  'lorem ipsum dolor sit amet consectetur.' ELSE '' END
             || CASE WHEN doc_id % 43 = 0 THEN chr(10) ||
                  'var config = { mode: full };' ELSE '' END
             AS text
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
      )
    ),
    lines AS (
      SELECT doc_id, i AS p, ln[i] AS l
      FROM (
        SELECT doc_id, ln, unnest(generate_series(1, len(ln))) AS i
        FROM (SELECT doc_id, string_split(text, chr(10)) AS ln FROM lined)
      )
    ),
    marked AS (
      SELECT doc_id, p, l,
             ((rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!'
               OR rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%"')
              AND len(string_split(trim(l), ' ')) >= 5
              AND NOT contains(lower(l), 'javascript')) AS kept
      FROM lines
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_lines,
             coalesce(string_agg(CASE WHEN kept THEN l END,
                                 chr(10) ORDER BY p), '') AS clean_text
      FROM marked GROUP BY doc_id
    ),
    agg2 AS (
      SELECT doc_id, n_lines, n_kept_lines, clean_text,
             CAST((length(clean_text)
                   - length(replace(clean_text, '.', '')))
                + (length(clean_text)
                   - length(replace(clean_text, '!', '')))
                + (length(clean_text)
                   - length(replace(clean_text, '?', '')))
               AS BIGINT) AS n_sentences
      FROM agg
    )
    SELECT a.doc_id, a.n_lines, a.n_kept_lines, a.n_sentences,
           contains(lower(l.text), 'lorem ipsum') AS has_lorem,
           contains(l.text, '{') AS has_brace,
           (NOT contains(lower(l.text), 'lorem ipsum')
            AND NOT contains(l.text, '{')
            AND a.n_sentences >= 3) AS keep,
           a.clean_text
    FROM lined l JOIN agg2 a USING (doc_id)
    """,
)
def c4_quality_filter_q(spark, sf):
    """The C4 heuristic cleaning rule set (Raffel et al. 2020 §2.2 —
    pipeline/text.c4_quality_filter): keep only lines ending in terminal
    punctuation with ≥5 words and no 'javascript'; drop pages containing
    'lorem ipsum' or '{' or with <3 sentence-final marks after cleaning.
    The fixture corpus has no line structure, so the query synthesizes it
    deterministically: a 2-word unpunctuated header (always dropped), the
    text re-flowed as 10-token lines with '.'/'!'/no punctuation cycling
    on (doc_id + line) % 3 (punctuation AND short-remainder rules both
    genuinely split), a javascript line every 13th doc, 'lorem ipsum'
    every 41st, a '{' code line every 43rd. clean_text itself is
    value-checked; the page verdict is pure boolean/integer logic —
    bit-identical cross-engine."""
    from squirreling_spark.pipeline.text import c4_quality_filter

    toks = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    nb = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    did = F.col("doc_id")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.concat(
                F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
                F.when((did + i) % 3 == 0, F.lit("."))
                .when((did + i) % 3 == 1, F.lit("!"))
                .otherwise(F.lit("")),
            ),
        ),
        "\n",
    )
    lined = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("short line\n"),
            body,
            F.when(
                did % 13 == 0,
                F.lit("\nplease enable javascript to view this page."),
            ).otherwise(F.lit("")),
            F.when(
                did % 41 == 0,
                F.lit("\nlorem ipsum dolor sit amet consectetur."),
            ).otherwise(F.lit("")),
            F.when(
                did % 43 == 0, F.lit("\nvar config = { mode: full };")
            ).otherwise(F.lit("")),
        ).alias("lined"),
    )
    return c4_quality_filter(lined, "lined", "doc_id")


from squirreling_spark.pipeline.retrieval import (  # noqa: E402
    bm25_oracle_sql as _bm25_oracle_sql,
)

_RRF_COS = """
    round(list_sum(list_transform(generate_series(1, 64),
                                  i -> q.emb[i] * a.emb[i]))
          / sqrt(list_sum(list_transform(q.emb, x -> x * x))
               * list_sum(list_transform(a.emb, x -> x * x))), 6)
"""


@query(
    "rrf_fusion",
    oracle=f"""
    WITH bm AS ({_bm25_oracle_sql(["query", "merge", "customer"],
                                  topk=100)}),
    bmr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM bm
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT emb FROM e WHERE vec_id = 0),
    s AS (
      SELECT a.vec_id, {_RRF_COS} AS sim
      FROM e a, q WHERE a.vec_id != 0
    ),
    dr AS (
      SELECT vec_id AS doc_id, r FROM (
        SELECT vec_id,
               row_number() OVER (ORDER BY sim DESC, vec_id) AS r
        FROM s
      ) WHERE r <= 100
    ),
    u AS (
      SELECT doc_id, 'bm25' AS sys, r FROM bmr
      UNION ALL
      SELECT doc_id, 'cos' AS sys, r FROM dr
    ),
    f AS (
      SELECT doc_id,
             max(CASE WHEN sys = 'bm25' THEN r END) AS rank_bm25,
             max(CASE WHEN sys = 'cos' THEN r END) AS rank_cos,
             CAST(count(*) AS BIGINT) AS n_systems,
             CAST(sum(1000000000000 // (60 + r)) AS BIGINT) AS rrf_score
      FROM u GROUP BY doc_id
    )
    SELECT doc_id, rank_bm25, rank_cos, n_systems, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
             AS BIGINT) AS fused_rank
    FROM f QUALIFY fused_rank <= 50
    """,
)
def rrf_fusion_q(spark, sf):
    """Reciprocal-rank fusion (pipeline/retrieval.py::rrf_fuse) of a
    sparse and a dense retriever — the calibration-free hybrid-search
    combiner: BM25 top-100 for {query, merge, customer} fused with
    exact-cosine top-100 around the vec_id-0 embedding, contribution
    RRF_SCALE div (60 + rank) as an exact integer. Both input rank
    lists are themselves bit-reproducible (rational-idf BM25 doubles;
    cosine rounded to 1e-6), so the fused ordering — and the oracle's
    replay of it — is exact. All fusion stages run on top-k-bounded
    state; the corpus-scale work stays inside the two retrievers."""
    from pyspark.sql import Window

    from squirreling_spark.pipeline.retrieval import bm25_rank, rrf_fuse
    from squirreling_spark.pipeline.similarity import (
        cosine_topk_bruteforce,
    )

    docs = t(spark, sf, "documents")
    bm = bm25_rank(
        docs, "text", "doc_id", ["query", "merge", "customer"], topk=100
    )
    wb = Window.orderBy(F.desc("score"), F.col("doc_id"))
    lex = bm.select("doc_id", F.row_number().over(wb).alias("rank"))
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dense = cosine_topk_bruteforce(q, e, k=100).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse({"bm25": lex, "cos": dense}, "doc_id", k=60, topk=50)


@query(
    "html_extract",
    oracle="""
    WITH hs AS (
      SELECT doc_id,
             '<html>' || chr(10) ||
             '<head><style>p { color: red }</style>' ||
             '<script>var tracker = 1;</script></head>' || chr(10) ||
             '<body>' || chr(10) ||
             '<nav><a href="/">home</a> ' ||
             '<a href="/about">about us page</a></nav>' || chr(10) ||
             array_to_string(
               list_transform(
                 generate_series(0, CAST(ceil(len(t) / 10.0) AS BIGINT) - 1),
                 i -> '<p>' || array_to_string(t[i*10+1:i*10+10], ' ')
                      || ' &amp; more</p>'),
               chr(10)) ||
             chr(10) || '<footer><a href="/contact">contact</a></footer>'
             || chr(10) || '</body>' || chr(10) || '</html>' AS html
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
      )
    ),
    db AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(html, '(?i)<script'))
               AS BIGINT) AS n_script_blocks,
             CAST(len(regexp_extract_all(html, '(?i)<style'))
               AS BIGINT) AS n_style_blocks,
             regexp_replace(
               regexp_replace(html, '(?is)<script[^>]*>.*?</script>',
                              '', 'g'),
               '(?is)<style[^>]*>.*?</style>', '', 'g') AS deb
      FROM hs
    ),
    lines AS (
      SELECT doc_id, i AS p, ln[i] AS l
      FROM (
        SELECT doc_id, ln, unnest(generate_series(1, len(ln))) AS i
        FROM (SELECT doc_id, string_split(deb, chr(10)) AS ln FROM db)
      )
    ),
    vised AS (
      SELECT doc_id, p,
             replace(replace(replace(replace(replace(
               trim(regexp_replace(
                 regexp_replace(l, '<[^>]+>', ' ', 'g'),
                 '\\s+', ' ', 'g')),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', chr(39)), '&amp;', '&') AS vis,
             CAST(coalesce(list_sum(list_transform(
               regexp_extract_all(l, '(?i)<a[^>]*>([^<]*)</a>', 1),
               x -> length(x))), 0) AS BIGINT) AS alen
      FROM lines
    ),
    m AS (
      SELECT doc_id, p, vis,
             (length(vis) > 0 AND alen > 0
              AND alen * 2 >= length(vis)) AS is_link
      FROM vised
    )
    SELECT m.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN is_link THEN 1 ELSE 0 END) AS BIGINT)
             AS n_link_dropped,
           db.n_script_blocks, db.n_style_blocks,
           coalesce(string_agg(
             CASE WHEN length(vis) > 0 AND NOT is_link THEN vis END,
             chr(10) ORDER BY p), '') AS clean_text
    FROM m JOIN db USING (doc_id)
    GROUP BY m.doc_id, db.n_script_blocks, db.n_style_blocks
    """,
)
def html_extract_q(spark, sf):
    """HTML main-content extraction (pipeline/text.py::
    html_main_content): script/style block removal, link-density line
    drop (2·anchor_len ≥ vis_len, integer cross-mult), tag strip,
    entity decode, blank-line removal. The fixture corpus is plain
    text, so the query wraps each document in a deterministic page —
    head with style+script blocks, a nav and a footer of pure links
    (link-dense: dropped), the text re-flowed as <p> paragraphs with a
    planted &amp; entity — and the oracle replays wrapping AND
    extraction, value-checking clean_text itself (pins the shared
    Java/RE2 regex subset on tags, non-greedy blocks and (?i) flags)."""
    from squirreling_spark.pipeline.text import html_main_content

    toks = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    nb = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    paras = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda i: F.concat(
                F.lit("<p>"),
                F.array_join(F.slice(toks, i * 10 + 1, 10), " "),
                F.lit(" &amp; more</p>"),
            ),
        ),
        "\n",
    )
    pages = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit(
                "<html>\n<head><style>p { color: red }</style>"
                "<script>var tracker = 1;</script></head>\n<body>\n"
                '<nav><a href="/">home</a> '
                '<a href="/about">about us page</a></nav>\n'
            ),
            paras,
            F.lit(
                '\n<footer><a href="/contact">contact</a></footer>'
                "\n</body>\n</html>"
            ),
        ).alias("html"),
    )
    return html_main_content(pages, "html", "doc_id")


@query(
    "mix_epoch_schedule",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(trim(regexp_replace(text, '\\s+',
               ' ', 'g')), ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w_raw
      FROM per
    ),
    tot AS (
      SELECT CAST(sum(tokens) AS HUGEINT) AS T,
             CAST(sum(w_raw) AS HUGEINT) AS W
      FROM w
    ),
    sched AS (
      SELECT source, n_docs, tokens,
             CAST(CAST(w_raw AS HUGEINT) * 1000000 // W AS BIGINT)
               AS w_ppm
      FROM w, tot
    ),
    alloc AS (
      SELECT s.*, CAST(t.T * CAST(s.w_ppm AS HUGEINT) // 1000000
               AS BIGINT) AS alloc_tokens
      FROM sched s, tot t
    )
    SELECT source, n_docs, tokens, w_ppm, alloc_tokens,
           CAST(least(CAST(alloc_tokens AS HUGEINT) * 1000000
                        // CAST(tokens AS HUGEINT),
                      CAST(1000000 AS HUGEINT)) AS BIGINT) AS epochs_ppm,
           (CAST(alloc_tokens AS HUGEINT) * 1000000
              // CAST(tokens AS HUGEINT)) > 1000000 AS capped,
           CAST(least(CAST(alloc_tokens AS HUGEINT),
                      CAST(tokens AS HUGEINT) * 1000000 // 1000000)
             AS BIGINT) AS final_tokens
    FROM alloc
    """,
)
def mix_epoch_schedule_q(spark, sf):
    """Token-budget epoch scheduling (pipeline/corpus.py::
    epoch_schedule): the per-source data-recipe table — sqrt-upweighted
    allocation of a one-epoch token budget with the 1.0-epoch
    no-repetition cap; small sources are upweighted until they cap,
    surplus visible via `capped`. Pure integer arithmetic in
    decimal(38,0)/HUGEINT after one map-combined per-source aggregate
    and a 1-row broadcast total."""
    from squirreling_spark.pipeline.corpus import epoch_schedule

    return epoch_schedule(t(spark, sf, "documents"), "text", "source")


@query(
    "markdown_sections",
    oracle="""
    WITH lined AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 generate_series(0, CAST(ceil(len(t) / 10.0) AS BIGINT) - 1),
                 k -> CASE WHEN k % 3 = 0 AND k > 0 THEN
                        repeat('#', CAST(1 + (doc_id + k // 3) % 3 AS INT))
                        || ' section ' || CAST(k // 3 AS VARCHAR)
                        || chr(10)
                        || array_to_string(t[k*10+1:k*10+10], ' ')
                      ELSE array_to_string(t[k*10+1:k*10+10], ' ') END),
               chr(10)) AS text
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                            ' ') AS t
        FROM documents
      )
    ),
    l AS (SELECT doc_id, string_split(text, chr(10)) AS ln FROM lined),
    st AS (
      SELECT doc_id, ln,
             CASE WHEN len(hp) > 0 AND hp[1] = 1 THEN hp
                  ELSE list_prepend(1, hp) END AS st
      FROM (
        SELECT doc_id, ln,
               list_filter(generate_series(1, len(ln)),
                           i -> regexp_matches(ln[i], '^#{1,6} ')) AS hp
        FROM l
      )
    ),
    sec AS (
      SELECT doc_id, j - 1 AS sec_idx,
             ln[st[j]] AS head_line,
             regexp_matches(ln[st[j]], '^#{1,6} ') AS is_head,
             ln[(st[j] + CASE WHEN regexp_matches(ln[st[j]], '^#{1,6} ')
                         THEN 1 ELSE 0 END)
                :(CASE WHEN j < len(st) THEN st[j+1] - 1
                       ELSE len(ln) END)] AS body
      FROM st, unnest(generate_series(1, len(st))) AS u(j)
    )
    SELECT doc_id, CAST(sec_idx AS BIGINT) AS sec_idx,
           CAST(CASE WHEN is_head THEN
                  length(regexp_extract(head_line, '^(#{1,6}) ', 1))
                ELSE 0 END AS BIGINT) AS level,
           CASE WHEN is_head THEN
                  trim(regexp_replace(head_line, '^#{1,6} ', ''))
                ELSE '' END AS heading,
           CAST(len(body) AS BIGINT) AS n_lines,
           CAST(len(list_filter(
             string_split(trim(regexp_replace(
               array_to_string(body, chr(10)), '\\s+', ' ', 'g')), ' '),
             w -> length(w) > 0)) AS BIGINT) AS n_words,
           md5(array_to_string(body, chr(10))) AS fp_text
    FROM sec
    """,
)
def markdown_sections_q(spark, sf):
    """Structure-aware document sectioning (pipeline/text.py::
    markdown_sections): split at ATX headings into preamble + sections,
    each with level, heading text, line/word counts and a body
    fingerprint — the chunk-by-structure pass next to the fixed-window
    chunker (doc_chunking). The fixture corpus has no markdown, so the
    query synthesizes it deterministically: 10-token lines with a
    level-cycling '# section k' heading before every 3rd line (the
    first 3 lines stay heading-less — a genuine preamble). The oracle
    replays synthesis AND sectioning; fp_text value-checks every
    section body."""
    from squirreling_spark.pipeline.text import markdown_sections

    toks = F.split(
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "
    )
    nb = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    did = F.col("doc_id")
    lined = t(spark, sf, "documents").select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nb - 1),
                lambda k: F.when(
                    (k % 3 == 0) & (k > 0),
                    F.concat(
                        F.repeat(
                            F.lit("#"),
                            (1 + (did + F.floor(k / 3)) % 3).cast("int"),
                        ),
                        F.lit(" section "),
                        F.floor(k / 3).cast("bigint").cast("string"),
                        F.lit("\n"),
                        F.array_join(F.slice(toks, k * 10 + 1, 10), " "),
                    ),
                ).otherwise(
                    F.array_join(F.slice(toks, k * 10 + 1, 10), " ")
                ),
            ),
            "\n",
        ).alias("md"),
    )
    return markdown_sections(lined, "md", "doc_id")


@query(
    "sample_per_group",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('gs:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rank
      FROM documents
    )
    SELECT doc_id, source, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 10
    """,
)
def sample_per_group_q(spark, sf):
    """Deterministic k-per-group sampling (pipeline/corpus.py::
    sample_per_group): 10 docs per source ranked by salted md5 —
    the balanced-subset primitive next to rate-based stratified
    sampling (sample_stratified). Skew-safe: two-stage ranking keeps
    every window input bounded regardless of group size; the oracle's
    single global window states the same contract."""
    from squirreling_spark.pipeline.corpus import sample_per_group

    return sample_per_group(
        t(spark, sf, "documents"), "doc_id", "source", k=10
    )


@query(
    "source_drift_tv",
    oracle="""
    WITH st AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT source,
               unnest(string_split(trim(regexp_replace(text, '\\s+', ' ',
                 'g')), ' ')) AS tok
        FROM documents
      ) GROUP BY source, tok
    ),
    tot AS (SELECT tok, CAST(sum(c) AS BIGINT) AS total FROM st GROUP BY tok),
    g AS (SELECT CAST(sum(total) AS BIGINT) AS T FROM tot),
    tot_q AS (
      SELECT tok, CAST(total * 1000000 // T AS BIGINT) AS q FROM tot, g
    ),
    qa AS (SELECT CAST(sum(q) AS BIGINT) AS Q_all FROM tot_q),
    per_src AS (SELECT source, CAST(sum(c) AS BIGINT) AS C FROM st
                GROUP BY source),
    j AS (
      SELECT st.source, st.tok, tq.q,
             CAST(st.c * 1000000 // ps.C AS BIGINT) AS p
      FROM st JOIN tot_q tq USING (tok) JOIN per_src ps USING (source)
    ),
    gaps AS (SELECT source, tok, q, abs(p - q) AS gap FROM j),
    agg AS (
      SELECT source,
             CAST(sum(gap) AS BIGINT) AS sum_gap,
             CAST(sum(q) AS BIGINT) AS q_in,
             CAST(count(*) AS BIGINT) AS vocab_in_source
      FROM gaps GROUP BY source
    ),
    top AS (
      SELECT source, tok AS top_token, gap AS top_gap_ppm
      FROM (
        SELECT source, tok, gap,
               row_number() OVER (PARTITION BY source
                                  ORDER BY gap DESC, tok) AS r
        FROM gaps
      ) WHERE r = 1
    )
    SELECT a.source, ps.C AS n_tokens, a.vocab_in_source,
           CAST((a.sum_gap + qa.Q_all - a.q_in) // 2 AS BIGINT) AS tv_ppm,
           t.top_token, t.top_gap_ppm
    FROM agg a
    JOIN per_src ps USING (source)
    CROSS JOIN qa
    JOIN top t USING (source)
    """,
)
def source_drift_tv_q(spark, sf):
    """Per-source token-distribution drift vs the global corpus
    (pipeline/corpus.py::source_drift_tv): ppm-quantized total-variation
    distance, with the off-source mass factored exactly as Q_all − Σq_in
    so nothing larger than the vocabulary shuffles. The
    mixture-monitoring signal next to domain_reweight / temperature_mix;
    integer arithmetic end to end, bit-identical cross-engine."""
    from squirreling_spark.pipeline.corpus import source_drift_tv

    return source_drift_tv(t(spark, sf, "documents"), "text", "source")


_ROBOTS_PATH = """CASE doc_id % 5
      WHEN 0 THEN '/public/img/pic' WHEN 1 THEN '/public/page'
      WHEN 2 THEN '/tmp/cache' WHEN 3 THEN '/docs/readme'
      ELSE '/' END"""

_ROBOTS_TXT = """CASE h % 3
      WHEN 0 THEN 'User-agent: googlebot' || chr(10) ||
        'Disallow: /private' || chr(10) || chr(10) ||
        'User-agent: *' || chr(10) || 'Allow: /public/img' || chr(10) ||
        'Disallow: /public' || chr(10) || 'Disallow: /tmp' || chr(10) ||
        '# note' || chr(10) || 'User-agent: other' || chr(10) ||
        'Disallow: /'
      WHEN 1 THEN 'User-agent: googlebot' || chr(10) || 'Disallow: /'
      ELSE 'User-agent: bingbot' || chr(10) || 'User-agent: *' ||
        chr(10) || 'Disallow: /docs' || chr(10) || 'Allow: /docs/readme'
      END"""


@query(
    "robots_filter",
    oracle=f"""
    WITH hosts AS (SELECT DISTINCT doc_id % 7 AS h FROM documents),
    rob AS (
      SELECT 'site' || CAST(h AS VARCHAR) || '.com' AS host,
             {_ROBOTS_TXT} AS robots_txt
      FROM hosts
    ),
    lines AS (
      SELECT host, i AS p, ln[i] AS raw
      FROM (
        SELECT host, ln, unnest(generate_series(1, len(ln))) AS i
        FROM (SELECT host, string_split(robots_txt, chr(10)) AS ln
              FROM rob)
      )
    ),
    m AS (
      SELECT host, p,
             lower(trim(string_split(raw, '#')[1])) AS l,
             trim(regexp_extract(string_split(raw, '#')[1],
                                 '^[^:]*:(.*)$', 1)) AS val
      FROM lines
    ),
    g0 AS (
      SELECT *, starts_with(l, 'user-agent:') AS is_ua FROM m
    ),
    g1 AS (
      SELECT *, is_ua AND NOT coalesce(
               lag(is_ua) OVER (PARTITION BY host ORDER BY p), false)
             AS new_group
      FROM g0
    ),
    g2 AS (
      SELECT *, sum(CASE WHEN new_group THEN 1 ELSE 0 END)
               OVER (PARTITION BY host ORDER BY p
                     ROWS UNBOUNDED PRECEDING) AS grp
      FROM g1
    ),
    ap AS (
      SELECT host, grp,
             max(CASE WHEN is_ua AND lower(val) = '*' THEN 1 ELSE 0 END)
               = 1 AS applies
      FROM g2 GROUP BY host, grp
    ),
    rl AS (
      SELECT g2.host,
             {{'prefix': val, 'allow': starts_with(l, 'allow:'),
               'plen': CAST(length(val) AS INT)}} AS r
      FROM g2 JOIN ap USING (host, grp)
      WHERE ap.applies
        AND (starts_with(l, 'allow:') OR starts_with(l, 'disallow:'))
        AND val != ''
    ),
    ra AS (SELECT host, list(r) AS rules FROM rl GROUP BY host),
    u AS (
      SELECT doc_id,
             'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.com'
               || {_ROBOTS_PATH} AS url,
             'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS host,
             {_ROBOTS_PATH} AS path
      FROM documents
    ),
    jn AS (
      SELECT u.*, coalesce(ra.rules,
               CAST([] AS STRUCT(prefix VARCHAR, allow BOOLEAN,
                                 plen INTEGER)[])) AS rules
      FROM u LEFT JOIN ra USING (host)
    ),
    v AS (
      SELECT doc_id, url, host, path,
             CAST(len(rules) AS BIGINT) AS n_rules,
             list_sort(list_transform(
               list_filter(rules, r -> starts_with(path, r.prefix)),
               r -> {{'o1': -r.plen,
                      'o2': CASE WHEN r.allow THEN 0 ELSE 1 END,
                      'prefix': r.prefix, 'allow': r.allow}})) AS ord
      FROM jn
    )
    SELECT doc_id, url, host, path, n_rules,
           coalesce(ord[1].prefix, '') AS matched_prefix,
           (len(ord) = 0 OR ord[1].allow) AS allowed
    FROM v
    """,
)
def robots_filter_q(spark, sf):
    """Robots-exclusion politeness gate (pipeline/web.py::robots_rules +
    robots_filter): REP/Google semantics — the ``*`` user-agent group
    (consecutive UA lines share a group), comment stripping, longest
    matching prefix wins, Allow wins length ties, no rule / no ``*``
    group defaults to allowed. The fixture synthesizes 7 hosts with 3
    robots variants (multi-group with overrides, no-``*``-group,
    consecutive-UA) and 5 path shapes that exercise every verdict; the
    oracle replays parsing (lag/running-sum group windows) AND the
    longest-match evaluation, so the policy engine itself is
    value-checked cross-engine."""
    from squirreling_spark.pipeline.web import robots_filter

    did = F.col("doc_id")
    h = F.concat(F.lit("site"), (did % 7).cast("string"), F.lit(".com"))
    path = (
        F.when(did % 5 == 0, "/public/img/pic")
        .when(did % 5 == 1, "/public/page")
        .when(did % 5 == 2, "/tmp/cache")
        .when(did % 5 == 3, "/docs/readme")
        .otherwise("/")
    )
    urls = t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("https://"), h, path).alias("url"),
    )
    hosts = (
        t(spark, sf, "documents")
        .select((did % 7).alias("h"))
        .distinct()
    )
    robots = hosts.select(
        F.concat(
            F.lit("site"), F.col("h").cast("string"), F.lit(".com")
        ).alias("host"),
        F.expr(_ROBOTS_TXT.replace("chr(10)", "'\\n'")).alias(
            "robots_txt"
        ),
    )
    return robots_filter(urls, robots, "url", "doc_id")


# ---------------------------------------------------------------------------
# Round 9: n-gram novelty scoring + deterministic stratified split
# ---------------------------------------------------------------------------


@query(
    "docs_ngram_novelty",
    oracle=f"""
    WITH tk AS ({_TK}),
    g AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS ng
      FROM tk, unnest(generate_series(1, len(t) - 4)) AS u(i)
    ),
    first_seen AS (
      SELECT ng, min(doc_id) AS first_doc FROM g GROUP BY ng
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT) AS novelty_ppm
    FROM g JOIN first_seen f USING (ng)
    GROUP BY g.doc_id
    """,
)
def docs_ngram_novelty_q(spark, sf):
    """Per-document 5-gram novelty (pipeline/corpus.py::ngram_novelty):
    fraction of a document's distinct word 5-grams first seen (min
    doc_id) in that document — the corpus-curation complement of
    pairwise near-dup detection (mirrors/quotes score near zero). Two
    gram-keyed map-combined aggregates + one hash join; no pair
    explosion at any scale."""
    from squirreling_spark.pipeline.corpus import ngram_novelty

    return ngram_novelty(t(spark, sf, "documents"), "text", "doc_id", 5)


@query(
    "docs_split_assign",
    oracle="""
    WITH a AS (
      SELECT source,
             ((doc_id % 2147483648) * 2654435761 % 4294967296) % 1000
               AS bucket
      FROM documents
    ), s AS (
      SELECT source,
             CASE WHEN bucket < 50 THEN 'test'
                  WHEN bucket < 100 THEN 'valid'
                  ELSE 'train' END AS split
      FROM a
    ), c AS (
      SELECT source, split, CAST(count(*) AS BIGINT) AS n FROM s
      GROUP BY source, split
    ), tot AS (
      SELECT source, sum(n) AS n_src FROM c GROUP BY source
    )
    SELECT c.source, c.split, c.n,
           CAST(c.n * 1000000 // t.n_src AS BIGINT) AS share_ppm
    FROM c JOIN tot t USING (source)
    """,
)
def docs_split_assign_q(spark, sf):
    """Deterministic stratified train/valid/test split
    (pipeline/corpus.py::stratified_hash_split): Knuth multiplicative
    hash of doc_id -> 1000 buckets -> 5%/5%/90% split, summarized per
    source stratum as (source, split, n, share_ppm). Assignment is pure
    row-local integer arithmetic (zero shuffle, reproducible in any
    engine); the summary is one map-combined count + a broadcast-sized
    per-source total join."""
    from squirreling_spark.pipeline.corpus import stratified_hash_split

    assigned = stratified_hash_split(
        t(spark, sf, "documents"), "doc_id"
    )
    counts = assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.groupBy("source").agg(F.sum("n").alias("n_src"))
    return counts.join(F.broadcast(totals), "source").select(
        "source",
        "split",
        "n",
        F.expr("(n * 1000000) div n_src").cast("bigint").alias(
            "share_ppm"
        ),
    )


@query(
    "docs_communities",
    # 2 rounds of deterministic synchronous label propagation, unrolled —
    # ties on neighbor-label frequency break to the SMALLEST label, so
    # each round is a total-order argmax both engines replay exactly.
    oracle=f"""
    WITH pairs AS ({_PAIRS_SQL}),
    e AS MATERIALIZED (
      SELECT DISTINCT least(id_a, id_b) AS x, greatest(id_a, id_b) AS y
      FROM pairs WHERE id_a <> id_b
    ),
    und AS (
      SELECT x AS s, y AS d FROM e UNION ALL SELECT y, x FROM e
    ),
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM und),
    c1 AS (
      SELECT u.s AS n, l.label, count(*) AS c
      FROM und u JOIN l0 l ON u.d = l.node GROUP BY 1, 2
    ),
    l1 AS (
      SELECT n AS node, label FROM (
        SELECT n, label, row_number() OVER (
          PARTITION BY n ORDER BY c DESC, label) AS rn
        FROM c1) WHERE rn = 1
    ),
    c2 AS (
      SELECT u.s AS n, l.label, count(*) AS c
      FROM und u JOIN l1 l ON u.d = l.node GROUP BY 1, 2
    ),
    l2 AS (
      SELECT n AS node, label FROM (
        SELECT n, label, row_number() OVER (
          PARTITION BY n ORDER BY c DESC, label) AS rn
        FROM c2) WHERE rn = 1
    ),
    sz AS (
      SELECT label, CAST(count(*) AS BIGINT) AS comm_size
      FROM l2 GROUP BY label
    )
    SELECT CAST(l2.node AS BIGINT) AS node,
           CAST(l2.label AS BIGINT) AS label, sz.comm_size
    FROM l2 JOIN sz USING (label)
    """,
)
def docs_communities_q(spark, sf):
    """Community detection over the MinHash-LSH similarity graph
    (pipeline/graph.py::label_propagation, 2 synchronous rounds,
    min-label tie-break): groups near-dup neighborhoods into communities
    — the mode-based sibling of dedup_clusters' connected components
    (CC merges everything reachable; LPA keeps densely-linked cores
    together). Per round: one edge-keyed hash join + map-combined
    (node, label) count + a DEGREE-bounded per-node argmax window."""
    from squirreling_spark.pipeline.dedup import minhash_lsh_candidates
    from squirreling_spark.pipeline.graph import label_propagation

    pairs = minhash_lsh_candidates(
        t(spark, sf, "documents"), "text", "doc_id", 32, 8
    )
    return label_propagation(pairs, "id_a", "id_b", iters=2)


from squirreling_spark.pipeline.classify import (  # noqa: E402
    langid_oracle_sql,
)


@query("docs_langid", oracle=langid_oracle_sql("documents"))
def docs_langid_q(spark, sf):
    """Deterministic char-trigram language ID
    (pipeline/classify.py::langid_ngram): every pretraining pipeline's
    first routing stage — bucket documents by language before
    language-specific filters run (the CCNet / fastText-LID slot,
    following Cavnar & Trenkle's n-gram-profile method with a FIXED
    integer profile so both engines replay it exactly).

    Spark plan: the tiny profile table is compiled INTO the row
    expression (replace-count identity + integer weighted sums +
    array_max argmax) — zero joins, zero explode, zero shuffle; language
    ID runs at parquet scan speed. The oracle replays it through the
    INDEPENDENT unpivoted-profile cross-join + window-argmax algorithm."""
    from squirreling_spark.pipeline.classify import langid_ngram

    return langid_ngram(t(spark, sf, "documents"))


from squirreling_spark.pipeline.sketch import hll_oracle_sql  # noqa: E402

# DuckDB 5-gram builder matching pipeline/corpus.word_ngrams: whitespace
# tokens of the space-normalized text, overlapping windows of 5.
_D_5GRAMS = """
  SELECT source,
         unnest(list_transform(generate_series(1, len(tk) - 4),
                i -> array_to_string(tk[i:i+4], ' '))) AS ng
  FROM (SELECT source,
               string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                            ' ') AS tk
        FROM documents)
  WHERE len(tk) >= 5
"""


@query(
    "docs_hll_ngrams",
    oracle=f"""
    WITH g AS ({_D_5GRAMS})
    SELECT * FROM ({hll_oracle_sql("g", "ng", "source", p=8)}) est
    """,
)
def docs_hll_ngrams_q(spark, sf):
    """N-gram DIVERSITY per source: distinct 5-gram count estimated by
    the HyperLogLog register sketch (pipeline/sketch.py) — the standard
    corpus-curation diversity signal (low distinct-gram mass per token
    flags template/boilerplate-heavy sources; cf. the Gopher repetition
    rules, which measure the same thing within one document). At 100 TB
    the HLL path replaces an exact count-distinct's full gram shuffle
    with a 256-register-per-source exchange, and per-shard register
    tables merge by MAX. The registered default is PURE sketch (r10
    verdict task 1): no exact count-distinct branch — the plan is the
    row-local gram projection plus exactly two map-combined exchanges
    (plan pin in tests/test_plans.py); the exact-compare exhibit lives
    in docs_hll_ngrams_vs_exact (post-window). Registers AND estimate
    are integer-exact cross-engine, so the driver hashes the estimate
    itself."""
    from squirreling_spark.pipeline.corpus import word_ngrams
    from squirreling_spark.pipeline.sketch import (
        hll_estimate,
        hll_registers,
    )

    grams = word_ngrams(t(spark, sf, "documents"), "text", "source", 5)
    regs = hll_registers(grams, "ng", p=8, group_cols=("source",))
    return hll_estimate(regs, p=8, group_cols=("source",))


@query(
    "docs_hll_ngrams_vs_exact",
    oracle=f"""
    WITH g AS ({_D_5GRAMS}),
    est AS ({hll_oracle_sql("g", "ng", "source", p=8)}),
    ex AS (
      SELECT source, CAST(count(DISTINCT ng) AS BIGINT) AS exact_distinct
      FROM g GROUP BY 1
    )
    SELECT est.source, est.est_distinct, est.n_buckets, ex.exact_distinct,
           CAST((est.est_distinct * 1000000) // ex.exact_distinct AS BIGINT)
             AS ratio_ppm
    FROM est JOIN ex ON est.source = ex.source
    """,
)
def docs_hll_ngrams_vs_exact_q(spark, sf):
    """EXHIBIT variant of docs_hll_ngrams: the exact distinct-gram count
    (a full gram-keyed count-distinct shuffle — fixture-scale only, kept
    out of the registered default per the r10 verdict) joined alongside
    the HLL estimate, pinning the ~6.5% (1.04/sqrt(256)) error bound
    under the gate — ratio_ppm = 1e6 * est / exact, integer-exact both
    engines."""
    from squirreling_spark.pipeline.corpus import word_ngrams
    from squirreling_spark.pipeline.sketch import (
        hll_estimate,
        hll_registers,
    )

    grams = word_ngrams(t(spark, sf, "documents"), "text", "source", 5)
    regs = hll_registers(grams, "ng", p=8, group_cols=("source",))
    est = hll_estimate(regs, p=8, group_cols=("source",))
    exact = grams.groupBy("source").agg(
        F.count_distinct("ng").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "source").select(
        "source",
        "est_distinct",
        "n_buckets",
        "exact_distinct",
        F.expr(
            "CAST((est_distinct * 1000000) div exact_distinct AS BIGINT)"
        ).alias("ratio_ppm"),
    )


from squirreling_spark.pipeline.sketch import qsketch_oracle_sql  # noqa: E402


@query(
    "docs_length_quantiles",
    oracle=qsketch_oracle_sql(
        "documents", "length(text)", "source", b=4
    ),
)
def docs_length_quantiles_q(spark, sf):
    """Per-source p50/p90/p99 document LENGTH from the log-histogram
    quantile sketch (pipeline/sketch.py, HdrHistogram-style
    exponent+linear bucketing; same guarantee family as DDSketch,
    Masson et al. VLDB 2019) — the QUANTILE leg of the sketch family
    (CMS = frequency, HLL = cardinality): length/score distributions at
    100 TB without a full sort. State is ≤ ~1.9k buckets per source
    REGARDLESS of corpus size; shard/day sketches merge by bucket-wise
    SUM; every shuffle carries bucket cells, never documents
    (plan-pinned: tests/test_plans.py). Rank math is rational-integer
    (ceil(q·n) exact), bucket bounds invert the bit-exact bin() bucket
    map, so the DuckDB oracle replays sketch, ranks, and picks
    value-for-value; the true order statistic provably lies in
    [q_lo, q_hi] (half-width ≤ 3.1% at b=4 — property-tested in
    tests/test_sketch.py)."""
    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    docs = t(spark, sf, "documents").select(
        "source", F.length("text").alias("_len")
    )
    sk = qsketch_build(docs, "_len", b=4, group_cols=("source",))
    return qsketch_quantiles(sk, b=4, group_cols=("source",))


@query(
    "events_value_quantiles",
    oracle=qsketch_oracle_sql(
        "events",
        "value",
        "event_type",
        b=4,
        quantiles=((25, 100), (50, 100), (90, 100), (99, 100)),
        value_scale=1000,
    ),
)
def events_value_quantiles_q(spark, sf):
    """Per-event-type p25/p50/p90/p99 of the (milli-unit fixed-point)
    event value from the log-histogram quantile sketch — the DOUBLE
    column path as a first-class contract (r11 verdict task 5):
    ``value_scale=1000`` makes the sketch bucket floor(value·1000) on
    both engines, every reported bound living in that scaled integer
    domain (divide by 1000 to read milli-units back). floor() is the
    deterministic cross-engine fixed-point fold the digest checksums
    already rely on; the sketch then runs its integer contract
    unchanged, including the enforced |v| < 2^62 guard. Continuous
    latency/value distribution monitoring at stream scale uses exactly
    this shape (see sketch_stream: the bucket table maintains itself
    under Structured Streaming with bounded state)."""
    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    ev = t(spark, sf, "events").select("event_type", "value")
    sk = qsketch_build(
        ev, "value", b=4, group_cols=("event_type",), value_scale=1000
    )
    return qsketch_quantiles(
        sk,
        quantiles=((25, 100), (50, 100), (90, 100), (99, 100)),
        b=4,
        group_cols=("event_type",),
    )


from squirreling_spark.pipeline.sketch import (  # noqa: E402
    qsketch_cdf_oracle_sql,
)

_LEN_CDF_PROBES = (200, 500, 1000, 2000, 5000)


@query(
    "docs_length_cdf",
    oracle=qsketch_cdf_oracle_sql(
        "documents", "length(text)", "source", _LEN_CDF_PROBES, b=4
    ),
)
def docs_length_cdf_q(spark, sf):
    """Per-source CDF bounds at fixed length cutoffs, read from the SAME
    log-histogram sketch as docs_length_quantiles — the inverse
    direction ("what fraction of this source is ≤ 2000 chars", the
    question a length-cutoff curation decision actually asks; the
    quantile row answers "what length is p90"). Integer-exact: the true
    fraction provably lies in [cdf_lo_ppm, cdf_hi_ppm] (bucket
    monotonicity — see qsketch_cdf), and both bounds hash-match the
    DuckDB replay. Plan: probes explode from a literal array against
    BUCKET-level rows (row-local Generate, no join), one map-combined
    (source, probe) aggregation — two hash exchanges total, the same
    bounded-state shape as the quantile row (pin in tests/test_plans.py)."""
    from squirreling_spark.pipeline.sketch import qsketch_build, qsketch_cdf

    docs = t(spark, sf, "documents").select(
        "source", F.length("text").alias("_len")
    )
    sk = qsketch_build(docs, "_len", b=4, group_cols=("source",))
    return qsketch_cdf(
        sk, _LEN_CDF_PROBES, b=4, group_cols=("source",)
    )


@query(
    "docs_length_quantiles_vs_exact",
    oracle=f"""
    WITH sk AS MATERIALIZED (
      {qsketch_oracle_sql("documents", "length(text)", "source", b=4)}
    ),
    r AS (
      SELECT source, length(text) AS len,
             row_number() OVER (PARTITION BY source ORDER BY length(text))
               AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    q(num, den) AS (SELECT * FROM (VALUES (50, 100), (90, 100), (99, 100))),
    ex AS (
      SELECT r.source,
             CAST((q.num * 1000000) // q.den AS BIGINT) AS q_ppm,
             CAST(r.len AS BIGINT) AS exact_q
      FROM r CROSS JOIN q
      WHERE r.rn = (q.num * r.n + q.den - 1) // q.den
    )
    SELECT sk.source, sk.q_ppm, sk.n_total, ex.exact_q,
           sk.q_lo, sk.q_hi, sk.q_est,
           (sk.q_lo <= ex.exact_q AND ex.exact_q <= sk.q_hi) AS contained
    FROM sk JOIN ex ON sk.source = ex.source AND sk.q_ppm = ex.q_ppm
    """,
)
def docs_length_quantiles_vs_exact_q(spark, sf):
    """EXHIBIT variant of docs_length_quantiles: the exact order
    statistic (a full per-source sort via row_number — fixture-scale
    only, kept out of the registered default per the sketch-family
    policy) joined alongside the sketch answer, pinning the containment
    guarantee (q_lo ≤ exact ≤ q_hi) under the gate. Ties in length are
    irrelevant: the VALUE at rank ceil(q·n) is deterministic whatever
    order equal lengths enumerate."""
    from pyspark.sql import Window as W

    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    docs = t(spark, sf, "documents").select(
        "source", F.length("text").alias("_len")
    )
    sk = qsketch_build(docs, "_len", b=4, group_cols=("source",))
    est = qsketch_quantiles(sk, b=4, group_cols=("source",))
    r = docs.select(
        "source",
        "_len",
        F.row_number()
        .over(W.partitionBy("source").orderBy("_len"))
        .alias("_rn"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("_n"),
    )
    qs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(num).cast("bigint").alias("num"),
                    F.lit(den).cast("bigint").alias("den"),
                )
                for num, den in ((50, 100), (90, 100), (99, 100))
            ]
        )
    ).alias("_q")
    ex = (
        r.select("source", "_len", "_rn", "_n", qs)
        .where(F.expr("_rn = (_q.num * _n + _q.den - 1) div _q.den"))
        .select(
            "source",
            F.expr("CAST((_q.num * 1000000) div _q.den AS BIGINT)").alias(
                "q_ppm"
            ),
            F.col("_len").cast("bigint").alias("exact_q"),
        )
    )
    return est.join(ex, ["source", "q_ppm"]).select(
        "source",
        "q_ppm",
        "n_total",
        "exact_q",
        "q_lo",
        "q_hi",
        "q_est",
        ((F.col("q_lo") <= F.col("exact_q"))
         & (F.col("exact_q") <= F.col("q_hi"))).alias("contained"),
    )


# Cross-engine whitespace token count (the _D_5GRAMS tokenization).
_D_NTOK = (
    "len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))"
)
_S_NTOK = (
    "size(split(trim(regexp_replace(text, '\\\\s+', ' ')), ' '))"
)


@query(
    "docs_token_mass_quantiles",
    oracle=qsketch_oracle_sql(
        "documents",
        "length(text)",
        "source",
        b=4,
        weight_sql=_D_NTOK,
    ),
)
def docs_token_mass_quantiles_q(spark, sf):
    """WEIGHTED quantile sketch: per-source doc-length quantiles
    weighted by TOKEN COUNT — "the doc length at/below which p50/p90/p99
    of this source's token mass lives", the curation quantity behind
    length-based mixing and packing decisions (token mass, not doc
    count, is what a training run consumes). Same integer contract as
    docs_length_quantiles with cnt = sum(weight); bucket tables still
    bounded, still bucket-SUM mergeable, rank arithmetic still rational
    (ceil of q x total token mass)."""
    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    docs = t(spark, sf, "documents").select(
        "source",
        F.length("text").alias("_len"),
        F.expr(_S_NTOK).cast("bigint").alias("_ntok"),
    )
    sk = qsketch_build(
        docs, "_len", b=4, group_cols=("source",), weight_col="_ntok"
    )
    return qsketch_quantiles(sk, b=4, group_cols=("source",))


from squirreling_spark.pipeline.sketch import (  # noqa: E402
    hll_pairwise_overlap_sql,
    hll_registers_sql,
)

_HLL_SRC_REGS = hll_registers_sql("g", "ng", "source", p=8)


@query(
    "sources_gram_overlap",
    oracle=f"""
    WITH g AS ({_D_5GRAMS}),
    r AS MATERIALIZED ({_HLL_SRC_REGS}),
    t AS (SELECT DISTINCT source FROM documents),
    {hll_pairwise_overlap_sql("r", "t", "source", "source_a", "source_b",
                              p=8, jaccard=True)}
    """,
)
def sources_gram_overlap_q(spark, sf):
    """Pairwise cross-SOURCE 5-gram overlap and Jaccard estimated by HLL
    register ALGEBRA — pipeline/sketch.py hll_pairwise_overlap, the SAME
    helper (Spark and oracle sides) behind events_user_overlap, proven
    generic on a second domain: content overlap between corpus sources
    (shared boilerplate, mirrored sites, near-duplicate feeds) sized
    BEFORE any pairwise dedup join runs. 256 registers per source move
    instead of every gram; union registers are bucket-wise MAX (exact
    lattice merge); |A∩B| by inclusion-exclusion and Jaccard =
    overlap/union in integer ppm. Pure sketch — no exact branch; the
    register table is a checkpointed leaf (gram explode runs once); the
    O(S²) pair expansion is envelope-guarded by the helper's max_groups
    probe (documented: right for tens-to-hundreds of groups, an LSH
    candidate generator beyond that)."""
    from squirreling_spark.pipeline.corpus import word_ngrams
    from squirreling_spark.pipeline.sketch import (
        hll_pairwise_overlap,
        hll_registers,
    )

    docs = t(spark, sf, "documents")
    grams = word_ngrams(docs, "text", "source", 5)
    regs = hll_registers(grams, "ng", p=8, group_cols=("source",))
    tl = docs.select("source").distinct()
    return hll_pairwise_overlap(
        regs, tl, "source", "source_a", "source_b", p=8, jaccard=True
    )