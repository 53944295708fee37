"""Semantic unit tests for the corpus-hygiene operators
(pipeline/corpus.py) on tiny hand-checkable inputs."""

from pyspark.sql import functions as F

from squirreling_spark.pipeline.corpus import (
    contamination_check,
    dedup_segments,
    repetition_stats,
    stratified_sample,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dedup_segments_keeps_first_occurrence(spark):
    # width=2 segments: doc 1 = [a b][c d], doc 2 = [a b][x y] — doc 2's
    # "a b" is the later copy and must be dropped.
    df = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    out = {
        r["doc_id"]: r
        for r in dedup_segments(df, "text", "doc_id", width=2).collect()
    }
    assert out[1]["n_segments"] == 2 and out[1]["n_dropped"] == 0
    assert out[2]["n_segments"] == 2 and out[2]["n_dropped"] == 1
    assert out[2]["n_kept"] == 1
    assert out[1]["clean_fp"] is not None


def test_dedup_segments_fully_duplicated_doc_null_fp(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b")])
    out = {
        r["doc_id"]: r
        for r in dedup_segments(df, "text", "doc_id", width=2).collect()
    }
    assert out[2]["n_kept"] == 0
    assert out[2]["clean_fp"] is None


def test_repetition_stats_fractions(spark):
    # tokens: a b a b a -> bigrams: "a b","b a","a b","b a" — all duplicated
    df = _docs(spark, [(1, "a b a b a")])
    r = repetition_stats(df, "text", "doc_id").collect()[0]
    assert r["n_tokens"] == 5
    assert r["n_bigrams"] == 4
    assert r["top_bigram"] in ("a b", "b a")  # tie on count=2 -> max text
    assert r["top_bigram"] == "b a"
    assert r["top_bigram_count"] == 2
    assert r["dup_bigram_frac"] == 1.0
    assert abs(r["dup_token_frac"] - (1 - 2 / 5)) < 1e-9


def test_contamination_check_flags_shared_ngrams(spark):
    # doc 0 is the benchmark (pred: doc_id % 2 == 0); doc 1 shares the
    # 2-gram "a b", doc 3 shares nothing.
    df = _docs(spark, [(0, "a b c"), (1, "x a b"), (3, "q r s")])
    out = contamination_check(
        df, "text", "doc_id", bench_pred=lambda c: c % 2 == 0, n=2
    ).collect()
    assert {(r["doc_id"], r["n_hits"]) for r in out} == {(1, 1)}


def test_stratified_sample_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(200)],
        "doc_id bigint, source string",
    )
    rate = lambda s: 20 + (F.expr("cast(substring(source, 4) as int)") * 7) % 60
    a = stratified_sample(df, "doc_id", "source", rate).collect()
    b = stratified_sample(df.repartition(7), "doc_id", "source", rate).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    for r in a:
        assert r["bucket"] < r["rate"]


def test_tfidf_ranks_rare_terms_first(spark):
    # "z" appears only in doc 1 (df=1); "a" is in every doc (df=3, idf=1).
    df = _docs(spark, [(1, "a z z"), (2, "a b"), (3, "a c")])
    out = tfidf_top_terms(df, "text", "doc_id", k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    assert top[1] == "z"
    r1 = [r for r in out if r["doc_id"] == 1][0]
    # tf=2, n_docs=3, df=1 -> score 6.0
    assert r1["tfidf"] == 6.0 and r1["rank"] == 1


def test_connected_components_chain_and_cycle(spark):
    from squirreling_spark.pipeline.dedup import connected_components

    # Component A is a 6-node chain (diameter 5 — needs pointer-jumping to
    # converge in < 5 rounds), component B is a 3-cycle, C a lone pair.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (12, 10),
         (20, 21)],
        "id_a bigint, id_b bigint",
    )
    expect = {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }
    # Driver union-find arm (default: small edge list).
    out = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert out == expect
    # Distributed pointer-jumping arm must produce the identical labeling
    # (driver_threshold=0 forces it).
    dist = {
        r["node"]: r["label"]
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert dist == expect


def test_dedup_clusters_groups_near_dups(spark):
    from squirreling_spark.pipeline.dedup import dedup_clusters

    # Docs 1/2/3 are identical (one cluster of 3); 4 is unique (no pairs →
    # absent from the output, by contract only clustered docs appear).
    txt = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, txt), (2, txt), (3, txt), (4, "completely different words here entirely")],
        "doc_id bigint, text string",
    )
    out = dedup_clusters(df, "text", "doc_id", num_hashes=16, bands=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r["cluster_id"] == 1 and r["cluster_size"] == 3
               for r in rows.values())


def test_table_profile_single_pass_stats(spark):
    from squirreling_spark.pipeline.profile import table_profile

    df = spark.createDataFrame(
        [(1, None, 2.5), (2, "a", 0.5), (3, "a", None)],
        "id bigint, s string, v double",
    )
    out = {r["col_name"]: r for r in table_profile(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert out["id"]["n_rows"] == 3 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 3
    assert out["id"]["min_str"] == "1" and out["id"]["max_str"] == "3"
    assert out["s"]["n_null"] == 1 and abs(out["s"]["null_frac"] - 1 / 3) < 1e-12
    assert out["s"]["n_distinct"] == 1
    # typed (not lexicographic) min/max: 0.5 < 2.5 despite "2.500000" < "0.5..."
    assert out["v"]["min_str"] == "0.500000" and out["v"]["max_str"] == "2.500000"
    # approx path (no oracle — HLL estimates are engine-specific) still runs
    ap = {r["col_name"]: r for r in table_profile(df, exact=False).collect()}
    assert ap["id"]["n_distinct"] >= 2


def test_knn_join_lsh_finds_identical_neighbors(spark):
    from squirreling_spark.pipeline.similarity import knn_join_lsh

    # Identical vectors share every LSH band, so recall is guaranteed for
    # exact duplicates; cosine then ranks the duplicate first (sim 1.0).
    rows = [
        (1, [1.0, 0.0, 0.5, 0.0]),
        (2, [1.0, 0.0, 0.5, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.5]),
        (4, [0.0, 1.0, 0.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = knn_join_lsh(df, "embedding", "vec_id", k=1, planes=8, bands=4, dim=4)
    top = {r["q_id"]: (r["vec_id"], r["sim"]) for r in out.collect()}
    assert top[1] == (2, 1.0) and top[2] == (1, 1.0)
    assert top[3] == (4, 1.0) and top[4] == (3, 1.0)


def test_kmeans_separates_obvious_clusters(spark):
    from squirreling_spark.pipeline.cluster import kmeans

    # two tight groups on opposite axes; seeds (2 lowest ids) fall one in
    # each group, so 2 Lloyd rounds must separate them perfectly
    rows = [
        (0, [1.0, 0.0, 0.1, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.1]),
        (2, [0.9, 0.0, 0.1, 0.0]),
        (3, [0.0, 0.9, 0.0, 0.1]),
        (4, [1.0, 0.1, 0.0, 0.0]),
        (5, [0.1, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    assignments, clusters = kmeans(df, "embedding", "vec_id", k=2, iters=2)
    a = {r["vec_id"]: r["cluster"] for r in assignments.collect()}
    assert len(a) == 6
    assert a[0] == a[2] == a[4]
    assert a[1] == a[3] == a[5]
    assert a[0] != a[1]
    c = {r["cluster_id"]: r for r in clusters.collect()}
    assert sorted(c) == [0, 1]
    assert all(r["n_vecs"] == 3 for r in c.values())
    # centroid string: dim fixed-precision components, '/'-joined
    parts = c[0]["centroid"].split("/")
    assert len(parts) == 4
    assert all("." in p for p in parts)


def test_kmeans_empty_cluster_drops_out(spark):
    from squirreling_spark.pipeline.cluster import kmeans

    # all vectors identical: every row assigns to seed 0 (tie-break on
    # lowest centroid id); seed 1's cluster vanishes instead of erroring
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(4)],
        "vec_id bigint, embedding array<double>",
    )
    _, clusters = kmeans(df, "embedding", "vec_id", k=2, iters=2)
    rows = clusters.collect()
    assert len(rows) == 1
    assert rows[0]["cluster_id"] == 0 and rows[0]["n_vecs"] == 4


def test_cluster_representatives_picks_best_quality(spark):
    from squirreling_spark.pipeline.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (7, 70), (8, 70)],
        "doc_id bigint, cluster_id bigint",
    )
    quality = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (7, 1.0), (8, 1.0)],
        "doc_id bigint, quality double",
    )
    out = {
        r["cluster_id"]: r
        for r in cluster_representatives(clusters, quality).collect()
    }
    # cluster 10: quality tie 9.0 between ids 2 and 3 -> lowest id wins
    assert out[10]["keep_id"] == 2 and out[10]["keep_quality"] == 9.0
    assert out[10]["cluster_size"] == 3
    # cluster 70: full tie -> lowest id
    assert out[70]["keep_id"] == 7 and out[70]["cluster_size"] == 2


def test_adaptive_quality_filter_per_group_cutoff(spark):
    from squirreling_spark.pipeline.corpus import adaptive_quality_filter

    # source A scores 1..4 (median 2.5), source B scores 100..400
    # (median 250): a global threshold would drop all of A or keep all
    # of B; the per-group cutoff keeps the top half of EACH
    rows = [("A", 1, 1.0), ("A", 2, 2.0), ("A", 3, 3.0), ("A", 4, 4.0),
            ("B", 5, 100.0), ("B", 6, 200.0), ("B", 7, 300.0), ("B", 8, 400.0)]
    df = spark.createDataFrame(rows, "source string, id bigint, score double")
    kept = adaptive_quality_filter(df, "score", "source", 0.5)
    ids = sorted(r["id"] for r in kept.collect())
    assert ids == [3, 4, 7, 8]
    assert all(r["score"] >= r["cutoff"] for r in kept.collect())


def test_ngram_lm_score_counts_and_oov(spark):
    from squirreling_spark.pipeline.corpus import ngram_lm_score

    # Reference: one doc "a b a b" -> bigrams (a,b) (b,a) (a,b):
    # c2(a,b)=2, c2(b,a)=1, c1(a)=2, c1(b)=1, V=2 distinct second tokens.
    ref = spark.createDataFrame(
        [(0, "a b a b")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b"),      # one bigram, seen: c2=2, c1=2
            (2, "z q"),      # one bigram, fully OOV
            (3, "a"),        # no bigrams -> absent from output
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           ngram_lm_score(corpus, ref, "text", "doc_id").collect()}
    assert set(out) == {1, 2}
    r1, r2 = out[1], out[2]
    assert r1["n_bigrams"] == 1 and r1["n_oov"] == 0
    # (sum_c2 + n) / (sum_c1 + n*V) = (2+1)/(2+2) = 0.75
    assert r1["lm_score"] == 0.75 and r1["oov_rate"] == 0.0
    assert r2["n_bigrams"] == 1 and r2["n_oov"] == 1
    # (0+1)/(0+2) = 0.5
    assert r2["lm_score"] == 0.5 and r2["oov_rate"] == 1.0


def test_boilerplate_stats_flags_template_bigrams(spark):
    from squirreling_spark.pipeline.corpus import boilerplate_stats

    # "click here" appears in 3 docs -> it is the global top bigram with
    # top_n=1; doc 4 contains none of it.
    df = _docs(
        spark,
        [
            (1, "click here now"),
            (2, "click here please"),
            (3, "always click here"),
            (4, "completely unrelated text"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_stats(df, "text", "doc_id", top_n=1).collect()
    }
    # doc 1: bigrams [click here, here now] -> 1 of 2 boilerplate
    assert out[1]["n_bigrams"] == 2 and out[1]["n_boiler"] == 1
    assert out[1]["boiler_frac"] == 0.5
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_frac"] == 0.0


def test_pagerank_star_graph_hand_computed(spark):
    from squirreling_spark.pipeline.graph import pagerank

    # Star: 1-2, 1-3, 1-4. N=4, deg(1)=3, deg(2..4)=1.
    # pr0 = 1e12//4 = 250e9 each; base = 150e9//4 = 37.5e9.
    # After 1 round: pr(1) = 37.5e9 + 17*(3*250e9)//20 = 675_000_000_000
    # pr(2..4) = 37.5e9 + 17*(250e9//3)//20 = 108_333_333_333
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a bigint, id_b bigint"
    )
    out = {r["doc_id"]: r for r in
           pagerank(edges, "id_a", "id_b", iters=1).collect()}
    assert out[1]["degree"] == 3 and out[2]["degree"] == 1
    assert out[1]["pr_scaled"] == 675_000_000_000
    assert out[2]["pr_scaled"] == 108_333_333_333
    assert out[3]["pr_scaled"] == out[4]["pr_scaled"] == out[2]["pr_scaled"]
    # hub outranks leaves
    assert out[1]["pr_scaled"] > out[2]["pr_scaled"]


def test_temperature_mix_flattens_skew(spark):
    """alpha=0.5 mixing (pipeline/corpus.py::temperature_mix): a small
    source must be sampled at a HIGHER rate than a large one (sqrt
    flattening), the overall take must sit near the target fraction, and
    the decision must be append-stable (a kept doc stays kept when the
    corpus grows)."""
    from squirreling_spark.pipeline.corpus import temperature_mix
    from squirreling_spark.qutil import t

    docs = t(spark, "/root/testdata/sf0.01", "documents")
    skewed = docs.withColumn(
        "source",
        F.when(F.col("source") == "src0", F.lit("small")).otherwise(
            F.lit("big")
        ),
    ).select("doc_id", "source")
    kept = temperature_mix(skewed, "doc_id", "source", target_frac_pct=30)
    n = {r["source"]: r["cnt"] for r in
         skewed.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    k = {r["source"]: r["cnt"] for r in
         kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    rate_small = k.get("small", 0) / n["small"]
    rate_big = k.get("big", 0) / n["big"]
    assert rate_small > rate_big, (rate_small, rate_big)
    total_rate = sum(k.values()) / sum(n.values())
    assert 0.2 < total_rate < 0.4, total_rate
    # append stability: rerun on half the corpus; every doc kept there
    # must also be kept in the full run IF its source rate didn't drop
    # (same source sizes here, so subset keeps ⊆ full keeps per bucket)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert len(kept_ids) == sum(k.values())


def test_chunk_documents_rules(spark):
    """Window arithmetic: remainder tail kept, contained tail dropped,
    blank docs emit nothing, overlap shares exactly `overlap` tokens."""
    from squirreling_spark.pipeline.corpus import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "   "), (4, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=6, overlap=2)
    rows = {
        (r["doc_id"], r["chunk_idx"]): r for r in out.collect()
    }
    # doc 1: 10 tokens, step 4 -> starts 0, 4; start 8 has 2 (= overlap)
    # tokens left, fully contained in the previous chunk -> dropped
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1)}
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3 w4 w5"
    assert rows[(1, 1)]["chunk_text"] == "w4 w5 w6 w7 w8 w9"
    assert rows[(1, 1)]["start_tok"] == 4 and rows[(1, 1)]["n_tokens"] == 6
    # consecutive chunks share exactly `overlap` tokens
    assert rows[(1, 0)]["chunk_text"].split()[-2:] == \
        rows[(1, 1)]["chunk_text"].split()[:2]
    # doc 2: 3 tokens -> one short chunk
    assert rows[(2, 0)]["chunk_text"] == "a b c"
    assert rows[(2, 0)]["n_tokens"] == 3
    # doc 3 blank: no chunks; doc 4: single token
    assert not any(k[0] == 3 for k in rows)
    assert rows[(4, 0)]["chunk_text"] == "solo"


def test_chunk_documents_rejects_bad_overlap(spark):
    from squirreling_spark.pipeline.corpus import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_bm25_rank_orders_by_relevance(spark):
    from squirreling_spark.pipeline.retrieval import bm25_rank

    # doc 1 saturates on "x" (tf=4) but is long; doc 2 has tf=1 and is
    # short; doc 3 has no hits. With one term, rational idf is shared, so
    # ranking reduces to the tf-saturation component.
    df = _docs(
        spark,
        [
            (1, "x x x x a b c d e f"),
            (2, "x a"),
            (3, "a b c"),
        ],
    )
    rows = bm25_rank(df, "text", "doc_id", ["x"], topk=3).collect()
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert rows[2]["score"] == 0.0
    # hand-check doc 2: N=3, df=2 ("x" is in docs 1 and 2) ->
    # idf=(3-2+.5)/(2+.5)=0.6; dl=2, avgdl=5 ->
    # tfs = 2.25/(1+1.25*(0.25+0.75*2/5)) = 4/3 -> score = 0.8
    r2 = rows[1]
    assert r2["tf1"] == 1 and r2["dl"] == 2
    idf = (3 - 2 + 0.5) / (2 + 0.5)
    tfs = (1.0 * 2.25) / (1.0 + 1.25 * (1.0 - 0.75 + 0.75 * 2.0 / 5.0))
    assert r2["score"] == idf * tfs


def test_bm25_rank_tie_breaks_on_id(spark):
    from squirreling_spark.pipeline.retrieval import bm25_rank

    df = _docs(spark, [(2, "x y"), (1, "x y"), (3, "z z")])
    rows = bm25_rank(df, "text", "doc_id", ["x"], topk=2).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]


def test_nfc_normalize_composes_and_audits(spark):
    from squirreling_spark.pipeline.text import nfc_normalize_docs

    df = _docs(
        spark,
        [
            (1, "café"),       # decomposed -> composes, 5 -> 4 chars
            (2, "café"),        # already NFC -> unchanged
            (3, "Å"),           # singleton -> U+00C5, same length
        ],
    )
    rows = {r["doc_id"]: r for r in nfc_normalize_docs(df, "text", "doc_id").collect()}
    assert rows[1]["changed"] and rows[1]["n_chars_raw"] == 5 and rows[1]["n_chars_nfc"] == 4
    assert not rows[2]["changed"]
    assert rows[3]["changed"] and rows[3]["n_chars_nfc"] == 1
    # docs 1 and 2 normalize to the same text -> same fingerprint
    assert rows[1]["fp_nfc"] == rows[2]["fp_nfc"]


def test_decontaminate_neardup_flags_quoting_doc(spark):
    from squirreling_spark.pipeline.dedup import decontaminate_neardup

    # bench item 100 quotes the first 30 of doc 1's 40 tokens (near-dup,
    # not exact); doc 2 is unrelated and must not be flagged even if a
    # band collided (the exact-Jaccard verify guards). The doc is long
    # enough (38 shingles) that the minhash estimate is reliable — on
    # ~10-shingle docs banding recall is genuinely poor, which is the
    # documented LSH s-curve, not a bug.
    words = [f"w{i}tok" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(words)),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(words[:30]))], "bench_id bigint, text string"
    )
    rows = decontaminate_neardup(
        docs, bench, "text", "doc_id", threshold=0.35
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == 1 and r["top_bench_id"] == 100
    # shingles: doc 38, bench 28, all bench shingles shared -> 28/38
    assert r["max_jaccard"] == round(28 / 38, 6)


def test_domain_reweight_upweights_high_loss_domain(spark):
    from squirreling_spark.pipeline.corpus import domain_reweight

    # domain "hard" has loss 900k ppm per doc, "easy" 100k: after one
    # multiplicative round hard must out-weigh easy; weights stay a
    # ~1e6-ppm simplex; and the result is partition-invariant.
    rows = [(i, "hard" if i % 2 == 0 else "easy",
             900_000 if i % 2 == 0 else 100_000) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, dom string, loss bigint")
    out = {r["domain"]: r for r in
           domain_reweight(df, "doc_id", "dom", "loss", rounds=2).collect()}
    assert set(out) == {"hard", "easy"}
    assert out["hard"]["w1_ppm"] > out["easy"]["w1_ppm"]
    # round 2 has converged (easy is pinned at the floor, so the kept
    # sample is ~all hard -> excess ~0); hard stays dominant
    assert out["hard"]["w2_ppm"] > 900_000
    for t in ("w1_ppm", "w2_ppm"):
        s = out["hard"][t] + out["easy"][t]
        assert 999_990 <= s <= 1_000_000  # floored renormalization
    out2 = {r["domain"]: r for r in
            domain_reweight(df.repartition(7), "doc_id", "dom", "loss",
                            rounds=2).collect()}
    assert {k: (v["w1_ppm"], v["w2_ppm"]) for k, v in out.items()} == \
           {k: (v["w1_ppm"], v["w2_ppm"]) for k, v in out2.items()}
    assert out["hard"]["mean_loss"] == 900_000


def test_dsir_upweights_target_like_docs(spark):
    from squirreling_spark.pipeline.corpus import dsir_importance_sample

    # target distribution is "a b" bigrams; doc 1 matches it, doc 2 is
    # from a different distribution -> importance(doc1) > importance(doc2)
    docs = _docs(
        spark,
        [
            (1, "a b a b a b"),
            (2, "x y x y x y"),
            (3, "a b x y"),
        ],
    )
    target = _docs(spark, [(100, "a b a b"), (101, "b a b a")])
    out = {
        r["doc_id"]: r
        for r in dsir_importance_sample(
            docs, target, "text", "doc_id"
        ).collect()
    }
    assert out[1]["importance"] > out[3]["importance"] > out[2]["importance"]
    for r in out.values():
        assert r["keep"] == (r["bucket"] < r["rate_ppm"])
        assert r["rate_ppm"] <= 1_000_000


def test_gopher_quality_rules(spark):
    # planted docs exercising each Gopher rule (fixture docs have no
    # newlines, so the line rules are pinned here)
    from squirreling_spark.pipeline.text import gopher_quality

    good = ("the quick brown fox jumps with energy and that "
            "style to be of note " * 5)
    docs = [
        (1, good),                                  # passes everything
        (2, "# # # # # symbols " + "word " * 60),   # symbol ratio + stops
        (3, "- one\n- two\n- three"),               # 100% bullet lines
        (4, "a...\nb…\nc…\nplain\nmore\nthe end"),  # 50% ellipsis lines
        (5, "short doc"),                           # word-count floor
        (6, "12345 67890 " * 40),                   # no alphabetic words
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = {
        r.doc_id: r
        for r in gopher_quality(df, "text", "doc_id", min_words=20).collect()
    }
    assert rows[1].keep and rows[1].n_stopwords >= 2
    assert not rows[2].keep and rows[2].n_symbols == 5
    assert rows[3].n_bullet_lines == 3 and rows[3].n_lines == 3
    assert rows[4].n_ellipsis_lines == 3
    assert not rows[5].keep
    assert not rows[6].keep and rows[6].n_alpha_words == 0
    # keep must be a pure function of the counts (integer cross-mult)
    r4 = rows[4]
    assert r4.keep == (
        20 <= r4.n_words <= 100000
        and 3 * r4.n_words <= r4.sum_wlen <= 10 * r4.n_words
        and r4.n_symbols * 10 <= r4.n_words
        and r4.n_bullet_lines * 10 <= r4.n_lines * 9
        and r4.n_ellipsis_lines * 10 <= r4.n_lines * 3
        and r4.n_alpha_words * 10 >= r4.n_words * 8
        and r4.n_stopwords >= 2
    )


def test_c4_quality_rules(spark):
    # planted docs exercising each C4 rule (Raffel et al. 2020 §2.2)
    from squirreling_spark.pipeline.text import c4_quality_filter

    s = "this line has enough words to pass the filter."
    docs = [
        # 3 good sentences + a short line + unpunctuated + javascript
        (1, f"{s}\nmore words ride along in this second line!\n"
            f"and a third full sentence closes the page?\ntoo short.\n"
            f"no terminal punctuation here at all\n"
            f"please enable javascript to view this page."),
        (2, f"{s}\n{s}\n{s}\nlorem ipsum dolor sit amet."),   # page drop
        (3, f"{s}\n{s}\n{s}\nvar x = {{ a: 1 }};"),           # brace drop
        (4, f"{s}\nonly two sentences in this whole page!"),  # <3 sentences
        (5, f'he said "stop right there and wait"\n{s}\n{s}\n{s}'),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = {
        r.doc_id: r for r in c4_quality_filter(df, "text", "doc_id").collect()
    }
    r1 = rows[1]
    assert r1.keep and r1.n_lines == 6 and r1.n_kept_lines == 3
    assert r1.n_sentences == 3
    assert "javascript" not in r1.clean_text
    assert "too short." not in r1.clean_text
    assert not rows[2].keep and rows[2].has_lorem
    assert not rows[3].keep and rows[3].has_brace
    assert not rows[4].keep and rows[4].n_sentences == 2
    # a quoted line (terminal ") is kept but adds no sentence mark
    r5 = rows[5]
    assert r5.n_kept_lines == 4 and r5.n_sentences == 3 and r5.keep


def test_rrf_fuse_exact_contributions(spark):
    from squirreling_spark.pipeline.retrieval import RRF_SCALE, rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "id bigint, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "id bigint, rank int"
    )
    rows = {
        r.id: r
        for r in rrf_fuse({"a": a, "b": b}, "id", k=60, topk=10).collect()
    }
    c = lambda r: RRF_SCALE // (60 + r)
    # doc 10: rank 1 in a, 2 in b; doc 20: 2 and 1 -> exact tie
    assert rows[10].rrf_score == c(1) + c(2) == rows[20].rrf_score
    assert rows[10].n_systems == 2 and rows[40].n_systems == 1
    assert rows[30].rrf_score == c(3)  # missing from b contributes 0
    # tie broken by id: 10 before 20; singles ranked after the pair
    assert rows[10].fused_rank == 1 and rows[20].fused_rank == 2
    assert rows[30].fused_rank == 3 and rows[40].fused_rank == 4
    assert rows[10].rank_a == 1 and rows[10].rank_b == 2
    assert rows[30].rank_b is None


def test_html_main_content_rules(spark):
    from squirreling_spark.pipeline.text import html_main_content

    html = (
        "<html>\n<head><style>p { color: red }</style>"
        "<script>var tracker = 1;</script></head>\n"
        '<body>\n<nav><a href="/">home</a> '
        '<a href="/about">about us page</a></nav>\n'
        "<p>real content words here &amp; more</p>\n"
        "<p>second paragraph of visible text &#39;quoted&#39;</p>\n"
        "<p>double-encoded &amp;lt; stays as entity text</p>\n"
        '<footer><a href="/contact">contact</a></footer>\n'
        "</body>\n</html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    r = html_main_content(df, "html", "doc_id").collect()[0]
    assert r.n_script_blocks == 1 and r.n_style_blocks == 1
    assert r.n_link_dropped == 2  # nav + footer
    assert "tracker" not in r.clean_text  # script never leaks
    assert "color" not in r.clean_text    # style never leaks
    lines = r.clean_text.split("\n")
    assert lines[0] == "real content words here & more"
    assert lines[1] == "second paragraph of visible text 'quoted'"
    # &amp; decodes LAST: &amp;lt; -> literal &lt;, never <
    assert lines[2] == "double-encoded &lt; stays as entity text"
    # multi-line script block is removed wholesale
    df2 = spark.createDataFrame(
        [(2, "<script>\nline1\nline2\n</script>\n<p>kept text stays.</p>")],
        "doc_id bigint, html string",
    )
    r2 = html_main_content(df2, "html", "doc_id").collect()[0]
    assert r2.clean_text == "kept text stays."


def test_epoch_schedule_caps_upweighted_small_source(spark):
    from squirreling_spark.pipeline.corpus import epoch_schedule

    # big source: 9 docs x 100 tokens; small: 1 doc x 100 tokens.
    docs = [(i, "w " * 99 + "w", "big") for i in range(9)]
    docs.append((9, "w " * 99 + "w", "small"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    rows = {
        r.source: r
        for r in epoch_schedule(df, "text", "source").collect()
    }
    big, small = rows["big"], rows["small"]
    assert big.tokens == 900 and small.tokens == 100
    # sqrt weights: 30 vs 10 -> w_ppm 750000 / 250000
    assert big.w_ppm == 750_000 and small.w_ppm == 250_000
    # small gets 250k ppm of 1000 tokens = 250 tokens = 2.5 epochs -> cap
    assert small.capped and small.epochs_ppm == 1_000_000
    assert small.final_tokens == 100
    # big: 750 tokens over 900 = 5/6 epoch, uncapped
    assert not big.capped and big.epochs_ppm == 833_333
    assert big.final_tokens == 750


def test_markdown_sections_structure(spark):
    from squirreling_spark.pipeline.text import markdown_sections

    md = (
        "intro line one\nintro line two\n# First Section\nbody a\nbody b\n"
        "## Sub Section\nbody c\n### Deep\n# Empty Head"
    )
    df = spark.createDataFrame(
        [(1, md), (2, "no headings at all\njust text")],
        "doc_id bigint, text string",
    )
    rows = {
        (r.doc_id, r.sec_idx): r
        for r in markdown_sections(df, "text", "doc_id").collect()
    }
    pre = rows[(1, 0)]  # preamble: level 0, no heading, 2 lines
    assert pre.level == 0 and pre.heading == "" and pre.n_lines == 2
    s1 = rows[(1, 1)]
    assert s1.level == 1 and s1.heading == "First Section"
    assert s1.n_lines == 2 and s1.n_words == 4
    assert rows[(1, 2)].level == 2 and rows[(1, 2)].heading == "Sub Section"
    deep = rows[(1, 3)]  # heading with empty body
    assert deep.level == 3 and deep.n_lines == 0 and deep.n_words == 0
    assert rows[(1, 4)].heading == "Empty Head"
    # headingless doc = one preamble section
    assert len([k for k in rows if k[0] == 2]) == 1
    assert rows[(2, 0)].level == 0 and rows[(2, 0)].n_words == 6


def test_sample_per_group_balanced_and_append_stable(spark):
    from squirreling_spark.pipeline.corpus import sample_per_group

    docs = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(docs, "doc_id bigint, source string")
    out = sample_per_group(df, "doc_id", "source", k=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 5 for v in by_src.values())
    # append-stability: adding NEW docs never evicts differently than
    # the md5 order dictates — ranks of surviving originals only shift
    # if a new doc's key sorts ahead of them
    df2 = spark.createDataFrame(
        docs + [(1000 + i, f"s{i % 3}") for i in range(6)],
        "doc_id bigint, source string",
    )
    out2 = {
        (r.source, r.doc_id)
        for r in sample_per_group(df2, "doc_id", "source", k=5).collect()
    }
    kept_before = {(r.source, r.doc_id) for r in out}
    # every original row that still ranks <= 5 keeps its membership;
    # overlap must be large (6 new docs can displace at most 6 slots)
    assert len(kept_before & out2) >= 15 - 6
    # partition-layout invariance
    out3 = {
        (r.source, r.doc_id)
        for r in sample_per_group(
            df.repartition(7), "doc_id", "source", k=5
        ).collect()
    }
    assert out3 == kept_before


def test_source_drift_tv_detects_divergent_source(spark):
    from squirreling_spark.pipeline.corpus import source_drift_tv

    # two sources sharing one token distribution, one wildly different
    docs = (
        [(i, "alpha beta gamma delta", "a") for i in range(10)]
        + [(10 + i, "alpha beta gamma delta", "b") for i in range(10)]
        + [(20 + i, "zzz zzz zzz zzz", "weird") for i in range(5)]
    )
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    rows = {
        r.source: r
        for r in source_drift_tv(df, "text", "source").collect()
    }
    # the divergent source is far more drifted than the matched pair
    assert rows["weird"].tv_ppm > rows["a"].tv_ppm
    assert rows["weird"].tv_ppm > rows["b"].tv_ppm
    assert rows["a"].tv_ppm == rows["b"].tv_ppm  # identical dists
    assert rows["weird"].top_token == "zzz"
    assert rows["weird"].vocab_in_source == 1
    assert rows["a"].n_tokens == 40
    # TV is bounded by 1.0 (1e6 ppm, up to quantization slack)
    assert all(0 <= r.tv_ppm <= 1_000_001 for r in rows.values())
