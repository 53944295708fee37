"""Scale probe: replicate sf0.1 10× (≈ sf1: 6M lineitem rows, 50k docs)
and measure the headline operators to verify near-linear scaling. Writes
the replicated data to /tmp (never touches /root/testdata) and prints a
table of sf0.1 vs sf1 timings with the scaling factor.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from squirreling_spark import inventory
from squirreling_spark.session import get_spark
from squirreling_spark.qutil import events_with_ts

inventory.load_all()

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sq_scale_sf1"
FACTOR = 10

KEY_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
COPY = ["region", "nation", "supplier", "part"]

QUERIES = [
    "hash_agg_q1",
    "join_inner",
    "topk",
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_digest",
    "knn_bruteforce",
    "knn_ivf",
    "dedup_embedding_lsh",
    "positional_join",
    "events_sessionize",
    "range_join_events",
    "sessions_overlap",
    "dedup_clusters",
    "kmeans_embeddings",
    "table_profile_orders",
    "ngram_lm_score",
    "embedding_outliers",
    # round-3 operators (r3 judge task 4)
    "pagerank_docs",
    "knn_ivf_trained",
    "binary_header_parse",
    # round-4 operators
    "quality_classifier",
    "dedup_bloom_incremental",
    "knn_pq_adc",
    "knn_ivfpq",
    "audio_pcm_decode",
    "video_mp4_meta",
    "image_pixel_decode",
    "cms_top_terms",
    "dataset_shards",
    "temperature_mix",
    "corpus_pipeline",
    "q8_market_share",
    "q21_waiting_supplier",
    # round-5: the r4 verdict's unprobed heavy operators (task 7)
    "dedup_substrings",
    "semdedup",
    # round-5 additions
    "spatial_join",
    "url_canonicalize",
    "dedup_minhash_stream",
    # round-6 additions
    "doc_chunking",
    "zorder_layout_orders",
    "image_dhash_neardup",
    # round-6 continuation
    "dedup_embedding_cosine",
    "events_session_stream",
    "events_stream_join",
    "bpe_train_merges",
    "bpe_subword_freqs",
    "embedding_rp_project",
    "knn_rp_prefilter",
    "video_frame_plan",
    "image_resize_plan",
    # round-6 fourth session
    "bm25_rank",
    "text_nfc_normalize",
    "bpe_encode_docs",
    "dedup_stream_exact",
    "decontaminate_neardup",
    "salted_agg_skew",
    "salted_join_brand",
    "web_host_stats",
    "domain_reweight",
    "dsir_sample",
]


def _cc_distributed(spark, sf_dir):
    """dedup_clusters with the DISTRIBUTED connected-components arm forced
    (driver_threshold=0): same LSH pairs, pointer-jumping min-label
    propagation instead of the driver union-find — the arm a >5M-edge
    collision graph would take at 100 TB."""
    from squirreling_spark.pipeline.dedup import (
        connected_components,
        minhash_lsh_candidates,
    )
    from squirreling_spark.qutil import t as _t

    pairs = minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), "text", "doc_id", 32, 8, 3
    )
    return connected_components(pairs, "id_a", "id_b", driver_threshold=0)


# name -> callable probes that aren't a plain inventory query
EXTRA = {"dedup_clusters_distarm": _cc_distributed}

# Row-group-normalized baseline: sf0.1 rewritten as multi-row-group files
# so the "1-task scan" layout effect is separated from real scaling
# (r3: hash_agg_q1 5.2x and dedup_simhash 4.8x were suspected layout).
MRG_DST = "/tmp/sq_sf01_mrg"
MRG_QUERIES = ["hash_agg_q1", "dedup_simhash", "text_quality", "group_having"]


def replicate(spark):
    import os

    if os.path.exists(f"{DST}/_done"):
        return
    for name in COPY:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
    for name, keys in KEY_OFFSETS.items():
        df = (
            events_with_ts(spark, SRC)
            if name == "events"
            else spark.read.parquet(f"{SRC}/{name}.parquet")
        )
        n_max = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        rep = df.crossJoin(spark.range(FACTOR).withColumnRenamed("id", "__rep"))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__rep") * n_max[k])
        rep = rep.drop("__rep")
        if name == "events":
            # keep the source's long-nanos encoding so events_with_ts
            # reads replicated data identically
            rep = rep.withColumn("ts", F.unix_micros("ts") * 1000)
        rep.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
    open(f"{DST}/_done", "w").write("ok")


def write_mrg(spark):
    """Rewrite sf0.1 as 16-partition (multi-row-group) parquet."""
    import os

    if os.path.exists(f"{MRG_DST}/_done"):
        return
    for name in set(COPY) | set(KEY_OFFSETS):
        df = (
            events_with_ts(spark, SRC)
            if name == "events"
            else spark.read.parquet(f"{SRC}/{name}.parquet")
        )
        if name == "events":
            df = df.withColumn("ts", F.unix_micros("ts") * 1000)
        df.repartition(16).write.mode("overwrite").parquet(
            f"{MRG_DST}/{name}.parquet"
        )
    open(f"{MRG_DST}/_done", "w").write("ok")


def time_query(name, sf_dir):
    fn = EXTRA.get(name) or inventory.QUERIES[name]
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(get_spark("scale-probe"), sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    spark = get_spark("scale-probe")
    replicate(spark)
    write_mrg(spark)
    names = QUERIES + list(EXTRA)
    if len(sys.argv) > 1:  # probe a subset: scale_probe.py q1 q2 ...
        names = [n for n in names if n in sys.argv[1:]]
    print(f"{'query':26s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
    for name in names:
        t_small = time_query(name, SRC)
        t_big = time_query(name, DST)
        print(
            f"{name:26s} {t_small:8.2f} {t_big:8.2f} {t_big / max(t_small, 1e-9):6.1f}"
        )
    # layout-normalized rerun: same data volume, multi-row-group files
    print(f"\n{'query':26s} {'sf0.1mrg':>8s} {'sf1':>8s} {'ratio':>6s}"
          "   (scan-layout normalized)")
    for name in MRG_QUERIES:
        if len(sys.argv) > 1 and name not in sys.argv[1:]:
            continue
        t_small = time_query(name, MRG_DST)
        t_big = time_query(name, DST)
        print(
            f"{name:26s} {t_small:8.2f} {t_big:8.2f} {t_big / max(t_small, 1e-9):6.1f}"
        )


if __name__ == "__main__":
    main()
