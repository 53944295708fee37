"""Hot-bucket guard (pipeline/dedup.cap_hot_buckets): one degenerate LSH
band key (empty/boilerplate docs, uniform images) must not make a single
reducer's candidate output quadratic. Planted-degenerate tests prove the
bound; identical-results tests prove normal data is untouched.
"""
import pytest

from pyspark.sql import functions as F

import squirreling_spark.pipeline.dedup as dedup
from squirreling_spark.pipeline.dedup import (
    cap_hot_buckets,
    decontaminate_neardup,
    minhash_lsh_candidates,
)
from squirreling_spark.pipeline.multimodal import dhash_near_dup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_degenerate_bucket_output_is_bounded(spark):
    # 40 byte-identical docs: every band of every doc lands in ONE bucket.
    # Uncapped candidates would be C(40,2)=780; with cap=10 the bucket
    # splits into 4 contiguous chunks -> at most 4*C(10,2)=180 pairs.
    n, cap = 40, 10
    df = _docs(spark, ["the same boilerplate line repeated here"] * n)
    pairs = minhash_lsh_candidates(
        df, "text", "doc_id", num_hashes=8, bands=2, bucket_cap=cap
    ).count()
    assert pairs <= (n // cap) * cap * (cap - 1) // 2
    assert pairs > 0  # within-chunk dups are still found


def test_cap_leaves_normal_data_unchanged(spark):
    texts = [f"document number {i} with its own words {i * 7}" for i in range(20)]
    texts += ["a shared near duplicate sentence body x", "a shared near duplicate sentence body y"]
    df = _docs(spark, texts)
    capped = {
        tuple(r)
        for r in minhash_lsh_candidates(
            df, "text", "doc_id", num_hashes=8, bands=2, bucket_cap=2000
        ).collect()
    }
    uncapped = {
        tuple(r)
        for r in minhash_lsh_candidates(
            df, "text", "doc_id", num_hashes=8, bands=2, bucket_cap=10**9
        ).collect()
    }
    assert capped == uncapped


def test_cap_hot_buckets_sub_assignment(spark):
    rows = [(i, 0, "k") for i in range(25)] + [(100 + i, 1, "other") for i in range(3)]
    banded = spark.createDataFrame(
        rows, "id bigint, band_idx int, band_key string"
    )
    out = cap_hot_buckets(banded, "id", cap=10).collect()
    hot = sorted((r.id, r._sub) for r in out if r.band_key == "k")
    # contiguous rank chunks of 10: ids 0-9 -> 0, 10-19 -> 1, 20-24 -> 2
    assert [s for _, s in hot] == [0] * 10 + [1] * 10 + [2] * 5
    cold = {r._sub for r in out if r.band_key == "other"}
    assert cold == {0}


def test_dhash_degenerate_band_bounded(spark):
    # 30 images whose four 16-bit bands are all zero (uniform rasters):
    # one bucket per band. cap=5 -> chunks of 5, pairs <= 6*C(5,2)=60
    # (not C(30,2)=435). Hamming between identical hashes is 0, so every
    # candidate survives the verify - the bound is the candidate count.
    n, cap = 30, 5
    hashes = spark.createDataFrame(
        [(i, 0, 0, 0, 0) for i in range(n)],
        "media_id bigint, b0 int, b1 int, b2 int, b3 int",
    )
    pairs = dhash_near_dup(hashes, bucket_cap=cap, collapse=False).count()
    assert 0 < pairs <= (n // cap) * cap * (cap - 1) // 2
    # the collapsed DEFAULT removes the degenerate bucket entirely: all 30
    # identical hashes fold into one group, so there are no edges at all
    assert dhash_near_dup(hashes, bucket_cap=cap).count() == 0


def test_decontaminate_bench_bucket_capped(spark, monkeypatch):
    # 12 identical benchmark extracts against 4 matching corpus docs:
    # with the bench-side cap at 3 members per bucket, each corpus doc
    # can only pair with <=3 bench ids per band key - but the rollup
    # still flags every leaking corpus doc (recall via representatives).
    monkeypatch.setattr(dedup, "DEFAULT_BUCKET_CAP", 3)
    text = "alpha beta gamma delta epsilon zeta eta theta " * 5
    corpus = spark.createDataFrame(
        [(i, text) for i in range(4)] + [(9, "completely different words entirely")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(i, text) for i in range(12)], "bench_id bigint, text string"
    )
    out = decontaminate_neardup(
        corpus, bench, "text", "doc_id", num_hashes=8, bands=2
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}  # every leaking doc flagged
    # cap bounds how many bench ids each doc can have matched
    assert all(r.n_bench_matches <= 3 for r in rows.values())


def test_minhash_collapsed_groups(spark):
    # r8: exact-dup members collapse to one representative; near-dup
    # DISTINCT texts still pair, carrying exact-dup group sizes
    from squirreling_spark.pipeline.dedup import (
        minhash_lsh_group_candidates,
    )

    # DISTINCT words: periodic text collapses the shingle set to ~8
    # distinct shingles and LSH recall dies deterministically (the r6
    # short-doc gotcha); 40 unique tokens -> 38 distinct shingles
    base = " ".join(f"word{i}" for i in range(40))
    rows = (
        [(i, base) for i in range(10)]          # 10 exact dups -> rep 0
        + [(20, base + " omega")]               # near-dup of the group
        + [(30, "entirely different words with nothing shared here")]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    edges = {
        (r.id_a, r.id_b): (r.n_a, r.n_b)
        for r in minhash_lsh_group_candidates(
            df, "text", "doc_id"
        ).collect()
    }
    assert edges == {(0, 20): (10, 1)}
