"""Behavioral tests for round-4 dedup operators: planted duplicates must
be FOUND (the hash-parity gate proves engine agreement, not detection
quality — same instinct as the ANN recall floor in test_ann_recall.py)."""

import random

from pyspark.sql import functions as F

from squirreling_spark.pipeline.dedup import substring_dup_profile
from squirreling_spark.pipeline.similarity import semdedup


def test_substring_dup_profile_finds_planted_span(spark):
    rng = random.Random(7)
    words = [f"w{i}" for i in range(500)]
    boiler = " ".join(rng.choices(words, k=24))  # 24-token shared span
    docs = []
    for i in range(20):
        body = " ".join(rng.choices(words, k=80))
        # plant the span in docs 0-4 only
        text = f"{boiler} {body}" if i < 5 else body
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in substring_dup_profile(df, "text", "doc_id").collect()}
    # every planted doc shares >= 24-16+1 = 9 windows with its siblings
    for i in range(5):
        assert out[i]["n_dup_windows"] >= 9, (i, out[i])
        assert out[i]["dup_frac"] > 0
    # clean docs of random words share no 16-token window
    for i in range(5, 20):
        assert out[i]["n_dup_windows"] == 0, (i, out[i])


def test_substring_dup_profile_short_doc_whole_window(spark):
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "different doc")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in substring_dup_profile(df, "text", "doc_id").collect()}
    assert out[1]["n_windows"] == 1 and out[1]["n_dup_windows"] == 1
    assert out[2]["dup_frac"] == 1.0
    assert out[3]["n_dup_windows"] == 0


def _vec(rng, dim=8):
    return [rng.uniform(-1, 1) for _ in range(dim)]


def test_semdedup_marks_planted_near_dups(spark):
    rng = random.Random(3)
    base = [_vec(rng) for _ in range(10)]
    rows = []
    vid = 0
    for v in base:
        rows.append((vid, v)); vid += 1
    # planted near-copies (tiny perturbation -> cosine ~ 1)
    for j in range(5):
        pert = [x + rng.uniform(-1e-4, 1e-4) for x in base[j]]
        rows.append((vid, pert)); vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semdedup(
            df, "embedding", "vec_id", threshold=0.999, cent_mod=100
        ).collect()
    }
    # every planted copy (higher id than its original) is marked dup
    for vid in range(10, 15):
        assert out[vid]["is_dup"], out[vid]
        assert out[vid]["n_close"] >= 1
    # originals are keep-first: never marked dup by their later copies
    for vid in range(10):
        assert not out[vid]["is_dup"], out[vid]


def test_semdedup_cluster_blocked_plan(spark):
    rng = random.Random(5)
    df = spark.createDataFrame(
        [(i, _vec(rng)) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    plan = (
        semdedup(df, "embedding", "vec_id", cent_mod=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the O(n^2)-risk pairwise step must be an equi-join on the cell key;
    # an unpartitioned cartesian over the corpus would show up as
    # CartesianProduct (the only BroadcastNestedLoopJoins allowed are the
    # corpus x BROADCAST-centroids assignment, bounded by centroid count)
    assert "CartesianProduct" not in plan
    assert "Join [cell" in plan or "SortMergeJoin [cell" in plan or (
        "ShuffledHashJoin [cell" in plan
    ), plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight" in line  # centroid side broadcast, bounded
