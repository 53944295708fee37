"""Random-projection (JL) operator: distance preservation, plan shape,
and the float32-cast gotcha that produced 6th-decimal oracle flips."""

import math

import numpy as np
from pyspark.sql import functions as F

from squirreling_spark.pipeline.rp import project_embeddings


def test_rp_preserves_pairwise_distance_on_average(spark, sf001):
    e = spark.read.parquet(f"{sf001}/embeddings.parquet")
    rows = project_embeddings(e).join(e, "vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    P = np.array([r["proj"] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(7)
    idx = rng.choice(len(rows), size=(200, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    do = np.linalg.norm(X[idx[:, 0]] - X[idx[:, 1]], axis=1)
    dp = np.linalg.norm(P[idx[:, 0]] - P[idx[:, 1]], axis=1)
    ratio = dp / do
    # JL with d_out=16 and ±1 signs: unbiased in expectation, ~1/sqrt(16)
    # per-pair spread. Mean ratio near 1, every pair within wide bounds.
    assert 0.85 < ratio.mean() < 1.15
    assert (ratio > 0.3).all() and (ratio < 1.9).all()


def test_rp_plan_is_single_stage_no_shuffle(spark, sf001):
    e = spark.read.parquet(f"{sf001}/embeddings.parquet")
    plan = (
        project_embeddings(e)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # row-local: projects at scan bandwidth


def test_rp_matches_sequential_fold_bitwise(spark, sf001):
    """The projection must be the exact sequential IEEE fold (the oracle
    replays the same formula; both must produce identical doubles)."""
    e = spark.read.parquet(f"{sf001}/embeddings.parquet").limit(5)
    rows = project_embeddings(e).join(e, "vec_id").collect()
    MUL, MOD = 2654435761, 1000003
    for r in rows:
        x = [float(v) for v in r["embedding"]]
        for k in range(16):
            acc = 0.0
            for j in range(1, 65):
                s = 1.0 if ((j * (k + 7) * MUL) % MOD) % 2 == 0 else -1.0
                acc = acc + x[j - 1] * s
            want = acc / math.sqrt(16)
            assert r["proj"][k] == want  # bit-identical, not approx


def test_rp_prefilter_recall_vs_exact(spark, sf001):
    """JL's actual quality contract: STRONG similarities survive the
    projection (distortion is small relative to a near-dup's distance),
    while near-orthogonal noise pairs — sims ~0.1-0.2 with tiny gaps,
    this fixture's bulk — may shuffle under 4x compression. So: every
    exact neighbor with sim >= 0.4 must be recalled; overall recall@5
    must comfortably beat the random-candidate floor (50/500 = 0.1)."""
    from squirreling_spark import inventory

    inventory.load_all()
    exact = inventory.QUERIES["knn_bruteforce"](spark, sf001).collect()
    approx = inventory.QUERIES["knn_rp_prefilter"](spark, sf001).collect()
    want = {(r["q_id"], r["vec_id"]) for r in exact}
    got = {(r["q_id"], r["vec_id"]) for r in approx}
    assert len(want) == 50 and len(got) == 50
    recall = len(want & got) / len(want)
    assert recall >= 0.3, f"recall@5 {recall}"


def test_rp_projection_keeps_strong_neighbors(spark):
    """JL preserves STRONG similarity: a planted near-duplicate must stay
    its seed's top projected neighbor (distortion is small relative to a
    near-dup's distance), even when noise-pair ordering shuffles."""
    rng = np.random.RandomState(3)
    X = rng.randn(100, 64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    for i in range(5):  # ids 100..104 near-duplicate ids 0..4
        X = np.vstack([X, X[i] + 0.05 * rng.randn(64)])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        ["vec_id", "embedding"],
    )
    P = {
        r["vec_id"]: np.array(r["proj"])
        for r in project_embeddings(df).collect()
    }
    for i in range(5):
        p = P[i]
        sims = {
            j: float(p @ P[j] / (np.linalg.norm(p) * np.linalg.norm(P[j])))
            for j in P
            if j != i
        }
        assert max(sims, key=sims.get) == 100 + i
