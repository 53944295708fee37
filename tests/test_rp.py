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
