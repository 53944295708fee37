"""Round-12 fixes: exact checkpoint attribution (r11 advice, medium),
qsketch |v| range enforcement + value_scale fixed-point contract, CMS
parameter validation / φ-threshold floor, and the shared lineage
truncation helper honoring the reliable-checkpoint knob."""

import pathlib

import pytest
from pyspark.sql import functions as F

from squirreling_spark.pipeline import ckpt as ckpt_mod
from squirreling_spark.pipeline.ckpt import truncate_lineage
from squirreling_spark.pipeline.sketch import (
    cms_build,
    cms_top_terms,
    qsketch_build,
    qsketch_oracle_sql,
    qsketch_quantiles,
)


# --------------------------------------------------------------- ckpt ----


def test_ckpt_attribution_never_claims_foreign_checkpoints(spark, tmp_path):
    """r11 advice (medium): supersede eviction must attribute by the
    checkpointed RDD's OWN checkpoint file, never by a directory-listing
    diff — a checkpoint written by another query between two listings
    must survive arbitrarily many superseding generations."""
    ck = str(tmp_path / "ck")
    spark.sparkContext.setCheckpointDir(ck)
    foreign = spark.range(5).checkpoint(eager=True)

    reg: dict = {}
    for i in range(5):
        out = truncate_lineage(
            spark.range(10 + i), checkpoint_dir=ck, supersede=reg
        )
        assert out.count() == 10 + i
    # eviction ran (at most 2 generations retained)...
    assert len(reg["gens"]) == 2
    # ...but the foreign checkpoint was never claimed or deleted
    assert foreign.count() == 5
    recorded = [p for gen in reg["gens"] for p in gen]
    assert all("rdd-" in p for p in recorded)


def test_ckpt_probe_soft_fail_leaves_checkpoints_intact(
    spark, tmp_path, monkeypatch
):
    """r11 verdict task 3: when the py4j capability probe fails (API
    drift), cleanup is skipped — every generation's checkpoint dir stays
    on disk and iterative results are unaffected."""
    from squirreling_spark.pipeline.graph import label_propagation

    monkeypatch.setattr(ckpt_mod, "_ckpt_file", lambda out: None)
    ck = str(tmp_path / "ck")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
        "id_a long, id_b long",
    )
    out = label_propagation(edges, iters=6, checkpoint_dir=ck)
    assert out.count() == 6
    # no eviction happened: one dir per checkpoint call (und + 6 rounds),
    # strictly more than the bounded-growth test's <= 3
    rdd_dirs = list(pathlib.Path(ck).glob("*/rdd-*"))
    assert len(rdd_dirs) >= 6, rdd_dirs
    # labels still the two triangles' minima
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_truncate_lineage_reliable_knob_and_local_fallback(spark, tmp_path):
    """The shared helper (r11 advice: sketch intermediates must honor
    the reliable-checkpoint knob): with a dir, blocks land under it;
    without, localCheckpoint fallback — both preserve values."""
    df = spark.range(7).selectExpr("id", "id * id AS sq")
    local = truncate_lineage(df)
    assert local.agg(F.sum("sq")).first()[0] == 91
    ck = str(tmp_path / "ck")
    reliable = truncate_lineage(df, checkpoint_dir=ck)
    assert reliable.agg(F.sum("sq")).first()[0] == 91
    assert list(pathlib.Path(ck).glob("*/rdd-*"))


def test_connected_components_reliable_checkpoints_bounded(spark, tmp_path):
    """connected_components now honors the reliable-checkpoint knob
    (same contract as LPA): per-round label generations land under the
    dir, superseded generations are evicted (bounded disk for deep
    iterations), und outlives every round, and the labels are exact."""
    import pathlib

    from squirreling_spark.pipeline.dedup import connected_components

    ck = str(tmp_path / "ck")
    # a path graph forces several pointer-jumping rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)] + [(20, 21)],
        "id_a long, id_b long",
    )
    out = connected_components(
        edges, driver_threshold=0, checkpoint_dir=ck
    )
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got == {**{i: 1 for i in range(1, 10)}, 20: 20, 21: 20}
    rdd_dirs = list(pathlib.Path(ck).glob("*/rdd-*"))
    # und + at most 2 label generations survive
    assert 1 <= len(rdd_dirs) <= 3, rdd_dirs
    # local fallback still works and agrees
    out2 = connected_components(edges, driver_threshold=0)
    assert {r["node"]: r["label"] for r in out2.collect()} == got


# ------------------------------------------------------------- qsketch ----


def test_qsketch_range_contract_enforced(spark):
    """r11 advice: |v| < 2^62 is enforced, not advisory — -2^63 (abs
    overflow) and 2^62 both raise instead of silently mis-bucketing."""
    for bad in (-(1 << 63), 1 << 62, -(1 << 62)):
        df = spark.createDataFrame([(bad,), (1,)], "v long")
        sk = qsketch_build(df, "v", b=4)
        with pytest.raises(Exception, match="2\\^62"):
            sk.collect()
    # boundary-legal values still sketch fine
    ok = spark.createDataFrame([((1 << 62) - 1,), (-(1 << 62) + 1,)], "v long")
    assert qsketch_build(ok, "v", b=4).count() == 2


def test_qsketch_value_scale_fixed_point_bounds(spark):
    """r11 verdict task 5: value_scale is a first-class DOUBLE contract —
    bounds are in the scaled domain and contain the scaled exact
    quantile; scaling by 10x scales the reported bounds consistently."""
    import duckdb

    vals = [0.001, 0.5, 1.25, 2.75, 3.0, 10.5, 99.99, 1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {}
    for scale in (1000, 10000):
        sk = qsketch_build(df, "x", b=4, value_scale=scale)
        q = qsketch_quantiles(sk, quantiles=((50, 100),), b=4)
        r = q.first()
        # exact p50 (lower-rank convention, ceil(0.5*8)=4th smallest) is
        # 2.75 -> floor(2.75*scale) must lie within the scaled bounds
        exact = int(2.75 * scale)
        assert r["q_lo"] <= exact <= r["q_hi"], (scale, r)
        # bucket relative width stays <= 2^-b in ANY scaled domain
        # (bucket boundaries are log-spaced, so they do NOT scale
        # linearly between scales — containment + width IS the contract)
        assert (r["q_hi"] - r["q_lo"]) <= max(1, exact >> 4), (scale, r)
        rows[scale] = r
    # and the DuckDB oracle replays the scaled sketch value-for-value
    con = duckdb.connect()
    con.execute("CREATE TABLE tbl AS SELECT * FROM (VALUES "
                + ",".join(f"('g', {v})" for v in vals) + ") t(g, x)")
    sql = qsketch_oracle_sql(
        "tbl", "x", "g", b=4, quantiles=((50, 100),), value_scale=1000
    )
    got = con.execute(sql).fetchone()
    sp = qsketch_quantiles(
        qsketch_build(
            df.select(F.lit("g").alias("g"), "x"),
            "x", b=4, group_cols=("g",), value_scale=1000,
        ),
        quantiles=((50, 100),), b=4, group_cols=("g",),
    ).first()
    assert (got[2], got[3], got[4], got[5]) == (
        sp["n_total"], sp["q_lo"], sp["q_hi"], sp["q_est"]
    )


def test_qsketch_value_scale_validation():
    with pytest.raises(ValueError, match="value_scale"):
        qsketch_oracle_sql("t", "x", "g", value_scale=0)
    with pytest.raises(ValueError, match="value_scale"):
        qsketch_oracle_sql("t", "x", "g", value_scale=1.5)


def test_qsketch_cdf_bounds_contain_truth(spark):
    """qsketch_cdf: for every probe, the true fraction of values <= probe
    lies within [cdf_lo_ppm, cdf_hi_ppm] (integer ppm, floor), per
    group; and the DuckDB oracle builder replays both bounds exactly."""
    import duckdb

    from squirreling_spark.pipeline.sketch import (
        qsketch_cdf,
        qsketch_cdf_oracle_sql,
    )

    vals = {
        "a": [1, 2, 3, 17, 40, 41, 999, 1000, 65537],
        "b": [5] * 10 + [100] * 5 + [10**7],
    }
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    probes = (3, 40, 100, 10**6)
    sk = qsketch_build(df, "v", b=4, group_cols=("g",))
    got = {
        (r["g"], r["probe"]): (r["n_total"], r["cdf_lo_ppm"], r["cdf_hi_ppm"])
        for r in qsketch_cdf(sk, probes, b=4, group_cols=("g",)).collect()
    }
    for g, vs in vals.items():
        for pr in probes:
            n, lo, hi = got[(g, pr)]
            assert n == len(vs)
            truth = sum(1 for v in vs if v <= pr) * 1000000 // n
            assert lo <= truth <= hi, (g, pr, lo, truth, hi)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tbl AS SELECT * FROM (VALUES "
        + ",".join(f"('{g}', {v})" for g, v in rows)
        + ") t(g, v)"
    )
    oracle = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            qsketch_cdf_oracle_sql("tbl", "v", "g", probes, b=4)
        ).fetchall()
    }
    assert oracle == got


# ----------------------------------------------------------------- cms ----


def test_cms_depth_validation_and_depth_one(spark):
    """r11 advice: depth is validated (no crash-by-F.least) and depth=1
    is a legal single-hash-row sketch."""
    docs = spark.createDataFrame(
        [("a b b c c c",)] * 3, "text string"
    )
    with pytest.raises(ValueError, match="depth"):
        cms_build(docs, "text", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_build(docs, "text", width=0)
    top = cms_top_terms(docs, "text", k=2, width=64, depth=1).collect()
    # single hash row still one-sided: est >= true
    got = {r["term"]: r["cms_count"] for r in top}
    assert got["c"] >= 9 and got["b"] >= 6


def test_hll_pairwise_overlap_guard_and_algebra(spark):
    """r11 verdict task 2: the shared overlap helper enforces its O(S²)
    envelope (max_groups probe raises BEFORE a quadratic plan is built)
    and reproduces the register-algebra identity |A∪A'| where A' ⊆ A
    implies est_union == est_a."""
    from squirreling_spark.pipeline.sketch import (
        hll_pairwise_overlap,
        hll_registers,
    )

    rows = [("a", i) for i in range(50)] + [("b", i) for i in range(25)]
    df = spark.createDataFrame(rows, "g string, k long")
    regs = hll_registers(df, "k", p=6, group_cols=("g",))
    groups = df.select("g").distinct()
    with pytest.raises(ValueError, match="max_groups"):
        hll_pairwise_overlap(
            regs, groups, "g", "ga", "gb", p=6, max_groups=1
        )
    out = hll_pairwise_overlap(regs, groups, "g", "ga", "gb", p=6).first()
    # b's keys are a subset of a's: union registers == a's registers
    assert out["est_union"] == out["est_a"]
    assert out["est_overlap"] == out["est_b"]


def test_cms_phi_threshold_floors_at_one(spark):
    """r11 advice: with n_total < 1/φ the threshold floors to 1 (not 0)
    — present terms all clear est >= 1 so results are unchanged, and the
    degenerate pass-everything predicate never appears in the plan."""
    docs = spark.createDataFrame([("x y z",)], "text string")
    df = cms_top_terms(docs, "text", k=3, width=64, depth=3)
    assert {r["term"] for r in df.collect()} == {"x", "y", "z"}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "greatest(1" in plan
