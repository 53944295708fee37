"""Unit tests for the round-8 batch-4 operators: SymSpell fuzzy join,
SCD-2 interval build, session pattern matching, systematic weighted
sampling, and the by-keyed range join."""

from pyspark.sql import functions as F

from squirreling_spark.operators.fuzzy_join import (
    deletion_variants,
    fuzzy_self_join_ed1,
)
from squirreling_spark.operators.funnel import session_pattern_match
from squirreling_spark.operators.range_join import range_join
from squirreling_spark.operators.scd import status_intervals
from squirreling_spark.pipeline.sample import systematic_weighted_sample


# ---------------------------------------------------------------- fuzzy join

def test_deletion_variants_members(spark):
    got = (
        spark.range(1)
        .select(deletion_variants(F.lit("abc")).alias("v"))
        .head()[0]
    )
    assert set(got) == {"abc", "bc", "ac", "ab"}


def test_fuzzy_ed1_all_edit_kinds(spark):
    # substitution (abc~abd), deletion/insertion (abc~ab, abc~abcd),
    # identical strings on distinct keys (ed 0), and a far pair (xyz)
    df = spark.createDataFrame(
        [
            (1, "abc"),
            (2, "abd"),   # substitution of c
            (3, "ab"),    # deletion
            (4, "abcd"),  # insertion
            (5, "abc"),   # exact duplicate of 1
            (6, "xyz"),   # unrelated
        ],
        ["k", "s"],
    )
    pairs = {
        (r["key_a"], r["key_b"]): r["lev"]
        for r in fuzzy_self_join_ed1(df, "k", "s").collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1
    assert pairs[(1, 4)] == 1
    assert pairs[(1, 5)] == 0
    assert pairs[(2, 5)] == 1
    assert all(k != 6 and v != 6 for k, v in pairs)
    # ed-2 pairs (ab ~ abcd) must NOT appear
    assert (3, 4) not in pairs


def test_fuzzy_ed1_no_quadratic_plan(spark):
    df = spark.createDataFrame([(1, "aa"), (2, "ab")], ["k", "s"])
    plan = fuzzy_self_join_ed1(df, "k", "s")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------- scd2

def test_scd2_runs_and_intervals(spark):
    rows = [
        (1, "a", 100, 10),
        (1, "a", 200, 11),  # same run
        (1, "b", 300, 12),  # change
        (1, "a", 400, 13),  # back to a: NEW run (SCD2, not distinct-agg)
        (2, "x", 100, 20),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "status_v", "us_raw", "eid"]
    ).select(
        "user_id",
        F.col("status_v"),
        F.timestamp_micros(F.col("us_raw")).alias("ts"),
        "eid",
    )
    out = {
        (r["user_id"], r["run_id"]): r
        for r in status_intervals(df, "user_id", "status_v", "ts", "eid").collect()
    }
    assert len(out) == 4
    r1 = out[(1, 1)]
    assert (r1["status"], r1["valid_from_us"], r1["valid_to_us"],
            r1["n_events"], r1["is_current"]) == ("a", 100, 300, 2, 0)
    r2 = out[(1, 2)]
    assert (r2["status"], r2["valid_from_us"], r2["valid_to_us"]) == ("b", 300, 400)
    r3 = out[(1, 3)]
    assert (r3["status"], r3["valid_to_us"], r3["is_current"]) == ("a", None, 1)
    assert out[(2, 1)]["is_current"] == 1


def test_scd2_null_status_forms_own_run(spark):
    # a, a, NULL, NULL, a → three runs: the NULL pair is its own interval,
    # and the trailing 'a' starts a fresh run (not a continuation).
    rows = [
        (1, "a", 100, 10),
        (1, "a", 200, 11),
        (1, None, 300, 12),
        (1, None, 400, 13),
        (1, "a", 500, 14),
        # key 3 starts with NULL: first row still opens run 1
        (3, None, 100, 30),
        (3, "z", 200, 31),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "status_v", "us_raw", "eid"]
    ).select(
        "user_id",
        F.col("status_v"),
        F.timestamp_micros(F.col("us_raw")).alias("ts"),
        "eid",
    )
    out = {
        (r["user_id"], r["run_id"]): r
        for r in status_intervals(df, "user_id", "status_v", "ts", "eid").collect()
    }
    assert len(out) == 5
    assert (out[(1, 1)]["status"], out[(1, 1)]["n_events"],
            out[(1, 1)]["valid_to_us"]) == ("a", 2, 300)
    assert (out[(1, 2)]["status"], out[(1, 2)]["n_events"],
            out[(1, 2)]["valid_from_us"], out[(1, 2)]["valid_to_us"]) == (
        None, 2, 300, 500)
    assert (out[(1, 3)]["status"], out[(1, 3)]["is_current"]) == ("a", 1)
    assert (out[(3, 1)]["status"], out[(3, 1)]["valid_to_us"]) == (None, 200)
    assert (out[(3, 2)]["status"], out[(3, 2)]["is_current"]) == ("z", 1)


# ------------------------------------------------------------- pattern match

def test_session_pattern_match_gap_and_motif(spark):
    m = 1_000_000
    rows = [
        # session 1: v c c p -> match "vccp"
        (1, "view", 0 * m, 1),
        (1, "click", 60 * m, 2),
        (1, "click", 120 * m, 3),
        (1, "purchase", 180 * m, 4),
        # > 30 min gap -> session 2: v p (no c) -> no match
        (1, "view", 4000 * m * 60, 5),
        (1, "purchase", 4001 * m * 60, 6),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "etype", "us_raw", "eid"]
    ).select(
        "user_id", "etype",
        F.timestamp_micros(F.col("us_raw")).alias("ts"), "eid",
    )
    out = {
        r["session_seq"]: r
        for r in session_pattern_match(
            df, "user_id", "etype", "ts", "eid", "vc+p"
        ).collect()
    }
    assert out[1]["seq"] == "vccp"
    assert out[1]["matched"] == "vccp"
    assert out[1]["has_match"] == 1
    assert out[2]["seq"] == "vp"
    assert out[2]["matched"] is None
    assert out[2]["has_match"] == 0


# --------------------------------------------------------- systematic sample

def test_systematic_sample_exact_pick_count(spark):
    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 50) for i in range(200)], ["doc_id", "w"]
    )
    total = df.agg(F.sum("w")).head()[0]
    step = 97
    out = systematic_weighted_sample(df, "doc_id", "w", step).collect()
    # zero-variance invariant: total picks == floor(total/step) exactly
    assert sum(r["picks"] for r in out) == total // step
    # every selected row's segment really contains a multiple of step
    for r in out:
        lo, hi = r["cum_weight"] - r["weight"], r["cum_weight"]
        assert hi // step > lo // step


def test_systematic_sample_heavy_row_multi_pick(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 1000), (3, 5)], ["doc_id", "w"]
    )
    out = {r["id"]: r["picks"] for r in
           systematic_weighted_sample(df, "doc_id", "w", 100).collect()}
    assert out[2] == 10  # 1000-weight row picked exactly 10x at step 100


# ------------------------------------------------------------ range_join by=

def test_range_join_by_keys_scopes_entity(spark):
    pts = spark.createDataFrame(
        [(1, 50, "p1"), (2, 50, "p2")], ["u_l", "pt", "tag"]
    )
    iv = spark.createDataFrame(
        [(1, 0, 100, "i1"), (2, 200, 300, "i2")], ["u_r", "lo", "hi", "ivl"]
    )
    out = range_join(
        pts, iv, "pt", "lo", "hi", bin_width=100.0, by=[("u_l", "u_r")]
    ).collect()
    # without by-keys both points fall in i1's bins; with them only user 1
    assert len(out) == 1 and out[0]["tag"] == "p1" and out[0]["ivl"] == "i1"


# ------------------------------------------------------------ triangle count

def test_triangle_stats_k4_plus_path(spark):
    from squirreling_spark.pipeline.graph import triangle_stats

    # K4 on {1,2,3,4} (4 triangles) plus pendant path 4-5-6 (0 triangles);
    # duplicate + reversed edges must canonicalize away
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 5), (2, 1)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    r = triangle_stats(df).head()
    assert r["n_nodes"] == 6
    assert r["n_edges"] == 8
    # degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 2; 6 -> 1 => wedges 3*3+6+1+0 = 16
    assert r["n_wedges"] == 16
    assert r["n_triangles"] == 4
    assert r["clustering_ppm"] == (1_000_000 * 3 * 4) // 16


def test_triangle_stats_triangle_free(spark):
    from squirreling_spark.pipeline.graph import triangle_stats

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    r = triangle_stats(df).head()
    assert r["n_triangles"] == 0 and r["clustering_ppm"] == 0


def test_triangle_stats_reliable_checkpoint_dir(spark, tmp_path):
    # checkpoint_dir routes lineage truncation to RELIABLE storage:
    # same result, and checkpoint files land under the given dir.
    from squirreling_spark.pipeline.graph import triangle_stats

    ckpt = str(tmp_path / "ckpt")
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 5), (2, 1)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    r = triangle_stats(df, checkpoint_dir=ckpt).head()
    assert r["n_triangles"] == 4 and r["n_wedges"] == 16
    import os

    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "reliable checkpoint wrote no files"


def test_pagerank_checkpoint_dir_same_ranks(spark, tmp_path):
    from squirreling_spark.pipeline.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], ["id_a", "id_b"]
    )
    reg = []
    base = {r["doc_id"]: r["pr_scaled"]
            for r in pagerank(edges, iters=2, cache_registry=reg).collect()}
    ck = {r["doc_id"]: r["pr_scaled"]
          for r in pagerank(
              edges, iters=2, checkpoint_dir=str(tmp_path / "ck")
          ).collect()}
    assert base == ck
    for d in reg:
        d.unpersist()


# ---------------------------------------------------------------- OLS trend

def test_trend_ols_exact_line(spark, sf001):
    """On y = 3x + 7 the exact-sufficient-stat slope must be exactly 3."""
    from squirreling_spark import inventory

    inventory.load_all()
    # build a tiny exact case directly against the operator's math: the
    # registered query is oracle-checked; here pin closed-form recovery
    rows = [(float(3 * x + 7), x) for x in range(100)]
    df = spark.createDataFrame(rows, ["y", "x"])
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y").cast("decimal(27,6)")).alias("sy"),
        F.sum(F.col("y").cast("decimal(27,6)") * F.col("x")).alias("sxy"),
    ).head()
    num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    den = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    assert float(num) / float(den) == 3.0


# ----------------------------------------------------------- plan shapes

def test_triangle_plan_no_cartesian_no_bnlj_on_edges(spark):
    """The wedge build and closure must be hash/sort-merge equi-joins.
    (The three 1-row summary aggregates ARE combined with a broadcast
    nested loop — that's 3 rows, fine; assert no CartesianProduct and
    that the checkpointed edge list feeds scans, not recomputation.)"""
    from squirreling_spark.pipeline.graph import triangle_stats

    df = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(200)], ["id_a", "id_b"]
    )
    plan = triangle_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_systematic_sample_no_global_data_window(spark):
    """The only unpartitioned window must run over the BUCKET table
    (rows = corpus/bucket_size), never the data table: every window over
    base rows is partitioned by _bkt."""
    from squirreling_spark.pipeline.sample import systematic_weighted_sample

    df = spark.createDataFrame(
        [(i, 10) for i in range(5000)], ["doc_id", "w"]
    )
    out = systematic_weighted_sample(df, "doc_id", "w", 97, bucket_size=256)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    # every Window node either partitions by _bkt (data-level) or is the
    # bucket-table cumsum (input = the grouped per-bucket sums)
    wins = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert wins, "expected window nodes in plan"
    # toString shape: Window [exprs], [partitionExprs], [orderExprs] —
    # a partitioned window has two "], [" separators, an unpartitioned
    # one (no partition list) has one
    unpartitioned = [w for w in wins if w.count("], [") == 1]
    partitioned = [w for w in wins if w.count("], [") == 2]
    assert len(unpartitioned) == 1
    assert "_bsum" in unpartitioned[0]
    assert all("[_bkt#" in w for w in partitioned)


# ------------------------------------------------------- behavior operators

def test_transition_matrix_counts_and_ppm(spark):
    from squirreling_spark.operators.behavior import transition_matrix
    from pyspark.sql import functions as F

    rows = [
        (1, "a", 100, 1), (1, "b", 200, 2), (1, "a", 300, 3),
        (1, "b", 400, 4),
        (2, "a", 100, 5), (2, "c", 200, 6),
    ]
    df = spark.createDataFrame(
        rows, ["u", "s", "us_raw", "eid"]
    ).select("u", "s", F.timestamp_micros(F.col("us_raw")).alias("ts"), "eid")
    out = {(r["from_state"], r["to_state"]): r for r in
           transition_matrix(df, "u", "s", "ts", "eid").collect()}
    # from 'a': b,b,c => a->b n=2 (666666 ppm), a->c n=1 (333333 ppm)
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "b")]["p_ppm"] == 666666
    assert out[("a", "c")]["p_ppm"] == 333333
    assert out[("b", "a")]["n"] == 1 and out[("b", "a")]["p_ppm"] == 1000000


def test_rfm_segments_buckets(spark):
    from squirreling_spark.operators.behavior import rfm_segments

    rows = []
    for u in range(1, 9):
        for k in range(u):  # user u has u purchases
            rows.append((u, u * 10 + k, float(u * 100)))
    df = spark.createDataFrame(rows, ["u", "rec", "v"])
    out = {r["u"]: r for r in rfm_segments(df, "u", "rec", "v").collect()}
    assert out[1]["f"] == 1 and out[8]["f"] == 8
    assert out[8]["r_seg"] == 4 and out[8]["f_seg"] == 4 and out[8]["m_seg"] == 4
    assert out[1]["r_seg"] == 1 and out[1]["rfm_code"] == 111
    assert out[8]["rfm_code"] == 444


def test_embedding_dim_stats_known_values(spark):
    from squirreling_spark.pipeline.feature import embedding_dim_stats

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0])], ["vec_id", "embedding"]
    )
    out = {r["dim"]: r for r in
           embedding_dim_stats(df, "embedding", "vec_id").collect()}
    assert out[0]["n"] == 2 and out[0]["sxq"] == 4_000_000
    assert out[0]["mean"] == 2.0
    assert out[0]["std"] == 1.0  # population std of {1,3}
    assert out[1]["mean"] == 0.0 and out[1]["std"] == 0.0


# ------------------------------------------------------- ordered cumsum/ABC

def test_ordered_cumsum_matches_sequential(spark):
    from squirreling_spark.operators.abc import ordered_cumsum
    from pyspark.sql import functions as F

    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = ordered_cumsum(
        df, [F.col("v").desc(), F.col("k")], "v", "cum"
    ).collect()
    expected = {}
    run = 0
    for k, v in sorted(rows, key=lambda r: (-r[1], r[0])):
        run += v
        expected[k] = run
    got = {r["k"]: r["cum"] for r in out}
    assert got == expected


def test_pareto_abc_classes(spark):
    from squirreling_spark.operators.abc import pareto_abc

    # values 50, 30, 15, 5 => cum ppm 500000, 800000, 950000, 1000000
    df = spark.createDataFrame(
        [(1, 50), (2, 30), (3, 15), (4, 5)], ["k", "v"]
    )
    out = {r["key"]: r for r in pareto_abc(df, "k", "v").collect()}
    assert out[1]["abc_class"] == "A" and out[1]["cum_ppm"] == 500000
    assert out[2]["abc_class"] == "A" and out[2]["cum_ppm"] == 800000
    assert out[3]["abc_class"] == "B" and out[3]["cum_ppm"] == 950000
    assert out[4]["abc_class"] == "C" and out[4]["cum_ppm"] == 1000000


def test_corr_matrix_perfect_and_inverse(spark):
    """corr(x, 2x) == 1, corr(x, -x + c) == -1 recovered exactly from
    the integer sufficient statistics."""
    import math
    from pyspark.sql import functions as F

    rows = [(float(x), float(2 * x), float(100 - x)) for x in range(50)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    q = df.select(
        *[
            F.expr(f"CAST(floor({c} * 1000000 + 0.5) AS BIGINT)").alias(c)
            for c in ("a", "b", "c")
        ]
    )
    agg = q.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"s{c}") for c in ("a", "b", "c")],
        F.sum(F.col("a").cast("decimal(19,0)") * F.col("a")).alias("ssa"),
        F.sum(F.col("b").cast("decimal(19,0)") * F.col("b")).alias("ssb"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("ssc"),
        F.sum(F.col("a").cast("decimal(19,0)") * F.col("b")).alias("sab"),
        F.sum(F.col("a").cast("decimal(19,0)") * F.col("c")).alias("sac"),
    ).head()
    def corr(sx, sy, ssx, ssy, sxy):
        n = agg["n"]
        num = float(n * sxy - sx * sy)
        return num / (
            math.sqrt(float(n * ssx - sx * sx))
            * math.sqrt(float(n * ssy - sy * sy))
        )
    # sqrt(a)*sqrt(b) != sqrt(ab) at the last ulp — the parity gate only
    # needs the FIXED op sequence (identical cross-engine), not exactness
    assert abs(corr(agg["sa"], agg["sb"], agg["ssa"], agg["ssb"], agg["sab"]) - 1.0) < 1e-12
    assert abs(corr(agg["sa"], agg["sc"], agg["ssa"], agg["ssc"], agg["sac"]) + 1.0) < 1e-12


def test_doc_token_cap_bounds_pathological_doc(spark):
    """The within-doc pair joins are quadratic in distinct tokens per
    document (r9 verdict Wrong #3): doc_distinct_tokens caps each doc at
    max_tokens_per_doc (deterministic lexicographic prefix), reports the
    trade via observe metrics, and ``None`` opts out."""
    from pyspark.sql import Observation

    from squirreling_spark.queries_entity import doc_distinct_tokens

    rows = [
        (1, "alpha beta gamma"),  # 3 tokens, under the cap
        (2, " ".join(f"word{i:05d}" for i in range(50))),  # pathological
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation()
    capped = doc_distinct_tokens(
        docs, max_tokens_per_doc=8, observe_name=obs
    )
    counts = {
        r["doc_id"]: r["n"]
        for r in capped.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {1: 3, 2: 8}
    assert obs.get["capped_docs"] == 1
    assert obs.get["max_doc_tokens"] == 50
    # capped selection is the lexicographic prefix — deterministic
    toks = {
        r["tk"]
        for r in capped.where(F.col("doc_id") == 2).collect()
    }
    assert toks == {f"word{i:05d}" for i in range(8)}
    # opt-out: full token set
    full = doc_distinct_tokens(docs, max_tokens_per_doc=None)
    assert full.where(F.col("doc_id") == 2).count() == 50


def test_token_pair_queries_unchanged_by_default_cap(spark):
    """Graded/swept results must not move: the default cap (5000) is far
    above the fixture's max tokens/doc, so the capped queries equal the
    uncapped pair join row-for-row."""
    from squirreling_spark.queries_entity import (
        doc_distinct_tokens,
        token_cooccurrence_q,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["t1"], r["t2"], r["n_docs"])
        for r in token_cooccurrence_q(spark, sf).collect()
    }
    from squirreling_spark.qutil import t as _t

    dt = doc_distinct_tokens(_t(spark, sf, "documents"),
                             max_tokens_per_doc=None)
    a, b = dt.alias("a"), dt.alias("b")
    ref = (
        a.join(b, "doc_id")
        .where(F.col("a.tk") < F.col("b.tk"))
        .groupBy(F.col("a.tk").alias("t1"), F.col("b.tk").alias("t2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "t1", "t2")
        .limit(50)
    )
    exp = {(r["t1"], r["t2"], r["n_docs"]) for r in ref.collect()}
    assert got == exp and len(got) == 50
