"""Unit tests for the custom operators (positional_join, json_each) —
semantics beyond what the oracle queries exercise."""

from pyspark.sql import functions as F

from squirreling_spark.operators.json_each import json_each, json_each_array
from squirreling_spark.operators.positional_join import positional_join


def test_positional_join_null_pads_shorter(spark):
    longer = spark.createDataFrame([(i, f"L{i}") for i in range(5)], ["id", "lv"])
    shorter = spark.createDataFrame([(i, f"R{i}") for i in range(3)], ["rid", "rv"])
    out = positional_join(longer, shorter, ["id"], ["rid"]).orderBy("id")
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0]["lv"] == "L0" and rows[0]["rv"] == "R0"
    assert rows[3]["rv"] is None and rows[4]["rv"] is None  # padded


def test_positional_join_shorter_left(spark):
    a = spark.createDataFrame([(1, "a")], ["id", "v"])
    b = spark.createDataFrame([(i, f"b{i}") for i in range(3)], ["rid", "w"])
    out = positional_join(a, b, ["id"], ["rid"])
    assert out.count() == 3
    assert out.filter(F.col("v").isNull()).count() == 2


def test_positional_join_numbering_is_parallel(spark):
    """The numbering stage must not funnel rows through one task (the
    round-1 implementation used row_number over a global window — a
    single-task WindowExec). Two-level numbering keeps the data side
    multi-partition and window-free, and stays correct on scrambled,
    multi-partition input."""
    from squirreling_spark.operators.positional_join import _RN, _with_rn

    n = 5000
    df = (
        spark.range(n)
        .select((F.col("id") * 2654435761 % n).alias("k"))
        .repartition(8)
    )
    numbered = _with_rn(df, ["k"])
    # No WindowExec over the data: the only window is the per-partition
    # offsets cumsum (one row per partition), which sits under a broadcast.
    data_plan = numbered._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in data_plan.split("BroadcastExchange")[0]
    # The numbered output keeps the input's parallelism.
    assert numbered.rdd.getNumPartitions() > 1
    rows = numbered.select("k", _RN).collect()
    by_rn = sorted((r[_RN], r["k"]) for r in rows)
    assert [rn for rn, _ in by_rn] == list(range(1, n + 1))
    ks = [k for _, k in by_rn]
    assert ks == sorted(ks)


def test_range_join_matches_naive_and_hash_plans(spark):
    from squirreling_spark.operators.range_join import range_join

    pts = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(200)], ["pid", "x"]
    )
    iv = spark.createDataFrame(
        [(j, float(j * 13 % 90), float(j * 13 % 90 + 15)) for j in range(40)],
        ["iid", "lo", "hi"],
    )
    out = range_join(pts, iv, "x", "lo", "hi", bin_width=16.0)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(iv)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .collect()
    )
    assert got == naive and len(got) > 0
    # The whole point: an equi-join (hash/sort-merge), never a nested loop.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_overlap_join_each_pair_once(spark):
    from squirreling_spark.operators.range_join import interval_overlap_join

    # Long intervals spanning many shared bins — the dedup rule (first
    # shared bin owns the pair) must still emit each overlapping pair
    # exactly once; includes touching endpoints (closed-interval overlap).
    a = spark.createDataFrame(
        [(1, 0.0, 100.0), (2, 50.0, 60.0), (3, 200.0, 300.0)],
        ["aid", "lo_a", "hi_a"],
    )
    b = spark.createDataFrame(
        [(10, 90.0, 250.0), (11, 100.0, 100.0), (12, 301.0, 400.0)],
        ["bid", "lo_b", "hi_b"],
    )
    out = interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 16.0)
    got = sorted((r["aid"], r["bid"]) for r in out.collect())
    naive = sorted(
        (r["aid"], r["bid"])
        for r in a.crossJoin(b)
        .filter(
            (F.col("lo_a") <= F.col("hi_b")) & (F.col("lo_b") <= F.col("hi_a"))
        )
        .collect()
    )
    assert got == naive == [(1, 10), (1, 11), (3, 10)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_left_keeps_unmatched(spark):
    from squirreling_spark.operators.range_join import range_join

    pts = spark.createDataFrame([(1, 5.0), (2, 500.0)], ["pid", "x"])
    iv = spark.createDataFrame([(1, 0.0, 10.0)], ["iid", "lo", "hi"])
    out = range_join(pts, iv, "x", "lo", "hi", bin_width=8.0, how="left")
    rows = {r["pid"]: r["iid"] for r in out.collect()}
    assert rows == {1: 1, 2: None}


def test_json_each_object(spark):
    df = spark.createDataFrame(
        [(1, '{"a": "1", "b": "x"}'), (2, '{"c": "y"}')], ["id", "j"]
    )
    rows = sorted(
        (r["id"], r["key"], r["value"])
        for r in json_each(df, "j", id_cols=["id"]).collect()
    )
    assert rows == [(1, "a", "1"), (1, "b", "x"), (2, "c", "y")]


def test_json_each_array(spark):
    df = spark.createDataFrame([(1, '["x", "y"]')], ["id", "j"])
    rows = sorted(
        (r["id"], r["index"], r["value"])
        for r in json_each_array(df, "j", id_cols=["id"]).collect()
    )
    assert rows == [(1, 0, "x"), (1, 1, "y")]


def test_json_each_invalid_json_drops_row(spark):
    df = spark.createDataFrame([(1, "not json"), (2, '{"k": "v"}')], ["id", "j"])
    rows = json_each(df, "j", id_cols=["id"]).collect()
    assert [(r["id"], r["key"]) for r in rows] == [(2, "k")]


def test_spatial_constructors_sql(spark):
    from squirreling_spark.functions.spatial import register_spatial

    register_spatial(spark)
    row = spark.sql(
        """
        SELECT st_astext(st_makeenvelope(0.0, 0.0, 2.0, 3.0)) AS env,
               st_geomfromtext('POINT (1 2)') AS gj,
               st_contains(st_makeenvelope(0.0, 0.0, 2.0, 3.0),
                           'POINT (1 2)') AS inside
        """
    ).collect()[0]
    assert row["env"] == "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"
    assert '"Point"' in row["gj"]
    assert row["inside"] is True


def test_chunk_documents_overlap_and_short_docs(spark):
    from squirreling_spark.pipeline.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(150))  # 150 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "tiny doc")], ["doc_id", "text"]
    )
    out = chunk_documents(df, "text", "doc_id", window=64, overlap=16)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # 150 tokens, stride 48: chunks start at 0/48/96 -> 3 chunks
    assert sorted(i for d, i in rows if d == 1) == [0, 1, 2]
    assert sorted(i for d, i in rows if d == 2) == [0]
    c0 = rows[(1, 0)]["chunk_text"].split(" ")
    c1 = rows[(1, 1)]["chunk_text"].split(" ")
    assert len(c0) == 64 and c0[48:] == c1[:16]  # 16-token overlap
    # final chunk reaches the last token
    assert rows[(1, 2)]["chunk_text"].split(" ")[-1] == "w149"
    assert rows[(2, 0)]["chunk_text"] == "tiny doc"


def test_hash_split_is_stable_and_near_proportional(spark):
    from squirreling_spark.pipeline.text import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(13), "doc_id").collect()
    }
    assert a == b  # partitioning-independent
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.75 < frac_train < 0.85


def test_pack_sequences_greedy_budget(spark):
    from squirreling_spark.pipeline.text import pack_sequences

    rows = [
        # (shard, doc, idx, tokens) - budget 100
        ("a", 1, 0, 60), ("a", 1, 1, 60),   # 60 | 60 -> two bins
        ("a", 2, 0, 30), ("a", 2, 1, 10),   # join bin 1 (60+30+10)
        ("a", 3, 0, 150),                   # oversize -> own bin
        ("a", 4, 0, 50),
        ("b", 9, 0, 10),                    # other shard packs separately
    ]
    df = spark.createDataFrame(rows, ["shard", "doc_id", "chunk_idx", "n_tok"])
    out = pack_sequences(
        df, "n_tok", ["doc_id", "chunk_idx"], "shard", budget=100
    )
    got = {
        (r["shard"], r["doc_id"], r["chunk_idx"]): (r["seq_idx"], r["seq_tokens"])
        for r in out.collect()
    }
    assert got[("a", 1, 0)] == (0, 60)
    assert got[("a", 1, 1)][0] == 1            # 60+60 > 100 -> new bin
    assert got[("a", 2, 0)][0] == 1            # 60+30 fits
    assert got[("a", 2, 1)] == (1, 100)        # bin 1 filled exactly
    assert got[("a", 3, 0)] == (2, 150)        # oversize chunk, own bin
    assert got[("a", 4, 0)] == (3, 50)
    assert got[("b", 9, 0)] == (0, 10)         # shards pack independently
    # no bin over budget except single oversize chunks
    for (shard, doc, idx), (seq, tot) in got.items():
        assert tot <= 100 or tot == 150


# ---------------------------------------------------------------------------
# cosine_block_join — exact block-BLAS ε-join vs the naive HOF theta-join
# ---------------------------------------------------------------------------


def _hof_allpairs(spark, sf_dir, threshold=0.45):
    """The pre-round-6 plan: a<b theta-join + per-pair HOF cosine. Kept
    here (test-only) as the bit-parity reference for cosine_block_join."""
    from squirreling_spark.pipeline.similarity import cosine

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    sim = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _pairs_set(df):
    return sorted((r["id_a"], r["id_b"], r["sim"]) for r in df.collect())


def test_cosine_block_join_matches_hof(spark, sf001):
    """Bit-identical output (ids AND float sims) vs the naive exact plan."""
    from squirreling_spark.pipeline.similarity import cosine_block_join

    e = spark.read.parquet(f"{sf001}/embeddings.parquet")
    got = _pairs_set(cosine_block_join(e, threshold=0.45, block=16))
    want = _pairs_set(_hof_allpairs(spark, sf001))
    assert len(want) > 0  # fixture plants near-dup pairs
    assert got == want


def test_cosine_block_join_block_size_invariant(spark, sf001):
    """Output must not depend on the blocking granularity: one block,
    tiny blocks, defaults — same exact pair set, same sim bits."""
    from squirreling_spark.pipeline.similarity import cosine_block_join

    e = spark.read.parquet(f"{sf001}/embeddings.parquet")
    base = _pairs_set(cosine_block_join(e, threshold=0.45, block=100000))
    for blk in (7, 64):
        assert _pairs_set(cosine_block_join(e, threshold=0.45, block=blk)) == base


def test_cosine_block_join_slack_keeps_boundary_pairs(spark):
    """A pair whose raw sim sits just UNDER the threshold but rounds up to
    it must survive the BLAS slack mask (the mask uses threshold - 1e-6)."""
    from squirreling_spark.pipeline.similarity import cosine_block_join
    import math

    # unit vectors at angle arccos(0.4499996): rounds to 0.450000
    c = 0.4499996
    s = math.sqrt(1 - c * c)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [c, s]), (3, [-1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in cosine_block_join(df, threshold=0.45, block=2).collect()
    }
    assert (1, 2) in rows and abs(rows[(1, 2)] - 0.45) < 1e-12
    assert all(k == (1, 2) for k in rows)


def test_cosine_block_join_null_and_ragged_vectors(spark):
    """NULL / wrong-dimension vectors are filtered before blocking (the
    r6 ADVICE case: they used to raise inside _pack/np.array) — valid
    rows still pair up."""
    from squirreling_spark.pipeline.similarity import cosine_block_join

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, None),
            (4, [1.0, 0.0, 0.0]),  # ragged
        ],
        "vec_id bigint, embedding array<double>",
    )
    rows = cosine_block_join(df, threshold=0.45, block=2).collect()
    ids = {(r["id_a"], r["id_b"]) for r in rows}
    assert ids == {(1, 2)}


def test_lsh_recall_curve_monotone(spark):
    from squirreling_spark.pipeline.dedup import lsh_recall_curve

    # 40 sampled docs (ids 0,5,..,195), 30 distinct-ish tokens each
    docs = [
        (i, " ".join(f"w{i}t{j}" for j in range(30)))
        for i in range(0, 200)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = {
        r.level: r for r in lsh_recall_curve(df, "text", "doc_id").collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    assert [rows[l].m_replaced for l in range(4)] == [0, 3, 8, 16]
    # m=0 plants exact duplicates: recall MUST be 100%
    assert rows[0].recall_ppm == 1_000_000
    assert rows[0].n_caught == rows[0].n_planted == 10
    # recall never increases as more tokens are replaced
    rec = [rows[l].recall_ppm for l in range(4)]
    assert all(a >= b for a, b in zip(rec, rec[1:]))
    # integer contract
    for r in rows.values():
        assert r.recall_ppm == r.n_caught * 1_000_000 // r.n_planted


def test_resample_locf_fills_gaps(spark):
    from squirreling_spark.operators.resample import resample_locf

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:15:00", 7, 5.0),
            (2, "2024-01-01 10:45:00", 7, 9.0),   # same hour, later ts
            (3, "2024-01-01 13:20:00", 7, 2.0),   # 2-hour gap before
            (4, "2024-01-01 11:00:00", 8, 1.0),   # other user
        ],
        "event_id bigint, ts string, user_id bigint, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {
        (r.user_id, str(r.hour)): r
        for r in resample_locf(ev, "user_id", "ts", "value", "event_id").collect()
    }
    u7 = [rows[(7, f"2024-01-01 {h}:00:00")] for h in ("10", "11", "12", "13")]
    assert [r.n_events for r in u7] == [2, 0, 0, 1]
    assert u7[0].total_value == 14.0 and u7[0].locf_value == 9.0  # LAST obs
    assert not u7[0].filled and u7[1].filled and u7[2].filled
    assert u7[1].locf_value == 9.0 and u7[2].locf_value == 9.0    # carried
    assert u7[3].locf_value == 2.0 and u7[3].total_value == 2.0
    # user 8: single-hour grid, no fills
    assert len([k for k in rows if k[0] == 8]) == 1


def test_winsorize_caps_tails(spark):
    from squirreling_spark.operators.resample import winsorize

    vals = list(range(1, 100)) + [10_000]  # one huge outlier
    df = spark.createDataFrame(
        [(i, "t", float(v)) for i, v in enumerate(vals)],
        "event_id bigint, event_type string, value double",
    )
    r = winsorize(df, "event_type", "value").collect()[0]
    assert r.n == 100
    assert r.n_capped_hi >= 1      # the outlier is capped
    assert r.hi < 10_000           # p99 is far below the outlier
    assert r.n_capped_lo <= 1
    # the capped sum can't contain the raw outlier's mass
    assert r.total_capped < sum(vals) - 9_000


def test_funnel_strict_order(spark):
    from squirreling_spark.operators.funnel import funnel_steps

    rows = [
        # user 1 completes in order
        (1, "A", "2024-01-01 10:00:00", 1),
        (2, "B", "2024-01-01 11:00:00", 1),
        (3, "C", "2024-01-01 12:00:00", 1),
        # user 2 has B BEFORE A -> that B cannot count; no later B
        (4, "B", "2024-01-01 09:00:00", 2),
        (5, "A", "2024-01-01 10:00:00", 2),
        # user 3: simultaneous A and B, B's event_id larger -> counts
        (6, "A", "2024-01-01 10:00:00", 3),
        (7, "B", "2024-01-01 10:00:00", 3),
        # user 4: no step-1 event at all
        (8, "C", "2024-01-01 10:00:00", 4),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts string, user_id bigint"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.user_id: r
        for r in funnel_steps(
            df, "user_id", "event_type", "ts", "event_id", ["A", "B", "C"]
        ).collect()
    }
    assert out[1].reached == 3 and out[1].s3_eid == 3
    assert out[2].reached == 1 and out[2].s2_us is None  # early B ignored
    assert out[3].reached == 2 and out[3].s2_eid == 7    # same-ts tiebreak
    assert out[4].reached == 0 and out[4].s1_us is None


def test_cohort_retention_matrix(spark):
    from squirreling_spark.operators.funnel import cohort_retention

    rows = [
        # two users first seen week of 2024-01-01 (Mon); one returns wk+1
        (1, "2024-01-02 10:00:00"), (1, "2024-01-09 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        # one user first seen the next week
        (3, "2024-01-10 10:00:00"), (3, "2024-01-10 11:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, ts) for u, ts in rows], "user_id bigint, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (str(r.cohort_week), r.week_offset): r
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    w1, w2 = "2024-01-01 00:00:00", "2024-01-08 00:00:00"
    assert out[(w1, 0)].n_active == 2 and out[(w1, 0)].n_cohort == 2
    assert out[(w1, 0)].retention_ppm == 1_000_000
    assert out[(w1, 1)].n_active == 1
    assert out[(w1, 1)].retention_ppm == 500_000
    # same-week repeat events count the user once
    assert out[(w2, 0)].n_active == 1 and out[(w2, 0)].n_cohort == 1
    assert (w2, 1) not in out


def test_mad_anomalies_robust_to_outliers(spark):
    from squirreling_spark.operators.resample import mad_anomalies

    # 99 well-behaved values around 50 plus one wild outlier; a z-score
    # with the outlier included would inflate sigma — MAD must not
    vals = [(i, "t", 50.0 + (i % 11) - 5) for i in range(99)]
    vals.append((99, "t", 5000.0))
    df = spark.createDataFrame(
        vals, "event_id bigint, event_type string, value double"
    )
    r = mad_anomalies(df, "event_type", "value", "event_id").collect()[0]
    assert r.n == 100 and r.med == 50.0
    assert r.n_anomalies == 1 and r.anom_ord_sum == 99  # exactly the outlier
    # a spread-free key flags nothing (mad 0 -> only dev>0... all equal)
    df2 = spark.createDataFrame(
        [(i, "u", 7.0) for i in range(10)],
        "event_id bigint, event_type string, value double",
    )
    r2 = mad_anomalies(df2, "event_type", "value", "event_id").collect()[0]
    assert r2.n_anomalies == 0 and r2.mad == 0.0
