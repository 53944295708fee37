"""Round-9 operator batch: debounce/throttle, n-gram novelty,
deterministic stratified split, token-pair lift."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def test_throttle_keeps_first_and_gaps(spark):
    from squirreling_spark.operators.resample import throttle

    m = 1_000_000
    rows = [
        # user 1, type c: 0s, 10s (drop), 45s (keep: 35s after previous),
        # 60s (drop: 15s after previous EVENT, kept or not)
        (1, "c", 1, 0),
        (1, "c", 2, 10 * m),
        (1, "c", 3, 45 * m),
        (1, "c", 4, 60 * m),
        # different type: independent stream
        (1, "v", 5, 1 * m),
        # different user: first always kept
        (2, "c", 6, 2 * m),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_type", "event_id", "us"]
    ).select(
        "user_id", "event_type", "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )
    out = {
        r["event_id"]: r
        for r in throttle(
            df, ["user_id", "event_type"], "ts", "event_id", 30 * m
        ).collect()
    }
    assert [out[i]["kept"] for i in (1, 2, 3, 4, 5, 6)] == [1, 0, 1, 0, 1, 1]
    assert out[1]["gap_us"] is None
    assert out[3]["gap_us"] == 35 * m


def test_ngram_novelty_first_occurrence_owns_grams(spark):
    from squirreling_spark.pipeline.corpus import ngram_novelty

    rows = [
        (1, "a b c d e f"),          # grams: "a b c d e", "b c d e f" — both novel
        (2, "a b c d e f"),          # exact dup: 0 novel
        (3, "x y z w v"),            # 1 gram, novel
        (4, "too short"),            # < 5 tokens: absent from output
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           ngram_novelty(df, "text", "doc_id", 5).collect()}
    assert 4 not in out
    assert (out[1]["n_grams"], out[1]["n_novel"], out[1]["novelty_ppm"]) == (
        2, 2, 1_000_000)
    assert (out[2]["n_grams"], out[2]["n_novel"], out[2]["novelty_ppm"]) == (
        2, 0, 0)
    assert (out[3]["n_grams"], out[3]["n_novel"]) == (1, 1)


def test_stratified_hash_split_deterministic_and_complete(spark):
    from squirreling_spark.pipeline.corpus import stratified_hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = stratified_hash_split(df, "doc_id")
    rows = out.collect()
    assert len(rows) == 2000
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], 0)
        by_split[r["split"]] += 1
        # split is a pure function of the bucket
        if r["bucket"] < 50:
            assert r["split"] == "test"
        elif r["bucket"] < 100:
            assert r["split"] == "valid"
        else:
            assert r["split"] == "train"
    # roughly 5/5/90 (multiplicative hash scatters uniformly)
    assert 40 <= by_split["test"] <= 180
    assert 40 <= by_split["valid"] <= 180
    assert by_split["train"] >= 1600
    # deterministic: a second evaluation assigns identically
    again = {r["doc_id"]: r["split"]
             for r in stratified_hash_split(df, "doc_id").collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_token_pair_lift_values(spark):
    # 4 docs; tokens "aaaa","bbbb" co-occur in 3 of 4 docs;
    # df(aaaa)=4, df(bbbb)=3 -> lift = 3*4/(4*3) = 1.0 -> 1_000_000 ppm
    from squirreling_spark import inventory

    inventory.load_all()
    import tempfile

    rows = [
        (1, "aaaa bbbb"), (2, "aaaa bbbb"), (3, "aaaa bbbb"), (4, "aaaa cccc"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, ["doc_id", "text"]
        ).withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("src0")
        ).withColumn("n_chars", F.length("text").cast("bigint")).write.parquet(
            f"{d}/documents.parquet"
        )
        out = inventory.QUERIES["token_pair_lift"](spark, d).collect()
    got = {(r["t1"], r["t2"]): r for r in out}
    r = got[("aaaa", "bbbb")]
    assert (r["n_pair"], r["df1"], r["df2"]) == (3, 4, 3)
    assert r["lift_ppm"] == 1_000_000
    # cccc pair appears in only 1 doc -> filtered by n_pair >= 3
    assert ("aaaa", "cccc") not in got


def test_label_propagation_barbell(spark):
    # two triangles {1,2,3}, {4,5,6} bridged by 3-4. Hand-unrolled:
    # round 1 (singleton init => min neighbor id):
    #   1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    # round 2 (mode of neighbor labels, ties -> min):
    #   1: {1,1}->1; 2: {2,1}->1; 3: {2,1,3}->1
    #   4: {1,4,4}->4; 5: {3,4}->3; 6: {3,4}->3
    from squirreling_spark.pipeline.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["id_a", "id_b"],
    )
    out = {r["node"]: (r["label"], r["comm_size"])
           for r in label_propagation(edges, iters=2).collect()}
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        4: (4, 1), 5: (3, 2), 6: (3, 2),
    }


def test_label_propagation_converges_and_stops(spark):
    """stop_on_converge halts at the fixed point: on two disjoint
    triangles every node settles on its triangle's min id after round 2
    and stays there, so iters=10 with the stop returns exactly the
    iters=2 labels (bit-identical, and the loop exits early instead of
    re-deriving the same table 8 more times)."""
    from squirreling_spark.pipeline.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9)],
        ["id_a", "id_b"],
    )
    fixed = {
        r["node"]: (r["label"], r["comm_size"])
        for r in label_propagation(edges, iters=2).collect()
    }
    assert fixed == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        7: (7, 3), 8: (7, 3), 9: (7, 3),
    }
    got = {
        r["node"]: (r["label"], r["comm_size"])
        for r in label_propagation(
            edges, iters=10, stop_on_converge=True
        ).collect()
    }
    assert got == fixed


def test_label_propagation_deep_iters_flat_plan(spark):
    """Per-round lineage truncation (r9 verdict Wrong #2): at iters=8 the
    final plan must NOT nest eight join+window subtrees — each round's
    label table is a checkpointed leaf, so the analyzed plan stays small
    and analysis cost flat in the round count."""
    from squirreling_spark.pipeline.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["id_a", "id_b"],
    )
    out = label_propagation(edges, iters=8)
    plan = out._jdf.queryExecution().analyzed().toString()
    # one live round above the last checkpoint: a handful of joins, not 8
    assert plan.count("Join") <= 4, plan.count("Join")
    # and the deep run still computes. Hand-unrolled past round 2:
    # round 3: 4's neighbors carry {1,3,3} -> 3 (the bridge node joins
    # the right triangle's community); round 4 reproduces round 3 — the
    # fixed point every later round keeps.
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_lpa_reliable_checkpoints_bounded_on_disk(spark, tmp_path):
    """Reliable per-round checkpoints must not accumulate unboundedly
    (r10 advice): with iters=6 the checkpoint dir holds at most the
    canonical-edge checkpoint plus the last TWO label generations (one
    superseded generation is kept because convergence compares can still
    reference it) — not one dir per round."""
    import pathlib

    from squirreling_spark.pipeline.graph import label_propagation

    ck = str(tmp_path / "ck")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
        "id_a long, id_b long",
    )
    out = label_propagation(edges, iters=6, checkpoint_dir=ck)
    assert out.count() == 6
    rdd_dirs = list(pathlib.Path(ck).glob("*/rdd-*"))
    # 1 (und) + 2 label generations; without eviction this would be 7
    assert len(rdd_dirs) <= 3, rdd_dirs
    # and the surviving checkpoints still serve the result
    assert out.count() == 6
