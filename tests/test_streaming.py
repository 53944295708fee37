"""Structured Streaming tests: run the streaming operators over a file
source built from the events table, drain to a memory sink, and compare
with the identical batch transformation (stream/batch parity)."""

import pytest
from pyspark.sql import functions as F

from squirreling_spark.qutil import events_with_ts
from squirreling_spark.streaming.windows import (
    session_aggregate,
    stateful_user_counter,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events (ns→µs converted) written to a clean parquet dir for
    readStream."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    events_with_ts(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(
        path
    )
    return path


def _run_stream(spark, stream_df, name, mode="complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_stream_matches_batch(spark, events_dir):
    batch_df = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in tumbling_counts(batch_df).collect()
    }
    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got_df = _run_stream(spark, tumbling_counts(stream), "tumbling_sink")
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in got_df.collect()
    }
    assert got == expected and len(got) > 0


def test_session_aggregate_stream(spark, events_dir):
    batch_df = spark.read.parquet(events_dir)
    expected_total = session_aggregate(batch_df).agg(
        F.sum("n_events")
    ).collect()[0][0]
    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got_df = _run_stream(spark, session_aggregate(stream), "session_sink")
    got_total = got_df.agg(F.sum("n_events")).collect()[0][0]
    # every event lands in exactly one session
    assert got_total == expected_total == batch_df.count()


def test_stateful_user_counter(spark, events_dir):
    batch_df = spark.read.parquet(events_dir)
    expected = {
        r["user_id"]: r["cnt"]
        for r in batch_df.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got_df = _run_stream(
        spark, stateful_user_counter(stream), "counter_sink", mode="update"
    )
    got = {r["user_id"]: r["total_events"] for r in got_df.collect()}
    # memory sink in update mode may hold several versions; the max per
    # user is the final state
    final = {}
    for r in got_df.collect():
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["total_events"])
    assert final == expected


def test_stream_dedup_exactly_one_per_key(spark, events_dir):
    """Streaming dedup keeps one row per key with watermark-bounded state;
    stream output matches batch dropDuplicates key-set."""
    from squirreling_spark.streaming.windows import stream_dedup

    batch_df = spark.read.parquet(events_dir)
    # duplicate the stream 3x so the dedup provably fires
    tripled = batch_df.union(batch_df).union(batch_df)
    expected_keys = {
        r["user_id"] for r in stream_dedup(tripled, ["user_id"]).collect()
    }
    dup_dir = events_dir + "_dups"
    tripled.write.mode("overwrite").parquet(dup_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(dup_dir)
    out = _run_stream(
        spark, stream_dedup(stream, ["user_id"]), "dedup_sink", mode="append"
    )
    rows = out.collect()
    assert {r["user_id"] for r in rows} == expected_keys
    assert len(rows) == len(expected_keys)  # exactly one row per key


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (watermarked both sides, time-bounded
    state) produces exactly the batch join's pairs."""
    from squirreling_spark.streaming.windows import stream_interval_join

    batch_df = spark.read.parquet(events_dir)
    clicks_b = batch_df.filter(F.col("event_type") == "click")
    purchases_b = batch_df.filter(F.col("event_type") == "purchase")
    expected = {
        (r["key"], r["l_event_id"], r["r_event_id"])
        for r in stream_interval_join(
            clicks_b, purchases_b, "user_id"
        ).collect()
    }
    assert expected, "fixture must produce at least one joined pair"

    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    joined = stream_interval_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        "user_id",
    )
    out = _run_stream(spark, joined, "ssjoin_sink", mode="append")
    got = {
        (r["key"], r["l_event_id"], r["r_event_id"]) for r in out.collect()
    }
    assert got == expected


def test_streaming_cms_matches_batch(spark, tmp_path_factory):
    """Count-min sketch over a STREAM (pipeline/sketch.py): cms_build is
    a plain groupBy-count, so it runs unmodified under Structured
    Streaming with state bounded by depth x width cells — the reason a
    sketch (not an exact distinct-key count) is the right heavy-hitter
    primitive for unbounded streams. availableNow drain must equal the
    batch sketch cell-for-cell."""
    from squirreling_spark.pipeline.sketch import cms_build
    from squirreling_spark.pipeline.text import tokens
    from squirreling_spark.qutil import t

    path = str(tmp_path_factory.mktemp("docs_stream") / "docs")
    docs = t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    docs.write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)

    def toks(df):
        return df.select(F.explode(tokens("text")).alias("term")).filter(
            F.col("term") != ""
        )

    expected = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(toks(batch), "term", width=1024, depth=3).collect()
    }
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        cms_build(toks(stream), "term", width=1024, depth=3)
        .writeStream.format("memory")
        .queryName("cms_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), q.exception()
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_sink").collect()
    }
    assert got == expected
    assert len(got) <= 3 * 1024  # bounded state


def test_streaming_quality_gate_matches_batch(spark, tmp_path_factory):
    """The first-pass corpus quality gate is stateless row-local scoring,
    so it runs unmodified on a stream: availableNow drain of
    linear_quality_score over a document stream must equal the batch
    scores row-for-row (the decimal-fold scoring is partition- and
    trigger-invariant by construction)."""
    from squirreling_spark.pipeline.classify import linear_quality_score
    from squirreling_spark.qutil import t

    path = str(tmp_path_factory.mktemp("docs_q_stream") / "docs")
    docs = t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    docs.write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)
    expected = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["keep"])
        for r in linear_quality_score(batch, "text", "doc_id").collect()
    }
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        linear_quality_score(stream, "text", "doc_id")
        .writeStream.format("memory")
        .queryName("quality_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), q.exception()
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["keep"])
        for r in spark.sql("SELECT * FROM quality_sink").collect()
    }
    assert got == expected


def test_stream_minhash_neardup_incremental(spark, tmp_path_factory):
    """Incremental near-dup (streaming/neardup.py): batch 2's duplicates
    are detected against keeper STATE left by batch 1 — the property a
    batch self-join can't give a continuous ingest. Also pins: keeper =
    first id, within-batch pairs found, non-dups silent, and the sink
    needs only a distinct to match the batch LSH candidate set."""
    import pandas as pd

    from squirreling_spark.streaming.neardup import stream_minhash_neardup

    base = tmp_path_factory.mktemp("mh_stream")
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different content about spark streaming state"
    text_c = "unrelated third topic with its own vocabulary entirely here"
    stage0 = [(1, text_a), (2, text_b), (3, text_a + " extra")]
    stage1 = [(101, text_a), (102, text_c)]
    spark.createDataFrame(stage0, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(base / "s0"))
    spark.createDataFrame(stage1, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(base / "s1"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base) + "/*")
    )
    pairs = stream_minhash_neardup(stream, "text", "doc_id")
    q = (
        pairs.writeStream.format("memory")
        .queryName("mh_neardup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), q.exception()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM mh_neardup_sink"
        ).collect()
    }
    # cross-batch: 101 (stage 1) pairs with keeper 1 (stage 0 state);
    # within-batch: 3 pairs with 1. No pair involves 2 or 102.
    assert (1, 101) in got
    assert (1, 3) in got
    assert all(2 not in p and 102 not in p for p in got), got


def test_stream_minhash_neardup_ttl_expires_cold_buckets(
    spark, tmp_path_factory
):
    """ttl_ms bounds keeper state: a bucket that sees no arrivals for a
    micro-batch beyond the ttl is dropped (hasTimedOut → state.remove),
    so a later duplicate starts a FRESH bucket instead of pairing with
    expired history. Three ordered batches: doc 1 seeds the bucket;
    batch 2 (unrelated doc) trips the timeout sweep; doc 201 (same text
    as 1) then arrives into empty state — no (1, 201) pair."""
    from squirreling_spark.streaming.neardup import stream_minhash_neardup

    base = tmp_path_factory.mktemp("mh_stream_ttl")
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different content about spark streaming state"
    stages = [[(1, text_a)], [(2, text_b)], [(201, text_a), (202, text_a)]]
    for i, rows in enumerate(stages):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(base / f"s{i}"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base) + "/*")
    )
    pairs = stream_minhash_neardup(stream, "text", "doc_id", ttl_ms=1)
    q = (
        pairs.writeStream.format("memory")
        .queryName("mh_neardup_ttl_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # A ProcessingTimeTimeout stream never self-terminates — Spark keeps
    # scheduling batches because a later processing time could fire more
    # timers (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    # unconditionally true under this timeout mode), so availableNow
    # can't drain to completion. Poll the sink for the batch-3 marker
    # pair, then stop.
    import time as _time

    def _got():
        return {
            (r["id_a"], r["id_b"])
            for r in spark.sql(
                "SELECT DISTINCT id_a, id_b FROM mh_neardup_ttl_sink"
            ).collect()
        }

    deadline = _time.time() + 300
    got = _got()
    while (201, 202) not in got and _time.time() < deadline:
        assert q.exception() is None, q.exception()
        _time.sleep(2)
        got = _got()
    q.stop()
    # doc 1's bucket expired before batch 3: 201 re-seeds it and pairs
    # only with its within-batch duplicate 202.
    assert (201, 202) in got, got
    assert all(p[0] != 1 for p in got), got


def test_session_window_exact_gap_merges(spark):
    """Pin the boundary rule the events_session_stream oracle encodes: a
    gap EXACTLY equal to the threshold still MERGES (session windows
    [t, t+gap) that touch are coalesced) — the same strictly-greater
    new-session predicate as the lag-based batch sessionize; one past the
    threshold splits."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),  # == gap -> merges
        (1, t0 + dt.timedelta(minutes=60, seconds=1)),  # > gap -> new
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("s.start")
        .collect()
    )
    assert [r["n"] for r in out] == [2, 1]
    assert out[0]["s"]["end"] == t0 + dt.timedelta(minutes=60)


def test_debounce_stream_chained_semantics(spark, events_dir):
    """Chained (gap-from-last-KEPT) debounce: stream drain must equal a
    Python replay of the iterative contract — which differs from the
    batch lag-throttle whenever a dropped event would have reset the
    one-lag gap."""
    from squirreling_spark.streaming.windows import debounce_stream

    gap = 4 * 3600 * 1_000_000  # 4h: dense enough at sf0.001 to drop rows
    batch_df = spark.read.parquet(events_dir)
    rows = batch_df.select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("us"),
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r["user_id"], r["event_type"]), []).append(
            (r["us"], r["event_id"])
        )
    expected = set()
    for evs in by_key.values():
        last = None
        for us, eid in sorted(evs):
            if last is None or us - last >= gap:
                expected.add(eid)
                last = us
    stream = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    got_df = _run_stream(
        spark, debounce_stream(stream, gap), "debounce_sink", mode="append"
    )
    got = {r["event_id"] for r in got_df.collect()}
    assert got == expected and 0 < len(got) < len(rows)


def test_debounce_stream_multi_chunk_group_order(spark, tmp_path_factory):
    """A key whose micro-batch exceeds the Arrow batch size arrives at
    the state function as SEVERAL pandas chunks; the chained decision
    must still run in global (ts, event_id) order (r9 advice: per-chunk
    sorts silently dropped events that sorted before an already-kept
    later chunk). 64 events 1h apart, written ts-DESCENDING, Arrow
    batches of 16: every event is >= 30s from its predecessor, so the
    correct debounce keeps ALL of them."""
    import datetime as dt

    from squirreling_spark.streaming.windows import debounce_stream

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "click", i, t0 + dt.timedelta(hours=63 - i)) for i in range(64)
    ]
    schema = "user_id long, event_type string, event_id long, ts timestamp"
    path = str(tmp_path_factory.mktemp("debounce_chunks") / "events")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = spark.readStream.schema(schema).parquet(path)
        out = _run_stream(
            spark,
            debounce_stream(stream, 30_000_000),
            "debounce_chunks_sink",
            mode="append",
        )
        assert {r["event_id"] for r in out.collect()} == set(range(64))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_debounce_stream_evicts_idle_keys(spark, tmp_path_factory):
    """Keyed debounce state is bounded by ACTIVE keys: once the
    watermark passes a key's last_kept + min_gap the event-time timeout
    removes its row. Three ordered micro-batches; key A goes idle after
    batch 1 and must be GONE from the state store by the final batch,
    while the kept set still matches the Python replay of the chained
    contract over the full event sequence."""
    import datetime as dt
    import json

    from squirreling_spark.streaming.windows import debounce_stream

    gap_us = 3_600_000_000  # 1h
    t0 = dt.datetime(2024, 1, 1)
    hours = dt.timedelta(hours=1)
    schema = "user_id long, event_type string, event_id long, ts timestamp"
    # (user A=1, B=2, C=3); A's 2nd event is 20min after its 1st -> drop
    stages = [
        [(1, "click", 10, t0), (1, "click", 11, t0 + dt.timedelta(minutes=20)),
         (2, "click", 20, t0)],
        [(2, "click", 21, t0 + 3 * hours)],
        [(3, "click", 30, t0 + 4 * hours)],
    ]
    base = tmp_path_factory.mktemp("debounce_evict")
    for i, batch_rows in enumerate(stages):
        spark.createDataFrame(batch_rows, schema).coalesce(1).write.parquet(
            str(base / f"s{i}")
        )
    replay_kept = set()
    for key in {(r[0], r[1]) for st in stages for r in st}:
        last = None
        evs = sorted(
            (r[3], r[2]) for st in stages for r in st if (r[0], r[1]) == key
        )
        for ts, eid in evs:
            us = int(ts.timestamp() * 1_000_000)
            if last is None or us - last >= gap_us:
                replay_kept.add(eid)
                last = us

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base) + "/*")
    )
    q = (
        debounce_stream(stream, gap_us, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("debounce_evict_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), q.exception()
    progresses = [json.loads(p.json) for p in q.recentProgress]
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progresses
        if p.get("stateOperators")
    ]
    got = {
        r["event_id"]
        for r in spark.sql("SELECT * FROM debounce_evict_sink").collect()
    }
    assert got == replay_kept, (got, replay_kept)
    # 3 keys existed over the stream's lifetime; A (timeout t0+1h) is
    # evicted once the watermark (t0+3h - 10min after batch 2) passes it,
    # so the final state holds only B and C.
    assert state_rows and state_rows[-1] == 2, state_rows


def test_streaming_hll_matches_batch(spark, events_dir):
    """HLL registers are a plain groupBy-max, so the sketch builds
    unmodified under Structured Streaming with state bounded by
    m x groups (the whole point of sketching distincts on an unbounded
    stream): availableNow drain must equal the batch registers
    cell-for-cell, and thus the identical estimate."""
    from squirreling_spark.pipeline.sketch import hll_registers

    batch = spark.read.parquet(events_dir)
    expected = {
        (r["event_type"], r["bucket"]): r["max_rho"]
        for r in hll_registers(
            batch, "user_id", p=8, group_cols=("event_type",)
        ).collect()
    }
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    got_df = _run_stream(
        spark,
        hll_registers(stream, "user_id", p=8, group_cols=("event_type",)),
        "hll_sink",
    )
    got = {
        (r["event_type"], r["bucket"]): r["max_rho"]
        for r in got_df.collect()
    }
    assert got == expected
    assert len(got) <= 256 * batch.select("event_type").distinct().count()


def test_streaming_langid_matches_batch(spark, tmp_path_factory):
    """Language ID is one stateless codegen projection, so it routes a
    document STREAM with zero state: availableNow drain must equal the
    batch predictions row-for-row (the per-language routing stage of a
    continuous-ingest pipeline)."""
    from squirreling_spark.pipeline.classify import langid_ngram
    from squirreling_spark.qutil import t

    path = str(tmp_path_factory.mktemp("docs_lid_stream") / "docs")
    docs = t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    docs.write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)
    expected = {
        r["doc_id"]: (r["lang_pred"], r["score"], r["n_grams"])
        for r in langid_ngram(batch).collect()
    }
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got_df = _run_stream(
        spark, langid_ngram(stream), "langid_sink", mode="append"
    )
    got = {
        r["doc_id"]: (r["lang_pred"], r["score"], r["n_grams"])
        for r in got_df.collect()
    }
    assert got == expected and len(got) > 0


def test_stateful_counter_ttl_restarts_idle_users(spark, tmp_path_factory):
    """ttl_ms bounds counter state: a user idle past the ttl is dropped,
    so their next event restarts the count at 1 instead of resuming —
    the explicit bounded-state trade (default NoTimeout stays exact).
    Mirrors the neardup ttl test: ProcessingTimeTimeout streams never
    self-terminate under availableNow, so poll the sink."""
    import time as _time

    from squirreling_spark.streaming.windows import stateful_user_counter

    base = tmp_path_factory.mktemp("counter_ttl")
    schema = "user_id long, event_type string, event_id long, ts timestamp"
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    stages = [
        [(1, "click", 10, t0), (1, "click", 11, t0)],  # A count -> 2
        [(2, "click", 20, t0)],                        # trips timeout sweep
        [(1, "click", 12, t0)],                        # A returns
    ]
    for i, rows in enumerate(stages):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(base / f"s{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base) + "/*")
    )
    q = (
        stateful_user_counter(stream, ttl_ms=1)
        .writeStream.format("memory")
        .queryName("counter_ttl_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )

    def rows():
        return [
            (r["user_id"], r["total_events"])
            for r in spark.sql("SELECT * FROM counter_ttl_sink").collect()
        ]

    deadline = _time.time() + 300
    while rows().count((1, 1)) == 0 and _time.time() < deadline:
        assert q.exception() is None, q.exception()
        _time.sleep(2)
    got = rows()
    q.stop()
    # A's state expired between batches 1 and 3: the return emits a
    # RESTARTED count of 1 (never 3); the pre-expiry count of 2 stands.
    assert (1, 2) in got and (1, 1) in got and (1, 3) not in got, got


def test_sketch_stream_hll_and_quantile_match_batch(spark, events_dir):
    """sketch_stream (r10 verdict task 7): update-mode register
    maintenance over a file stream, forced through MULTIPLE micro-batches
    (maxFilesPerTrigger=1) so the monotone-merge contract is actually
    exercised — sketch_stream_table must equal the batch registers
    cell-for-cell for both the HLL and quantile kinds, and thus identical
    estimates/quantiles."""
    from squirreling_spark.pipeline.sketch import (
        hll_registers,
        qsketch_build,
        sketch_stream,
        sketch_stream_table,
    )

    batch = spark.read.parquet(events_dir)

    def stream():
        return (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )

    q = sketch_stream(
        stream(), "hll", "user_id", "hll_live", group_cols=("event_type",)
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["bucket"]): r["max_rho"]
        for r in sketch_stream_table(spark, "hll_live", "hll").collect()
    }
    expected = {
        (r["event_type"], r["bucket"]): r["max_rho"]
        for r in hll_registers(
            batch, "user_id", p=8, group_cols=("event_type",)
        ).collect()
    }
    assert got == expected and len(got) > 0

    q2 = sketch_stream(
        stream().selectExpr("event_type", "CAST(floor(value * 1000) AS LONG) AS mv"),
        "quantile",
        "mv",
        "q_live",
        group_cols=("event_type",),
    )
    q2.awaitTermination(120)
    got_q = {
        (r["event_type"], r["bid"]): r["cnt"]
        for r in sketch_stream_table(spark, "q_live", "quantile").collect()
    }
    exp_q = {
        (r["event_type"], r["bid"]): r["cnt"]
        for r in qsketch_build(
            batch.selectExpr(
                "event_type", "CAST(floor(value * 1000) AS LONG) AS mv"
            ),
            "mv",
            b=4,
            group_cols=("event_type",),
        ).collect()
    }
    assert got_q == exp_q and len(got_q) > 0


def test_sketch_stream_cms_kind_matches_batch(spark, events_dir):
    """The CMS kind of sketch_stream: cell counts are monotone running
    totals under update mode, so the recovered cell table must equal the
    batch sketch cell-for-cell — and any later cms_estimate over it
    gives identical heavy-hitter counts."""
    from squirreling_spark.pipeline.sketch import (
        cms_build,
        sketch_stream,
        sketch_stream_table,
    )

    batch = spark.read.parquet(events_dir)
    q = sketch_stream(
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir),
        "cms",
        "event_type",
        "cms_live",
        width=1024,
        depth=3,
    )
    q.awaitTermination(120)
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sketch_stream_table(spark, "cms_live", "cms").collect()
    }
    expected = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(
            batch.selectExpr("event_type AS _k"), "_k", width=1024, depth=3
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_sketch_stream_table_sink_all_kinds_match_batch(
    spark, events_dir, tmp_path
):
    """The PRODUCTION sketch sink (r11 verdict task 1): sink="table"
    maintains a keyed catalog table via stateless foreachBatch merge
    (HLL: MAX, CMS/quantile: SUM) — forced through multiple micro-batches
    (maxFilesPerTrigger=1) the drained table must equal the batch sketch
    cell-for-cell for ALL THREE kinds, with zero streaming-state rows."""
    from squirreling_spark.pipeline.sketch import (
        cms_build,
        hll_registers,
        qsketch_build,
        sketch_stream,
        sketch_table,
    )

    batch = spark.read.parquet(events_dir)

    def stream():
        return (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )

    cases = {
        "hll": dict(
            key_col="user_id",
            kwargs=dict(group_cols=("event_type",)),
            expected=lambda: hll_registers(
                batch, "user_id", p=8, group_cols=("event_type",)
            ),
            key=lambda r: (r["event_type"], r["bucket"]),
            val=lambda r: r["max_rho"],
        ),
        "cms": dict(
            key_col="event_type",
            kwargs=dict(width=1024, depth=3),
            expected=lambda: cms_build(
                batch.selectExpr("event_type AS _k"),
                "_k",
                width=1024,
                depth=3,
            ),
            key=lambda r: (r["row"], r["bucket"]),
            val=lambda r: r["cnt"],
        ),
        "quantile": dict(
            key_col="CAST(floor(value * 1000) AS LONG)",
            kwargs=dict(group_cols=("event_type",)),
            expected=lambda: qsketch_build(
                batch, "CAST(floor(value * 1000) AS LONG)",
                b=4, group_cols=("event_type",),
            ),
            key=lambda r: (r["event_type"], r["bid"]),
            val=lambda r: r["cnt"],
        ),
    }
    for kind, c in cases.items():
        tbl = f"sketch_tbl_{kind}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        q = sketch_stream(
            stream(),
            kind,
            c["key_col"],
            tbl,
            sink="table",
            checkpoint_dir=str(tmp_path / f"ck_{kind}"),
            **c["kwargs"],
        )
        q.awaitTermination(120)
        assert q.exception() is None, q.exception()
        # stateless: the state store moved ZERO rows in every batch
        for pr in q.recentProgress:
            for so in pr["stateOperators"]:
                assert so["numRowsTotal"] == 0
        got = {c["key"](r): c["val"](r) for r in sketch_table(spark, tbl).collect()}
        exp = {c["key"](r): c["val"](r) for r in c["expected"]().collect()}
        assert got == exp and len(got) > 0, kind
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_sketch_stream_table_sink_skips_replayed_epochs(spark, tmp_path):
    """Idempotence under foreachBatch's at-least-once contract: applying
    the same epoch twice must fold it in exactly once (the SUM-merge
    kinds would otherwise double-count)."""
    from squirreling_spark.pipeline.sketch import (
        _sketch_table_merge,
        qsketch_build,
        sketch_table,
    )

    tbl = "sketch_tbl_replay"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    merge = _sketch_table_merge("quantile", "v", tbl, (), 8, 8192, 5, 4)
    b1 = spark.createDataFrame([(1,), (2,), (300,)], "v long")
    b2 = spark.createDataFrame([(2,), (4000,)], "v long")
    merge(b1, 0)
    merge(b2, 1)
    merge(b2, 1)  # redelivery: must be skipped whole
    merge(b1, 0)  # stale redelivery after later epochs: also skipped
    got = {
        r["bid"]: r["cnt"] for r in sketch_table(spark, tbl).collect()
    }
    exp = {
        r["bid"]: r["cnt"]
        for r in qsketch_build(b1.union(b2), "v", b=4).collect()
    }
    assert got == exp
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_table_sink_registers_compose_with_overlap(spark, events_dir, tmp_path):
    """End-to-end production shape: a sink="table" HLL stream maintains
    the register table; hll_pairwise_overlap consumes THAT table (not a
    batch rebuild) and must produce exactly the batch overlap estimates —
    the continuous-monitoring loop (stream -> keyed register table ->
    register algebra) with no batch rescan anywhere."""
    from pyspark.sql import functions as F

    from squirreling_spark.pipeline.sketch import (
        hll_pairwise_overlap,
        hll_registers,
        sketch_stream,
        sketch_table,
    )

    batch = spark.read.parquet(events_dir)
    tbl = "sketch_tbl_compose"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    q = sketch_stream(
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir),
        "hll",
        "user_id",
        tbl,
        group_cols=("event_type",),
        sink="table",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()

    groups = batch.select("event_type").distinct()
    from_stream = hll_pairwise_overlap(
        sketch_table(spark, tbl), groups, "event_type", "type_a", "type_b"
    )
    from_batch = hll_pairwise_overlap(
        hll_registers(batch, "user_id", p=8, group_cols=("event_type",)),
        groups,
        "event_type",
        "type_a",
        "type_b",
    )
    key = lambda r: (r["type_a"], r["type_b"])  # noqa: E731
    got = {key(r): (r["est_a"], r["est_b"], r["est_union"], r["est_overlap"])
           for r in from_stream.collect()}
    exp = {key(r): (r["est_a"], r["est_b"], r["est_union"], r["est_overlap"])
           for r in from_batch.collect()}
    assert got == exp and len(got) > 0
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
