"""Structured Streaming operators over the events stream.

The reference engine's "streaming" is incremental pull-based row delivery
(SURVEY §2.5: no watermarks or event-time semantics). These operators are
the genuine streaming upgrades a Spark-native engine provides — the same
transformations run identically on ``spark.read`` (batch) and
``spark.readStream`` (incremental with state + late-data handling):

- ``tumbling_counts``: per-window per-type counts with a watermark bounding
  state. At 100 TB/day the state is O(windows × types), not O(events).
- ``session_aggregate``: native ``session_window`` (gap-based sessions) —
  the streaming equivalent of queries_pipeline.events_sessionize.
- ``stateful_user_counter``: custom stateful operator via
  ``applyInPandasWithState`` — the escape hatch for semantics the built-in
  operators can't express (reference §2 'custom operators' guidance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts; watermark bounds streaming state."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions per user via native session_window."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup — the stream analogue of
    pipeline/dedup.exact_dedup. ``dropDuplicatesWithinWatermark`` keeps one
    row per key and EXPIRES key state past the watermark, so state is
    O(keys-per-watermark-window), not O(stream history) — the property that
    makes continuous ingest dedup viable at 100 TB/day. On a batch frame it
    degrades to plain dropDuplicates (same semantics, finite input)."""
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


_COUNTER_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("count", LongType())])


def stateful_user_counter(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator: running per-user event count via
    applyInPandasWithState (arbitrary state semantics beyond built-ins).

    State is one bigint per user. A LIFETIME counter is exact only with
    lifetime state, so the default keeps every key (``NoTimeout``);
    ``ttl_ms`` opts into the bounded-state trade for unbounded streams —
    a user idle past the ttl is dropped and RESTARTS at 0 on return
    (idle-horizon counts, the neardup ttl_ms pattern; same caveat:
    ProcessingTimeTimeout streams never self-terminate under
    availableNow, so use ttl on continuous triggers only)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [count]})

    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_COUNTER_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER join: pair each left event with the right-side
    events of the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + max_delay]`` — the click-to-conversion /
    impression-to-action shape.

    Both sides carry a watermark and the join condition bounds the event
    time range, so Spark can expire buffered rows: state is
    O(events-per-watermark-window) per side, never the full history —
    what makes a continuous 100 TB/day correlation job viable. On batch
    frames the same expression runs as a plain join (parity-testable).

    Output: (key, l_ts, l_event_id, l_value, r_ts, r_event_id, r_value).
    """
    l = left.select(
        F.col(key).alias("k"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    r = right.select(
        F.col(key).alias("r_k"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("k") == F.col("r_k"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond).select(
        F.col("k").alias("key"),
        "l_ts",
        "l_event_id",
        "l_value",
        "r_ts",
        "r_event_id",
        "r_value",
    )


def enriched_tumbling(
    events: DataFrame,
    dim: DataFrame,
    on: tuple[str, str],
    enrich_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Stream-static dimension enrichment + tumbling rollup: the standard
    "join the click stream to the user/account dimension, aggregate by
    segment" pipeline. The dimension side is a STATIC (batch) table —
    Spark broadcasts it into every micro-batch with no state, the
    canonical stream-static join (state stays O(windows × segments),
    never O(events) or O(dim)). Identical semantics on a batch frame.

    ``ts_col`` names the event-time column (watermark + window key) and
    ``value_col`` the summed measure; streams with other schemas pass
    their own names."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    lk, rk = on
    joined = src.join(
        F.broadcast(dim.select(F.col(rk), F.col(enrich_col))),
        src[lk] == dim[rk],
    )
    return (
        joined.groupBy(F.window(ts_col, window).alias("w"), enrich_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(enrich_col),
            "n_events",
            "total_value",
        )
    )


_DEBOUNCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
    ]
)
_DEBOUNCE_STATE = StructType([StructField("last_kept_us", LongType())])


def debounce_stream(
    events: DataFrame,
    min_gap_us: int = 30_000_000,
    watermark: str = "2 hours",
) -> DataFrame:
    """TRUE chained debounce over a stream: keep an event iff it arrives
    at least ``min_gap_us`` after the last KEPT event of its
    (user_id, event_type) key.

    This is the iterative contract ``operators/resample.py::throttle``
    documents as streaming-only: every keep decision feeds the next one,
    so a single batch window (one lag) cannot express it — the decision
    chain IS the keyed state, and here that state is ONE bigint per key
    (the last kept event-time).

    State bound: O(ACTIVE keys), not lifetime keys — each key arms an
    event-time timeout at ``last_kept + min_gap_us``; once the watermark
    (``watermark`` behind max event time) passes it, the key's state is
    REMOVED. Eviction is semantics-preserving for watermark-ordered
    input: a key expires only when every future in-watermark event is
    already >= min_gap_us past the last kept one, i.e. would be kept by
    definition — exactly what empty state does. (Events later than the
    watermark allows are the standard Structured Streaming late-data
    trade, as in stream_dedup.)

    Each micro-batch's rows for a key are processed in (ts, event_id)
    order; an event older than the last kept timestamp is dropped by
    contract (a debouncer suppresses bursts — replaying the past must
    not re-trigger it). Output mode: append (kept events only)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # Watermark passed last_kept + min_gap: every future
            # in-watermark event would be kept regardless of this state,
            # so dropping it changes nothing — the eviction that bounds
            # the store to ACTIVE keys.
            state.remove()
            return
        last = state.get[0] if state.exists else None
        kept: dict[str, list] = {
            "user_id": [], "event_type": [], "event_id": [], "ts_us": [],
        }
        # Concatenate ALL Arrow chunks before sorting: a key whose
        # micro-batch exceeds the Arrow batch size arrives as several
        # chunks, and per-chunk sorts would feed the chained keep/drop
        # decision out of (ts, event_id) order (r9 advice).
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                us = pd.Timestamp(ts).value // 1000
                if last is None or us - last >= min_gap_us:
                    kept["user_id"].append(int(key[0]))
                    kept["event_type"].append(key[1])
                    kept["event_id"].append(int(eid))
                    kept["ts_us"].append(int(us))
                    last = us
        if last is not None:
            state.update((int(last),))
            # Arm the eviction timer: fires when the watermark reaches
            # last_kept + min_gap (ms resolution, rounded up; clamped a
            # tick past the current watermark — Spark rejects timestamps
            # at or before it).
            fire_ms = (int(last) + min_gap_us + 999) // 1000
            state.setTimeoutTimestamp(
                max(fire_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(kept)

    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=_DEBOUNCE_SCHEMA,
        stateStructType=_DEBOUNCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
