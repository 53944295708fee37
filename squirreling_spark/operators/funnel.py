"""Ordered-funnel analysis — the product-analytics staple (which users
completed view → click → signup → purchase, in order?): for each user,
step k's timestamp is the FIRST event of step k's type that occurs
strictly after step k-1's chosen event ((ts, event_id) tuple order, so
simultaneous events resolve deterministically).

Spark-first shape: one map-side-combined min-struct aggregate per step,
each joined user-keyed to the previous step's survivors — k small
shuffles over strictly-shrinking per-step tables (never a per-user
sorted event collection, which at 100 TB would buffer unbounded
per-user history). AQE turns the later, tiny steps into broadcasts.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    ord_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user strict-order funnel over ``steps``. Output: (user,
    s<i>_us / s<i>_eid for each step — NULL once the funnel stalls —
    and reached = number of completed steps)."""
    key = F.struct(
        F.unix_micros(F.col(ts_col)).alias("u"),
        F.col(ord_col).cast("bigint").alias("e"),
    )
    users = df.select(F.col(user_col)).distinct()
    # r12 (guide §8 decide with small rows / §5): each step filtered the
    # FULL event frame again — the executed plan ran 11 scans for a
    # 4-step funnel. One narrow (user, type, key) projection restricted
    # to the step types is materialized once; every step reads it.
    # `users` stays on the full frame: users with no funnel events must
    # keep their reached=0 row.
    from squirreling_spark.pipeline.ckpt import truncate_lineage

    base = truncate_lineage(
        df.filter(F.col(type_col).isin(list(steps))).select(
            F.col(user_col), F.col(type_col).alias("__t"), key.alias("__k")
        )
    )
    prev = None
    out = users
    for i, step in enumerate(steps, 1):
        ev = base.filter(F.col("__t") == step).select(
            F.col(user_col), "__k"
        )
        if prev is not None:
            ev = ev.join(prev, user_col).filter(
                F.col("__k") > F.col("__pk")
            )
        got = ev.groupBy(user_col).agg(F.min("__k").alias(f"__k{i}"))
        prev = got.select(
            user_col, F.col(f"__k{i}").alias("__pk")
        )
        out = out.join(got, user_col, "left").select(
            out["*"],
            F.col(f"__k{i}.u").alias(f"s{i}_us"),
            F.col(f"__k{i}.e").alias(f"s{i}_eid"),
        ).drop(f"__k{i}")
    reached = None
    for i in range(1, len(steps) + 1):
        c = F.col(f"s{i}_us").isNotNull().cast("int")
        reached = c if reached is None else reached + c
    return out.withColumn("reached", reached.cast("bigint"))


def session_pattern_match(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    ord_col: str,
    pattern: str,
    gap_us: int = 1800 * 1_000_000,
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex pattern detection over per-session
    event-type sequences. Each session's events (inactivity-gap
    sessionization on ``gap_us``) are rendered — in (ts, ord) order — as
    a string of event-type initials, and ``pattern`` (a regex over those
    initials, e.g. ``v c+ p`` as ``'vc+p'``) is matched against it.

    Output: (user, session_seq, n_events, seq, matched, has_match) —
    ``matched`` is the first matching substring (NULL when none), the
    analytics answer to "which sessions contain this behavioral motif".

    Scale shape: the only shuffles are the per-user window (sessionize)
    and a groupBy (user, session). A session's event list is bounded by
    the inactivity gap — the collected sequence string is small by
    construction (this is the one place collecting is correct: the regex
    needs the ordered sequence, and sessions are bounded). The regex
    runs JVM-side per session row.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, ord_col)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    sess = df.withColumn(
        "session_seq",
        F.sum(is_new)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint"),
    ).select(
        F.col(user_col),
        F.col(type_col),
        us.alias("_us"),
        F.col(ord_col).cast("bigint").alias("_ord"),
        "session_seq",
    )
    # sort_array on (us, ord, initial) structs -> deterministic sequence
    seq = F.concat_ws(
        "",
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_us").alias("u"),
                        F.col("_ord").alias("o"),
                        F.substring(F.col(type_col), 1, 1).alias("c"),
                    )
                )
            ),
            lambda s: s["c"],
        ),
    )
    grouped = sess.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        seq.alias("seq"),
    )
    extracted = F.regexp_extract(F.col("seq"), pattern, 0)
    return grouped.select(
        user_col,
        "session_seq",
        "n_events",
        "seq",
        F.when(F.col("seq").rlike(pattern), extracted).alias("matched"),
        F.col("seq").rlike(pattern).cast("bigint").alias("has_match"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort-retention matrix — funnel analysis's companion
    product-analytics staple: users are cohorted by the ISO week of
    their FIRST event; retention at offset k is how many of them were
    active k weeks later.

    Integer-exact: both engines date_trunc to ISO Monday weeks and the
    offset is a pure microsecond difference divided by a constant —
    never calendar arithmetic on the pair. Distributed shape: one
    first-event aggregate, one distinct (user, week) projection (both
    map-combined user-keyed), one join back, one matrix aggregate —
    everything shrinks toward |cohorts × offsets|.

    Output: (cohort_week, week_offset, n_active, n_cohort,
    retention_ppm)."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = df.groupBy(user_col).agg(
        F.min(wk).alias("cohort_week")
    )
    active = df.select(
        F.col(user_col), wk.alias("week")
    ).distinct()
    j = active.join(first, user_col).select(
        "cohort_week",
        (
            (F.unix_micros("week") - F.unix_micros("cohort_week"))
            / F.lit(7 * 86_400 * 1_000_000)
        )
        .cast("bigint")
        .alias("week_offset"),
        F.col(user_col),
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    return (
        j.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.expr(
                "CAST(n_active * 1000000 div n_cohort AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )
