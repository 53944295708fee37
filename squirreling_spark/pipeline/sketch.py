"""Count-min sketch (Cormode & Muthukrishnan 2005) — bounded-state
frequency estimation for heavy-hitter / top-terms queries at corpus
scale.

Why a sketch when Spark can groupBy-count exactly: the sketch's state is
``depth × width`` counters REGARDLESS of input size or key cardinality.
At 100 TB that means (a) the frequency summary of a whole corpus fits in
one broadcast (d·w cells, e.g. 5×16384 = 80k rows) and can be joined
against any later candidate set without rescanning the corpus; (b)
sketches of shards/days merge by cell-wise addition (counter arrays are
linear), so incremental corpus monitoring never reprocesses history; (c)
the same pass extends to Structured Streaming, where unbounded distinct
keys would otherwise grow state without limit.

Spark-first shape: each key row expands to ``depth`` (row, bucket) pairs
via ``inline`` of a literal struct array (row-local), then ONE
map-side-combining groupBy — partial aggregation collapses the expansion
to ≤ d·w cells per task before the shuffle, so the exchange carries
sketch cells, not data rows. Estimation joins candidates against the
broadcast sketch on the d bucket coordinates and takes the min.

Determinism: buckets are md5-derived (``md5(i ':' key)`` folded to 48
bits, mod width) — no seed state to ship, and bit-identical in any
engine, which is how the DuckDB oracle replays the sketch cell-for-cell.
The CMS guarantee (estimate ≥ true count, ≤ true + εN w.h.p.) is pinned
as a property test in tests/test_sketch.py.

No reference counterpart (squirreling has no sketches); public-knowledge
design only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 48-bit md5 fold of "i:key" mod width — the i-th hash row's bucket.
_BUCKET = (
    "CAST(conv(substring(md5(concat(CAST({i} AS STRING), ':', {key})),"
    " 1, 12), 16, 10) AS BIGINT) % {w}"
)


def cms_build(
    df: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> DataFrame:
    """(row, bucket, cnt) — the sketch as a relation of ≤ depth·width
    cells. One pass, map-side combined; merging two sketches is a
    UNION ALL + re-aggregate of d·w-cell frames."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                F.expr(
                    _BUCKET.format(i=i, key=key_col, w=width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.inline(pairs))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    key_col: str,
    width: int = 8192,
    depth: int = 5,
) -> DataFrame:
    """candidates + (cms_count) — the min over the depth hash rows of the
    candidate's cell counters. The sketch (≤ d·w rows) broadcasts; a
    missing cell means no key ever hashed there, so its counter is 0."""
    coords = candidates.select(
        "*",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        F.expr(
                            _BUCKET.format(i=i, key=key_col, w=width)
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ),
    )
    keep = [c for c in candidates.columns]
    return (
        coords.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(*keep)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_count")
        )
    )


def cms_top_terms(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    width: int = 8192,
    depth: int = 5,
    exhibit: bool = False,
    phi_ppm: int = 500,
) -> DataFrame:
    """Heavy-hitter terms from the sketch alone (default): (term,
    cms_count) for the top-``k`` terms among those whose sketched count
    clears ``phi_ppm`` parts-per-million of the total token count — the
    classic CMS φ-heavy-hitter contract. The CMS one-sided guarantee
    (estimate ≥ true count) means no true φ-heavy term can be filtered
    out. This is the scale-default plan (r10 verdict): the only
    term-keyed shuffle is over the φ-survivors — every token is scored
    against the BROADCAST sketch (width-row wide form, one broadcast
    hash join per hash row, all row-local), so no full-keyspace
    count/distinct ever runs.

    ``exhibit=True`` restores the gate-exhibit form: exact top-``k`` by
    full count (a full term-keyed shuffle — fixture-scale only) with
    (term, exact_count, cms_count, overcount) columns demonstrating the
    guarantee (cms_count ≥ exact_count; equality when width ≫ distinct)."""
    from squirreling_spark.pipeline.text import tokens

    toks = df.select(
        F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    sketch = cms_build(toks, "term", width=width, depth=depth)
    if exhibit:
        top = (
            toks.groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
            .orderBy(F.desc("exact_count"), "term")
            .limit(k)
        )
        est = cms_estimate(top, sketch, "term", width=width, depth=depth)
        return est.select(
            "term",
            "exact_count",
            "cms_count",
            (F.col("cms_count") - F.col("exact_count")).alias("overcount"),
        )
    # width-row wide form of the sketch: (bucket, c0..c{d-1}); missing
    # cells mean no key hashed there -> 0. The wide table is referenced
    # depth+1 times (one broadcast per hash row + the total) — truncate
    # its lineage so the corpus-scan/sketch subtree is computed ONCE, not
    # re-inlined per reference (<= width rows, trivially materializable).
    wide = sketch.groupBy("bucket").agg(
        *[
            F.max(F.when(F.col("row") == i, F.col("cnt"))).alias(f"_c{i}")
            for i in range(depth)
        ]
    ).localCheckpoint(eager=False)
    # row-0 cells partition the token stream, so their sum is the total
    total = wide.agg(
        F.sum(F.coalesce("_c0", F.lit(0))).cast("bigint").alias("_n_total")
    )
    scored = toks.select(
        "term",
        *[
            F.expr(_BUCKET.format(i=i, key="term", w=width)).alias(f"_b{i}")
            for i in range(depth)
        ],
    ).crossJoin(F.broadcast(total))
    for i in range(depth):
        w_i = wide.select(
            F.col("bucket").alias(f"_k{i}"), F.col(f"_c{i}")
        )
        scored = scored.join(
            F.broadcast(w_i),
            F.col(f"_b{i}") == F.col(f"_k{i}"),
            "left",
        )
    est = F.least(
        *[F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(depth)]
    ).cast("bigint")
    heavy = scored.where(
        est >= F.expr(f"(_n_total * {phi_ppm}) div 1000000")
    )
    return (
        heavy.groupBy("term")
        .agg(F.max(est).alias("cms_count"))
        .orderBy(F.desc("cms_count"), "term")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) — bounded-state
# DISTINCT counting, the cardinality sibling of the CMS above. At 100 TB,
# exact count-distinct shuffles every key; the HLL register table is
# 2^p rows per group REGARDLESS of cardinality, merges across
# shards/days/streams by cell-wise MAX (registers are a max-lattice), and
# the same groupBy-max runs under Structured Streaming with state bounded
# by m x groups.
#
# Determinism (the repo's sketch policy): the 60-bit value of a key is an
# md5 hex fold — no seed, bit-identical in any engine (verified: Spark
# conv() == DuckDB instr-fold) — the high p bits select the register, and
# rho = leading-zero count of the low (60-p)-bit field + 1 computes
# integrally via length(bin(rem)) (both engines print minimal binary).
# The raw estimate alpha_m * m^2 / sum(2^-M_j) is evaluated EXACTLY:
# 2^-M_j terms are scaled to integers at 2^(w+1), alpha_m = 0.7213 /
# (1 + 1.079/m) is carried as the rational 7213*m / (10*(1000m+1079)),
# and the one division is a floor div of DECIMAL(38,0) products — so the
# estimate (not just the registers) hash-matches cross-engine. No
# small-range (linear-counting) correction: the REGISTERS are the sketch
# and corrections are a consumer-side choice that would add nothing to
# the engine contract; accuracy at n >> m is pinned by a property test
# (standard error ~= 1.04/sqrt(m)).
# ---------------------------------------------------------------------------

_HLL_VAL = (
    "CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT)"
)


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group..., bucket, max_rho): HLL registers over ``key_col`` with
    2^p buckets per group. One row-local projection + ONE map-combined
    groupBy — the exchange carries at most 2^p rows per group per task,
    never data rows. Registers merge across runs by groupBy-max."""
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} outside [4, 16]")
    w = 60 - p
    val = _HLL_VAL.format(key=key_col)
    bucket = f"({val} div {1 << w})"
    rem = f"({val} % {1 << w})"
    rho = (
        f"CAST(CASE WHEN {rem} = 0 THEN {w + 1}"
        f" ELSE {w} - length(bin({rem})) + 1 END AS INT)"
    )
    # NULL keys would register a (bucket NULL, max_rho NULL) row: F.max
    # ignores NULLs but hll_estimate's count(*) would count the row,
    # inflating n_buckets and dropping a 2^(w+1) term from the harmonic
    # denominator. COUNT(DISTINCT) ignores NULLs, so the sketch must too
    # (r10 advice; hll_registers_sql carries the same WHERE).
    df = df.where(F.expr(f"({key_col}) IS NOT NULL"))
    return df.groupBy(
        *group_cols, F.expr(bucket).cast("int").alias("bucket")
    ).agg(F.max(F.expr(rho)).alias("max_rho"))


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    group_cols: tuple[str, ...] = (),
    corrected: bool = False,
) -> DataFrame:
    """(group..., est_distinct, n_buckets): raw integer-exact HLL
    estimate from a register table. Missing registers (buckets never
    hit) contribute 2^-0 = 1 to the harmonic sum, folded in as
    (m - n_buckets) at the 2^(w+1) integer scale.

    ``corrected=True`` applies Flajolet et al. 2007's small-range
    correction consumer-side: when the raw estimate is <= 5m/2 and some
    buckets are empty, linear counting ``round(m * ln(m / (m -
    n_buckets)))`` replaces it — far more accurate at n < m, where the
    raw harmonic estimate is biased low. The corrected branch uses
    floating-point ln so it is NOT part of the cross-engine integer hash
    contract (the registers and the raw estimate are); accuracy is
    pinned by tests/test_sketch.py."""
    m = 1 << p
    w = 60 - p
    scale = 1 << (w + 1)  # 2^-rho terms scaled integral (rho <= w+1)
    num = 7213 * m * m * m * scale  # alpha_num * m^2 * scale
    den_c = 10 * (1000 * m + 1079)  # alpha denominator, rationalized
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - max_rho)")
        ).cast("bigint").alias("_hit_sum"),
    )
    raw = (
        f"CAST(CAST({num} AS DECIMAL(38,0)) div"
        f" (CAST({den_c} AS DECIMAL(38,0))"
        f" * (({m} - n_buckets) * CAST({scale} AS BIGINT) + _hit_sum))"
        " AS BIGINT)"
    )
    if corrected:
        est = (
            f"CASE WHEN {raw} <= {5 * m} div 2 AND n_buckets < {m}"
            f" THEN CAST(round({m} * ln({m} / CAST({m} - n_buckets"
            f" AS DOUBLE))) AS BIGINT)"
            f" ELSE {raw} END"
        )
    else:
        est = raw
    return agg.select(
        *group_cols,
        F.expr(est).alias("est_distinct"),
        "n_buckets",
    )


def hll_registers_sql(table: str, key_col: str, group_col: str, p: int = 8) -> str:
    """DuckDB SELECT producing the ({group_col}, bucket, max_rho)
    register table of hll_registers over ``table`` — the composable
    half of the oracle (consumers can max-merge these across groups)."""
    w = 60 - p
    return f"""
      SELECT {group_col}, val // {1 << w} AS bucket,
             max(CASE WHEN val % {1 << w} = 0 THEN {w + 1}
                 ELSE {w} - length(bin(val % {1 << w})) + 1 END) AS max_rho
      FROM (
        SELECT {group_col},
               list_sum(list_transform(generate_series(1, 15),
                 i -> (instr('0123456789abcdef',
                             md5(CAST({key_col} AS VARCHAR))[i]) - 1)::BIGINT
                      << (4 * (15 - i))))::BIGINT AS val
        FROM {table}
        WHERE ({key_col}) IS NOT NULL)
      GROUP BY 1, 2
    """


def hll_estimate_sql(registers: str, group_col: str, p: int = 8) -> str:
    """DuckDB SELECT replaying hll_estimate over a register relation
    (a CTE name or parenthesized subquery) — same integer constants as
    the Spark side (single source of truth)."""
    m = 1 << p
    w = 60 - p
    scale = 1 << (w + 1)
    num = 7213 * m * m * m * scale
    den_c = 10 * (1000 * m + 1079)
    return f"""
      SELECT {group_col},
             CAST({num}::HUGEINT // ({den_c}::HUGEINT
                  * (({m} - count(*)) * {scale}::HUGEINT
                     + sum((1::BIGINT << ({w + 1} - max_rho))::HUGEINT)))
               AS BIGINT) AS est_distinct,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM {registers} GROUP BY 1
    """


def hll_oracle_sql(
    table: str,
    key_col: str,
    group_col: str,
    p: int = 8,
) -> str:
    """DuckDB replay of hll_registers + hll_estimate over ``table``,
    built from the same integer constants (single source of truth)."""
    return f"""
    WITH r AS ({hll_registers_sql(table, key_col, group_col, p)})
    {hll_estimate_sql("r", group_col, p)}
    """


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch (HdrHistogram-style exponent+linear
# bucketing — Tene's HdrHistogram spec; same guarantee family as DDSketch,
# Masson, Rim & Lee, VLDB 2019) — the QUANTILE leg of the sketch family:
# CMS answers "how often", HLL answers "how many distinct", this answers
# "how is it distributed" with bounded state and NO full sort.
#
# State: integer values bucket into sign x (octave, 2^b linear
# sub-buckets) — at most ~2(64-b)·2^b buckets per group REGARDLESS of
# input size (b=4: ≤ ~1.9k, typically a few hundred), so a corpus-wide
# doc-length/score profile is a broadcastable relation. Sketches merge
# across shards/days/streams by bucket-wise SUM (counters are linear),
# and the same groupBy-sum runs under Structured Streaming.
#
# Determinism (the repo's sketch policy): bucket ids derive from
# length(bin(v)) — integer-exact and bit-identical in Spark and DuckDB
# (the proven bin() equivalence) — and quantile ranks are ceil(q·n)
# computed as rational integer arithmetic, so the DuckDB oracle replays
# sketch, ranks, and quantile picks value-for-value. Guarantee: the true
# q-quantile v* lies in [q_lo, q_hi] of the reported bucket, and bucket
# RELATIVE width is ≤ 2^-(b) (half-width 2^-(b+1) ≈ 3.1% at b=4);
# values |v| < 2^b+1... small values bucket EXACTLY (width-1 buckets
# below 2^(b+1)). Contract: |v| < 2^62; NULLs are ignored (aggregate
# semantics). Property tests: tests/test_sketch.py.
# ---------------------------------------------------------------------------


def _qs_bid_sql(v: str, b: int, spark_dialect: bool) -> str:
    """Bucket id of BIGINT expression ``v`` (monotonic in v): small
    |v| < 2^(b+1) map to themselves (exact); larger |v| to
    (octave - b)·2^b + top-(b+1)-bit mantissa, sign-mirrored."""
    two_b = 1 << b
    small = 1 << (b + 1)
    shl = "shiftleft(CAST(1 AS BIGINT), {n})" if spark_dialect else "(1::BIGINT << ({n}))"
    div = "div" if spark_dialect else "//"
    a = f"abs({v})"
    e = f"(length(bin({a})) - 1)"
    # greatest(...) keeps the shift arg non-negative even if an engine
    # evaluates the not-taken CASE branch vectorized
    mant = f"({a} {div} {shl.format(n=f'greatest({e} - {b}, 0)')})"
    bid_abs = (
        f"(CASE WHEN {a} < {small} THEN {a}"
        f" ELSE ({e} - {b}) * {two_b} + {mant} END)"
    )
    return f"(CASE WHEN {v} < 0 THEN -{bid_abs} ELSE {bid_abs} END)"


def _qs_bounds_sql(bid: str, b: int, spark_dialect: bool) -> tuple[str, str]:
    """(lo, hi) integer value bounds of bucket ``bid`` — the exact
    inverse of _qs_bid_sql's forward map."""
    two_b = 1 << b
    small = 1 << (b + 1)
    shl = "shiftleft(CAST(1 AS BIGINT), {n})" if spark_dialect else "(1::BIGINT << ({n}))"
    div = "div" if spark_dialect else "//"
    ab = f"abs({bid})"
    j = f"({ab} {div} {two_b})"
    m = f"({ab} - ({j} - 1) * {two_b})"
    lo_abs = (
        f"(CASE WHEN {ab} < {small} THEN {ab}"
        f" ELSE {m} * {shl.format(n=f'greatest({j} - 1, 0)')} END)"
    )
    hi_abs = (
        f"(CASE WHEN {ab} < {small} THEN {ab}"
        f" ELSE ({m} + 1) * {shl.format(n=f'greatest({j} - 1, 0)')} - 1 END)"
    )
    lo = f"(CASE WHEN {bid} < 0 THEN -{hi_abs} ELSE {lo_abs} END)"
    hi = f"(CASE WHEN {bid} < 0 THEN -{lo_abs} ELSE {hi_abs} END)"
    return lo, hi


def qsketch_build(
    df: DataFrame,
    value_col: str,
    b: int = 4,
    group_cols: tuple[str, ...] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """(group..., bid, cnt): the log-histogram sketch of BIGINT
    expression ``value_col`` — one row-local bucket projection + ONE
    map-combined groupBy; the exchange carries bucket cells, never data
    rows. Merge two sketches by UNION ALL + groupBy-SUM.

    ``weight_col`` (a non-negative BIGINT expression) switches to the
    WEIGHTED sketch: cnt sums weights instead of counting rows, so
    qsketch_quantiles then answers weighted quantiles — e.g. doc-length
    sketches weighted by token count give "the doc length at/below
    which half the corpus's TOKEN MASS lives", the curation quantity
    behind length-based mixing decisions. All integer arithmetic, same
    merge and rank contracts."""
    if not 1 <= b <= 8:
        raise ValueError(f"b={b} outside [1, 8]")
    v = f"CAST(({value_col}) AS BIGINT)"
    cnt = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(F.expr(f"CAST(({weight_col}) AS BIGINT)"))
    )
    return (
        df.where(F.expr(f"({value_col}) IS NOT NULL"))
        .groupBy(
            *group_cols,
            F.expr(_qs_bid_sql(v, b, True)).cast("bigint").alias("bid"),
        )
        .agg(cnt.cast("bigint").alias("cnt"))
    )


def qsketch_quantiles(
    sketch: DataFrame,
    quantiles: tuple[tuple[int, int], ...] = ((50, 100), (90, 100), (99, 100)),
    b: int = 4,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group..., q_ppm, n_total, q_lo, q_hi, q_est): rank-exact bucket
    lookup per rational quantile num/den. The q-quantile is the
    ceil(q·n)-th smallest value (discrete, lower-rank convention); its
    bucket is the first whose cumulative count reaches that rank, so the
    TRUE order statistic lies in [q_lo, q_hi] always; q_est is the
    bucket midpoint lo + (hi-lo) div 2 (non-negative width, so
    truncating and flooring division agree cross-engine). All shuffles
    carry bucket-level rows (bounded state): one cumsum window + one
    (group, q) min — never a data-sized key shuffle."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*[F.col(c) for c in group_cols])
    qarr = F.array(
        *[
            F.struct(
                F.lit(num).cast("bigint").alias("num"),
                F.lit(den).cast("bigint").alias("den"),
            )
            for num, den in quantiles
        ]
    )
    c = sketch.select(
        *group_cols,
        "bid",
        F.sum("cnt").over(w_cum).alias("_cum"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n_total"),
    ).select(*group_cols, "bid", "_cum", "n_total", F.explode(qarr).alias("_q"))
    hit = c.where(
        F.col("_cum")
        >= F.expr("(_q.num * n_total + _q.den - 1) div _q.den")
    )
    picked = hit.groupBy(
        *group_cols,
        F.expr("CAST((_q.num * 1000000) div _q.den AS BIGINT)").alias(
            "q_ppm"
        ),
        "n_total",
    ).agg(F.min("bid").alias("_bid"))
    lo, hi = _qs_bounds_sql("_bid", b, True)
    return picked.select(
        *group_cols,
        "q_ppm",
        "n_total",
        F.expr(lo).cast("bigint").alias("q_lo"),
        F.expr(hi).cast("bigint").alias("q_hi"),
        F.expr(f"{lo} + ({hi} - {lo}) div 2").cast("bigint").alias("q_est"),
    )


def qsketch_oracle_sql(
    table: str,
    value_sql: str,
    group_col: str,
    b: int = 4,
    quantiles: tuple[tuple[int, int], ...] = ((50, 100), (90, 100), (99, 100)),
    weight_sql: str | None = None,
) -> str:
    """DuckDB replay of qsketch_build + qsketch_quantiles over ``table``
    — same integer constants and bucket algebra (single source of
    truth), independent SQL shape (CTE chain + window cumsum).
    ``weight_sql`` mirrors qsketch_build's weighted mode."""
    two_b = 1 << b
    bid = _qs_bid_sql(f"CAST(({value_sql}) AS BIGINT)", b, False)
    lo, hi = _qs_bounds_sql("_bid", b, False)
    qvals = ", ".join(f"({num}, {den})" for num, den in quantiles)
    cnt = (
        "count(*)"
        if weight_sql is None
        else f"sum(CAST(({weight_sql}) AS BIGINT))"
    )
    return f"""
      WITH sk AS MATERIALIZED (
        SELECT {group_col}, {bid} AS bid, CAST({cnt} AS BIGINT) AS cnt
        FROM {table} WHERE ({value_sql}) IS NOT NULL
        GROUP BY 1, 2
      ),
      c AS (
        SELECT {group_col}, bid,
               sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bid
                              ROWS UNBOUNDED PRECEDING) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY {group_col}) AS BIGINT)
                 AS n_total
        FROM sk
      ),
      q(num, den) AS (SELECT * FROM (VALUES {qvals})),
      hit AS (
        SELECT {group_col},
               CAST((q.num * 1000000) // q.den AS BIGINT) AS q_ppm,
               n_total, min(bid) AS _bid
        FROM c CROSS JOIN q
        WHERE cum >= (q.num * n_total + q.den - 1) // q.den
        GROUP BY 1, 2, 3
      )
      SELECT {group_col}, q_ppm, n_total,
             CAST({lo} AS BIGINT) AS q_lo,
             CAST({hi} AS BIGINT) AS q_hi,
             CAST({lo} + ({hi} - {lo}) // 2 AS BIGINT) AS q_est
      FROM hit
    """


# ---------------------------------------------------------------------------
# Streaming sketch sink: the register/cell tables above are plain
# groupBy aggregates whose values only ever GROW (max_rho is a max, cnt a
# count), so they run unmodified under Structured Streaming with state
# bounded by cells x groups — a continuous distinct-users (HLL) /
# heavy-hitters (CMS) / distribution (quantile) monitor over an unbounded
# stream. sketch_stream starts the update-mode query; because every value
# is MONOTONE, the current register table is recoverable from the
# append-only memory sink by groupBy-max (last-write-wins == max), which
# sketch_stream_table implements. On a real cluster the same regs frame
# feeds foreachBatch-MERGE into a keyed table; the memory-sink path keeps
# the contract testable here.
# ---------------------------------------------------------------------------


def sketch_registers(
    df: DataFrame,
    kind: str,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
    width: int = 8192,
    depth: int = 5,
    b: int = 4,
) -> DataFrame:
    """The sketch state relation for ``kind`` in {'hll','cms','quantile'}
    — batch and streaming alike (same DataFrame expression)."""
    if kind == "hll":
        return hll_registers(df, key_col, p=p, group_cols=group_cols)
    if kind == "cms":
        if group_cols:
            raise ValueError("cms sketch_stream does not take group_cols")
        return cms_build(
            df.select(F.expr(key_col).alias("_k")).where(
                F.col("_k").isNotNull()
            ),
            "_k",
            width=width,
            depth=depth,
        )
    if kind == "quantile":
        return qsketch_build(df, key_col, b=b, group_cols=group_cols)
    raise ValueError(f"unknown sketch kind {kind!r}")


_SKETCH_VALUE_COL = {"hll": "max_rho", "cms": "cnt", "quantile": "cnt"}


def sketch_stream(
    stream_df: DataFrame,
    kind: str,
    key_col: str,
    sink_table: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
    width: int = 8192,
    depth: int = 5,
    b: int = 4,
    available_now: bool = True,
    checkpoint_dir: str | None = None,
):
    """Start the streaming register maintenance query (outputMode=update:
    each trigger emits only the register rows that changed; state is
    bounded by cells x groups regardless of stream length). Returns the
    StreamingQuery; read the live table with sketch_stream_table."""
    regs = sketch_registers(
        stream_df, kind, key_col, group_cols, p, width, depth, b
    )
    writer = (
        regs.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sketch_stream_table(spark, sink_table: str, kind: str) -> DataFrame:
    """Current register/cell table from an update-mode sketch sink: all
    sketch values are monotone non-decreasing, so the latest value per
    cell is its MAX over the appended updates."""
    vcol = _SKETCH_VALUE_COL[kind]
    raw = spark.table(sink_table)
    keys = [c for c in raw.columns if c != vcol]
    return raw.groupBy(*keys).agg(F.max(vcol).alias(vcol))
