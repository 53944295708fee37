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

from squirreling_spark.pipeline.ckpt import truncate_lineage

# 48-bit md5 fold of "i:key" mod width — the i-th hash row's bucket.
_BUCKET = (
    "CAST(conv(substring(md5(concat(CAST({i} AS STRING), ':', {key})),"
    " 1, 12), 16, 10) AS BIGINT) % {w}"
)


def _cms_validate(width: int, depth: int) -> None:
    """Shared parameter guard (r11 advice: depth was never validated, so
    depth=1 crashed F.least downstream and depth=0 built empty arrays)."""
    if depth < 1:
        raise ValueError(f"depth={depth} must be >= 1")
    if width < 1:
        raise ValueError(f"width={width} must be >= 1")


def cms_build(
    df: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> DataFrame:
    """(row, bucket, cnt) — the sketch as a relation of ≤ depth·width
    cells. One pass, map-side combined; merging two sketches is a
    UNION ALL + re-aggregate of d·w-cell frames."""
    _cms_validate(width, depth)
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
    _cms_validate(width, depth)
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

    _cms_validate(width, depth)

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
    # Truncation honors the reliable-checkpoint knob (r11 advice: bare
    # localCheckpoint blocks die with their executor on a real cluster).
    wide = truncate_lineage(
        sketch.groupBy("bucket").agg(
            *[
                F.max(F.when(F.col("row") == i, F.col("cnt"))).alias(f"_c{i}")
                for i in range(depth)
            ]
        )
    )
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
    cells = [F.coalesce(F.col(f"_c{i}"), F.lit(0)) for i in range(depth)]
    est = (cells[0] if depth == 1 else F.least(*cells)).cast("bigint")
    # Threshold floors at 1 (r11 advice): when n_total < 1/φ the integer
    # division yields 0 and every distinct term would survive — a full
    # term-keyed shuffle, the exact degeneration this plan exists to
    # avoid. est >= 1 for any present term, so semantics are unchanged.
    heavy = scored.where(
        est >= F.expr(f"greatest(1, (_n_total * {phi_ppm}) div 1000000)")
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


def hll_pairwise_overlap(
    regs: DataFrame,
    groups: DataFrame,
    group_col: str,
    out_a: str,
    out_b: str,
    p: int = 8,
    jaccard: bool = False,
    max_groups: int | None = 4096,
) -> DataFrame:
    """(out_a, out_b, est_a, est_b, est_union, est_overlap[, jaccard_ppm])
    for every unordered pair of groups, by HLL register ALGEBRA: union
    registers are the bucket-wise MAX of the two groups' registers (the
    exact max-lattice merge, not approximate-on-approximate), and
    inclusion-exclusion gives |A∩B| ≈ est(A) + est(B) − est(A∪B);
    ``jaccard=True`` appends overlap/union in integer ppm. This is the
    one implementation behind events_user_overlap AND
    sources_gram_overlap (r11 verdict task 2 — extracted so the next
    overlap consumer composes instead of copying).

    ``regs`` is an (group_col, bucket, max_rho) register table
    (hll_registers output, UNtruncated — this helper truncates it, since
    it is referenced three times: union merge + both per-group
    estimates). ``groups`` is a one-column (group_col) relation of the
    group keys to pair (callers usually pass base-table DISTINCT so
    semantics — and the oracle — stay explicit about the group
    universe; groups absent from ``regs``, e.g. all-NULL-key groups,
    drop out of the inner output joins exactly like COUNT(DISTINCT)
    would report nothing for them).

    Scale envelope: the pair expansion is O(S²) in the number of groups
    — 2^p registers per PAIR cross the union exchange. That is the
    design point for group counts in the tens-to-hundreds (event types,
    corpus sources, days: 190 pairs at S=20, ~2.4M register rows at
    S=1000 and p=8) and the wrong tool at S ≳ 10^4, where an LSH/
    banded candidate generator (pipeline/dedup.py) should cut the pair
    space first. ``max_groups`` enforces that envelope: the helper
    probes |groups| with a LIMIT-bounded count (one tiny job at build
    time — bounded at max_groups+1 rows, never a full aggregate in the
    query plan, so registered plan pins are unchanged) and raises
    before a quadratic plan is ever built; pass None to opt out. The
    pair count is also observable at run time via the
    ``hll_overlap_<out_a>`` observation's n_pairs metric."""
    if max_groups is not None:
        n = groups.limit(max_groups + 1).count()
        if n > max_groups:
            raise ValueError(
                f"hll_pairwise_overlap: > {max_groups} groups — the "
                "O(S^2) pair expansion is out of its envelope; cut the "
                "pair space with a banded/LSH candidate generator first "
                "or raise max_groups explicitly"
            )
    # r12 (guide §5): `groups` is tiny (envelope-bounded above) but its
    # subtree is usually a base-table DISTINCT, and it is referenced by
    # both cross-join arms AND the output joins — measured 4 extra
    # parquet scans per query without truncation. Materialize once,
    # AFTER the probe so an out-of-envelope frame never materializes.
    groups = truncate_lineage(groups)
    pairs = (
        groups.select(F.col(group_col).alias(out_a))
        .crossJoin(groups.select(F.col(group_col).alias(out_b)))
        .where(F.col(out_a) < F.col(out_b))
        .withColumn("pair_id", F.concat_ws("|", out_a, out_b))
    )
    pairs = pairs.observe(
        f"hll_overlap_{out_a}", F.count(F.lit(1)).alias("n_pairs")
    )
    regs = truncate_lineage(regs)
    # one explode, not a self-union: keeps the (tiny) pair cross-join
    # subtree from being re-inlined once per union arm
    mem = pairs.select(
        F.explode(F.array(out_a, out_b)).alias(group_col), "pair_id"
    )
    ur = (
        regs.join(F.broadcast(mem), group_col)
        .groupBy("pair_id", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    eu = hll_estimate(ur, p=p, group_cols=("pair_id",)).select(
        "pair_id", F.col("est_distinct").alias("est_union")
    )
    # one estimate row per group / per pair — broadcast all output joins
    et = hll_estimate(regs, p=p, group_cols=(group_col,))
    out = (
        pairs.join(
            F.broadcast(
                et.select(
                    F.col(group_col).alias(out_a),
                    F.col("est_distinct").alias("est_a"),
                )
            ),
            out_a,
        )
        .join(
            F.broadcast(
                et.select(
                    F.col(group_col).alias(out_b),
                    F.col("est_distinct").alias("est_b"),
                )
            ),
            out_b,
        )
        .join(F.broadcast(eu), "pair_id")
    )
    cols = [
        out_a,
        out_b,
        "est_a",
        "est_b",
        "est_union",
        F.greatest(
            F.lit(0), F.col("est_a") + F.col("est_b") - F.col("est_union")
        ).cast("bigint").alias("est_overlap"),
    ]
    if jaccard:
        cols.append(
            F.expr(
                "CAST((greatest(0, est_a + est_b - est_union) * 1000000)"
                " div est_union AS BIGINT)"
            ).alias("jaccard_ppm")
        )
    return out.select(*cols)


def hll_pairwise_overlap_sql(
    regs: str,
    groups: str,
    group_col: str,
    out_a: str,
    out_b: str,
    p: int = 8,
    jaccard: bool = False,
    ctes_extra: str = "",
    select_extra: str = "",
    joins_extra: str = "",
) -> str:
    """DuckDB replay of hll_pairwise_overlap — CTE definitions + final
    SELECT, to be appended after a caller's ``WITH`` chain that already
    defines ``regs`` (a MATERIALIZED register CTE) and ``groups`` (the
    one-column group-universe CTE). The exhibit hooks (``ctes_extra`` —
    note it must start with a comma-separated CTE — ``select_extra``,
    ``joins_extra``) let _vs_exact variants join exact overlaps onto the
    same single-source-of-truth estimate stack."""
    jac = (
        ",\n           CAST((greatest(0, ea.est_distinct + eb.est_distinct"
        "\n                             - eu.est_distinct) * 1000000)"
        "\n                // eu.est_distinct AS BIGINT) AS jaccard_ppm"
        if jaccard
        else ""
    )
    return f"""
    p AS MATERIALIZED (
      SELECT a.{group_col} AS {out_a}, b.{group_col} AS {out_b},
             a.{group_col} || '|' || b.{group_col} AS pair_id
      FROM {groups} a JOIN {groups} b ON a.{group_col} < b.{group_col}
    ),
    mem AS (
      SELECT {out_a} AS {group_col}, pair_id FROM p
      UNION ALL SELECT {out_b}, pair_id FROM p
    ),
    ur AS (
      SELECT pair_id, bucket, max(max_rho) AS max_rho
      FROM {regs} JOIN mem USING ({group_col}) GROUP BY 1, 2
    ),
    eu AS ({hll_estimate_sql("ur", "pair_id", p)}),
    et AS MATERIALIZED ({hll_estimate_sql(regs, group_col, p)}){ctes_extra}
    SELECT p.{out_a}, p.{out_b},
           ea.est_distinct AS est_a, eb.est_distinct AS est_b,
           eu.est_distinct AS est_union,
           CAST(greatest(0, ea.est_distinct + eb.est_distinct
                            - eu.est_distinct) AS BIGINT) AS est_overlap{jac}{select_extra}
    FROM p
    JOIN et ea ON p.{out_a} = ea.{group_col}
    JOIN et eb ON p.{out_b} = eb.{group_col}
    JOIN eu ON p.pair_id = eu.pair_id{joins_extra}
    """


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


def hll_estimate_sql(
    registers: str, group_col: str, p: int = 8, corrected: bool = False
) -> str:
    """DuckDB SELECT replaying hll_estimate over a register relation
    (a CTE name or parenthesized subquery) — same integer constants as
    the Spark side (single source of truth). ``corrected`` mirrors
    hll_estimate's Flajolet small-range linear-counting branch (float ln
    — deliberately outside the integer hash contract; consumers compare
    the rounded integer, which is ulp-robust away from .5 boundaries,
    i.e. at the small n_buckets the branch exists for)."""
    m = 1 << p
    w = 60 - p
    scale = 1 << (w + 1)
    num = 7213 * m * m * m * scale
    den_c = 10 * (1000 * m + 1079)
    raw = f"""CAST({num}::HUGEINT // ({den_c}::HUGEINT
                  * (({m} - count(*)) * {scale}::HUGEINT
                     + sum((1::BIGINT << ({w + 1} - max_rho))::HUGEINT)))
               AS BIGINT)"""
    if corrected:
        est = f"""CASE WHEN {raw} <= {5 * m // 2} AND count(*) < {m}
             THEN CAST(round({m} * ln({m} / CAST({m} - count(*) AS DOUBLE)))
                  AS BIGINT)
             ELSE {raw} END"""
    else:
        est = raw
    return f"""
      SELECT {group_col},
             {est} AS est_distinct,
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


def _qs_value_sql(value_sql: str, value_scale: int, spark_dialect: bool) -> str:
    """The guarded BIGINT value expression shared by qsketch_build and
    qsketch_oracle_sql.

    ``value_scale`` > 1 is the first-class fixed-point path for DOUBLE
    columns: the sketch buckets floor(value · scale) and every output
    bound (q_lo/q_hi/q_est) is in that SCALED integer domain — the
    consumer divides by the scale it chose (e.g. scale=1000 ⇒ milli-unit
    quantiles). floor() is the cross-engine deterministic fold the
    digest checksums already rely on.

    The documented |v| < 2^62 contract is ENFORCED, not advisory (r11
    advice): v = -2^63 overflows abs() silently and values ≥ 2^62 break
    the bucket map's monotonicity, yielding wrong quantiles with no
    error. Out-of-range values raise at scan time on both engines
    (raise_error / error inside a lazily-evaluated CASE branch); the
    check avoids abs() so -2^63 itself is caught, not wrapped."""
    if not (isinstance(value_scale, int) and value_scale >= 1):
        raise ValueError(f"value_scale={value_scale!r} must be an int >= 1")
    if value_scale == 1:
        v = f"CAST(({value_sql}) AS BIGINT)"
    else:
        v = f"CAST(floor(({value_sql}) * {value_scale}) AS BIGINT)"
    lim = 1 << 62
    err = (
        f"raise_error('qsketch: |value| must be < 2^62 (got out-of-range)')"
        if spark_dialect
        else "error('qsketch: |value| must be < 2^62 (got out-of-range)')"
    )
    return (
        f"(CASE WHEN {v} <= {-lim} OR {v} >= {lim}"
        f" THEN CAST({err} AS BIGINT) ELSE {v} END)"
    )


def qsketch_build(
    df: DataFrame,
    value_col: str,
    b: int = 4,
    group_cols: tuple[str, ...] = (),
    weight_col: str | None = None,
    value_scale: int = 1,
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
    merge and rank contracts.

    ``value_scale`` is the fixed-point knob for DOUBLE value columns —
    see _qs_value_sql: buckets hold floor(value · scale) and the
    reported quantile bounds are in that scaled integer domain. The
    |v| < 2^62 contract is enforced (out-of-range raises at scan)."""
    if not 1 <= b <= 8:
        raise ValueError(f"b={b} outside [1, 8]")
    v = _qs_value_sql(value_col, value_scale, True)
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


def qsketch_cdf(
    sketch: DataFrame,
    probes: tuple[int, ...],
    b: int = 4,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group..., probe, n_total, cdf_lo_ppm, cdf_hi_ppm): the CDF read
    from the log-histogram sketch at fixed probe points — the inverse
    direction of qsketch_quantiles ("what fraction of docs are ≤ 2000
    chars" vs "what length is p90"), the question length-cutoff curation
    decisions actually ask. ``probes`` are integers in the sketch's
    (possibly value_scale-d) domain.

    Guarantee (integer-exact, bucket-monotonicity): the true count of
    values ≤ probe lies in [_lt, _le] where _lt sums buckets strictly
    below probe's bucket and _le sums through it — every value in a
    lower bucket is < the probe bucket's lower bound ≤ probe, and any
    value ≤ probe buckets at or below probe's bucket. Reported as ppm
    floor-divisions, so true F(probe)·1e6 ∈ [cdf_lo_ppm, cdf_hi_ppm+1).
    Band width ≤ the probe bucket's mass: ≤ 2^-b relative resolution
    wherever the distribution is locally smooth.

    Plan shape: probes explode from a LITERAL array against bucket-level
    rows (Generate, row-local — never a join), then ONE map-combined
    (group, probe) aggregation — the sketch's single hash exchange plus
    this one, both carrying bounded bucket/probe rows."""
    parr = F.explode(
        F.array(*[F.lit(int(v)).cast("bigint") for v in probes])
    ).alias("probe")
    pb = _qs_bid_sql("probe", b, True)
    s = sketch.select(*group_cols, "bid", "cnt", parr)
    agg = s.groupBy(*group_cols, "probe").agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.sum(
            F.when(F.expr(f"bid < {pb}"), F.col("cnt")).otherwise(F.lit(0))
        ).cast("bigint").alias("_lt"),
        F.sum(
            F.when(F.expr(f"bid <= {pb}"), F.col("cnt")).otherwise(F.lit(0))
        ).cast("bigint").alias("_le"),
    )
    return agg.select(
        *group_cols,
        "probe",
        "n_total",
        F.expr("CAST((_lt * 1000000) div n_total AS BIGINT)").alias(
            "cdf_lo_ppm"
        ),
        F.expr("CAST((_le * 1000000) div n_total AS BIGINT)").alias(
            "cdf_hi_ppm"
        ),
    )


def qsketch_cdf_oracle_sql(
    table: str,
    value_sql: str,
    group_col: str,
    probes: tuple[int, ...],
    b: int = 4,
    weight_sql: str | None = None,
    value_scale: int = 1,
) -> str:
    """DuckDB replay of qsketch_build + qsketch_cdf over ``table`` —
    same bucket algebra and integer ppm arithmetic (single source of
    truth), independent SQL shape."""
    bid = _qs_bid_sql(_qs_value_sql(value_sql, value_scale, False), b, False)
    pbid = _qs_bid_sql("probe", b, False)
    pvals = ", ".join(f"({int(v)})" for v in probes)
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
      pr(probe) AS (SELECT CAST(v AS BIGINT) FROM (VALUES {pvals}) t(v)),
      agg AS (
        SELECT {group_col}, probe,
               CAST(sum(cnt) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN bid < {pbid} THEN cnt ELSE 0 END)
                    AS BIGINT) AS lt,
               CAST(sum(CASE WHEN bid <= {pbid} THEN cnt ELSE 0 END)
                    AS BIGINT) AS le
        FROM sk CROSS JOIN pr
        GROUP BY 1, 2
      )
      SELECT {group_col}, probe, n_total,
             CAST((lt * 1000000) // n_total AS BIGINT) AS cdf_lo_ppm,
             CAST((le * 1000000) // n_total AS BIGINT) AS cdf_hi_ppm
      FROM agg
    """


def qsketch_oracle_sql(
    table: str,
    value_sql: str,
    group_col: str,
    b: int = 4,
    quantiles: tuple[tuple[int, int], ...] = ((50, 100), (90, 100), (99, 100)),
    weight_sql: str | None = None,
    value_scale: int = 1,
) -> str:
    """DuckDB replay of qsketch_build + qsketch_quantiles over ``table``
    — same integer constants and bucket algebra (single source of
    truth), independent SQL shape (CTE chain + window cumsum).
    ``weight_sql`` mirrors qsketch_build's weighted mode; ``value_scale``
    its fixed-point DOUBLE path (and the enforced |v| < 2^62 guard rides
    along via _qs_value_sql on both engines)."""
    two_b = 1 << b
    bid = _qs_bid_sql(_qs_value_sql(value_sql, value_scale, False), b, False)
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
# stream. sketch_stream starts the maintenance query in one of two modes:
#
# sink="memory" (test/inspection path): update-mode streaming aggregation
# into a memory sink; because every value is MONOTONE, the current
# register table is recoverable from the append-only sink by groupBy-max
# (last-write-wins == max), which sketch_stream_table implements.
#
# sink="table" (the production path, r11 verdict task 1): STATELESS
# foreachBatch merge — each micro-batch computes its batch-local sketch
# (bounded: cells x groups) and folds it into a keyed catalog table by
# the kind's merge monoid (HLL registers: MAX; CMS/quantile cells: SUM).
# All long-lived state lives in the fault-tolerant table, ZERO rows in
# the streaming state store; restarts resume from the checkpoint and an
# epoch watermark column makes at-least-once redelivery idempotent
# (replayed epochs are skipped before any merge runs).
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
    sink: str = "memory",
):
    """Start the streaming register maintenance query; returns the
    StreamingQuery.

    ``sink="memory"``: update-mode streaming aggregation into a memory
    sink (each trigger emits only the register rows that changed; state
    bounded by cells x groups). Read back with sketch_stream_table.

    ``sink="table"`` (production): stateless foreachBatch merge into the
    catalog table ``sink_table`` — see _sketch_table_merge. No streaming
    state store at all; the table IS the sketch, mergeable/readable by
    any other session mid-stream (read back with sketch_table). Pass
    ``checkpoint_dir`` for restartability: epochs then keep increasing
    across restarts and the table's epoch watermark skips any replayed
    batch (at-least-once made idempotent)."""
    if sink == "table":
        writer = stream_df.writeStream.foreachBatch(
            _sketch_table_merge(
                kind, key_col, sink_table, group_cols, p, width, depth, b
            )
        )
    elif sink == "memory":
        regs = sketch_registers(
            stream_df, kind, key_col, group_cols, p, width, depth, b
        )
        writer = (
            regs.writeStream.format("memory")
            .queryName(sink_table)
            .outputMode("update")
        )
    else:
        raise ValueError(f"unknown sink {sink!r} (memory|table)")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _sketch_table_merge(
    kind: str,
    key_col: str,
    sink_table: str,
    group_cols: tuple[str, ...],
    p: int,
    width: int,
    depth: int,
    b: int,
):
    """foreachBatch callback maintaining ``sink_table`` as the live
    sketch: batch-local registers fold into the table by the kind's
    merge monoid — MAX for HLL registers (a max-lattice), SUM for
    CMS/quantile cells (linear counters). Each batch moves only
    cells x groups rows; the merged frame is localCheckpointed EAGERLY
    before the overwrite (legal self-overwrite + the checkpoint lives
    only within the batch, so executor-block durability is irrelevant —
    the table write immediately follows). The ``_epoch`` column records
    the last applied epoch per row; a batch whose epoch_id <= max is a
    redelivery and is skipped whole, making the merge idempotent under
    foreachBatch's at-least-once contract."""
    merge = F.max if kind == "hll" else F.sum
    vcol = _SKETCH_VALUE_COL[kind]  # also validates kind

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        regs = sketch_registers(
            batch_df, kind, key_col, group_cols, p, width, depth, b
        )
        keys = [c for c in regs.columns if c != vcol]
        if sess.catalog.tableExists(sink_table):
            cur = sess.table(sink_table)
            last = cur.agg(F.max("_epoch")).first()[0]
            if last is not None and epoch_id <= last:
                return  # redelivered epoch: already folded in
            merged = (
                cur.drop("_epoch")
                .unionByName(regs)
                .groupBy(*keys)
                .agg(merge(vcol).cast("bigint").alias(vcol))
            )
        else:
            merged = regs
        out = merged.withColumn(
            "_epoch", F.lit(int(epoch_id)).cast("bigint")
        ).localCheckpoint(eager=True)
        out.write.mode("overwrite").saveAsTable(sink_table)

    return _apply


def sketch_table(spark, sink_table: str) -> DataFrame:
    """Current register/cell table maintained by a sink="table"
    sketch_stream — directly consumable by hll_estimate /
    cms_estimate / qsketch_quantiles (the epoch watermark is merge
    bookkeeping, not sketch state)."""
    return spark.table(sink_table).drop("_epoch")


def sketch_stream_table(spark, sink_table: str, kind: str) -> DataFrame:
    """Current register/cell table from an update-mode sketch sink: all
    sketch values are monotone non-decreasing, so the latest value per
    cell is its MAX over the appended updates."""
    vcol = _SKETCH_VALUE_COL[kind]
    raw = spark.table(sink_table)
    keys = [c for c in raw.columns if c != vcol]
    return raw.groupBy(*keys).agg(F.max(vcol).alias(vcol))
