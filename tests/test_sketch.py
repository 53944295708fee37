"""Count-min sketch property tests (pipeline/sketch.py): the oracle gate
proves the sketch is computed as specified; these pin the properties
that make it a SKETCH — the one-sided error guarantee, bounded state,
and linearity (shard merge by cell-wise addition)."""

from pyspark.sql import functions as F

from squirreling_spark.pipeline.sketch import (
    cms_build,
    cms_estimate,
    cms_top_terms,
)
from squirreling_spark.pipeline.text import tokens
from squirreling_spark.qutil import t

SF = "/root/testdata/sf0.01"
W, D = 8192, 5


def _toks(spark):
    return (
        t(spark, SF, "documents")
        .select(F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
    )


def test_cms_never_undercounts(spark):
    """The CMS guarantee is one-sided: estimate >= true count for EVERY
    key (collisions only ever add). Checked over all distinct terms."""
    toks = _toks(spark)
    sketch = cms_build(toks, "term", width=W, depth=D)
    exact = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    est = cms_estimate(exact, sketch, "term", width=W, depth=D)
    assert (
        est.filter(F.col("cms_count") < F.col("exact_count")).count() == 0
    )


def test_cms_state_is_bounded(spark):
    """Sketch relation never exceeds depth x width cells and its total
    mass equals the input size exactly (each of the D rows counts every
    token once)."""
    toks = _toks(spark)
    n = toks.count()
    sketch = cms_build(toks, "term", width=W, depth=D)
    assert sketch.count() <= W * D
    per_row = sketch.groupBy("row").agg(F.sum("cnt").alias("mass"))
    rows = {r["row"]: r["mass"] for r in per_row.collect()}
    assert set(rows) == set(range(D))
    assert all(m == n for m in rows.values())


def test_cms_merge_linearity(spark):
    """sketch(A) + sketch(B), merged cell-wise, equals sketch(A u B) —
    the property that lets shard/day sketches combine without
    reprocessing history."""
    toks = _toks(spark)
    full = cms_build(toks, "term", width=W, depth=D)
    # split deterministically: hash parity of the term
    parity = F.expr(
        "CAST(conv(substring(md5(term), 1, 8), 16, 10) AS BIGINT) % 2"
    )
    sa = cms_build(toks.filter(parity == 0), "term", width=W, depth=D)
    sb = cms_build(toks.filter(parity == 1), "term", width=W, depth=D)
    merged = (
        sa.unionAll(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_cms_top_terms_overcount_small_when_wide(spark):
    """With width >> distinct terms, collisions among heavy hitters are
    rare: the top-20 overcount should be a tiny fraction of the exact
    count (regression guard against a broken bucket hash degrading every
    estimate to the table total). Uses the exhibit form, which carries
    the exact count alongside."""
    out = cms_top_terms(
        t(spark, SF, "documents"), "text", k=20, width=W, depth=D,
        exhibit=True,
    ).collect()
    assert len(out) == 20
    for r in out:
        assert r["overcount"] >= 0
        assert r["cms_count"] <= 2 * r["exact_count"], (
            r["term"],
            r["cms_count"],
            r["exact_count"],
        )


def test_cms_pure_default_matches_exhibit_top_terms(spark):
    """The pure-sketch default (broadcast scoring + φ-survivor shuffle)
    must return the SAME top-k as the exact exhibit when width >>
    distinct (estimates equal exact counts), every returned term's
    sketched count must clear the φ threshold, and the default's output
    schema carries no exact column."""
    docs = t(spark, SF, "documents")
    pure = cms_top_terms(docs, "text", k=20, width=W, depth=D).collect()
    exhib = cms_top_terms(
        docs, "text", k=20, width=W, depth=D, exhibit=True
    ).collect()
    assert [r["term"] for r in pure] == [
        r["term"] for r in sorted(
            exhib, key=lambda r: (-r["cms_count"], r["term"])
        )
    ]
    assert pure and set(pure[0].asDict()) == {"term", "cms_count"}
    n_total = (
        t(spark, SF, "documents")
        .select(F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .count()
    )
    for r in pure:
        assert r["cms_count"] >= (n_total * 500) // 1_000_000


def test_hll_estimate_accuracy_at_large_n(spark):
    """Raw HLL with m=256 has ~6.5% standard error at n >> m: 100k
    distinct keys must estimate within 20% (3 sigma), and the register
    table must be exactly m rows (bounded state)."""
    from squirreling_spark.pipeline.sketch import hll_estimate, hll_registers

    df = spark.range(100_000).selectExpr("id AS k", "'g' AS grp")
    regs = hll_registers(df, "k", p=8, group_cols=("grp",))
    assert regs.count() == 256
    [r] = hll_estimate(regs, p=8, group_cols=("grp",)).collect()
    assert r["n_buckets"] == 256
    assert abs(r["est_distinct"] - 100_000) < 20_000, r["est_distinct"]


def test_hll_merge_by_register_max(spark):
    """Registers are a max-lattice: sketching two halves separately and
    merging by per-bucket MAX gives bit-identical registers — and thus
    the identical estimate — as sketching the whole (the property that
    makes shard/day/stream merges exact, never approximate-on-top-of-
    approximate)."""
    from squirreling_spark.pipeline.sketch import hll_estimate, hll_registers

    lo = spark.range(0, 30_000).selectExpr("id AS k")
    hi = spark.range(30_000, 60_000).selectExpr("id AS k")
    both = spark.range(0, 60_000).selectExpr("id AS k")
    merged = (
        hll_registers(lo, "k", p=8)
        .union(hll_registers(hi, "k", p=8))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    full = hll_registers(both, "k", p=8)
    assert {
        (r["bucket"], r["max_rho"]) for r in merged.collect()
    } == {(r["bucket"], r["max_rho"]) for r in full.collect()}
    [em] = hll_estimate(merged, p=8).collect()
    [ef] = hll_estimate(full, p=8).collect()
    assert em["est_distinct"] == ef["est_distinct"]


def test_hll_duplicates_do_not_move_registers(spark):
    """Distinct counting: replicating every key 5x leaves every register
    — and the estimate — unchanged."""
    from squirreling_spark.pipeline.sketch import hll_estimate, hll_registers

    base = spark.range(10_000).selectExpr("id AS k")
    dup = base.crossJoin(spark.range(5)).select("k")
    [a] = hll_estimate(hll_registers(base, "k", p=8), p=8).collect()
    [b] = hll_estimate(hll_registers(dup, "k", p=8), p=8).collect()
    assert a == b


def test_hll_overlap_algebra_on_planted_sets(spark):
    """Register algebra: union registers = bucket-wise MAX, overlap by
    inclusion-exclusion. Planted sets A = [0, 40k), B = [20k, 60k)
    (true overlap 20k, union 60k): the union estimate from max-merged
    registers must EQUAL the direct estimate of A∪B (exact merge), and
    the inclusion-exclusion overlap must land within the compounded
    error bound (3 terms x 3 sigma x 6.5% of the union)."""
    from squirreling_spark.pipeline.sketch import hll_estimate, hll_registers

    a = spark.range(0, 40_000).selectExpr("id AS k")
    b = spark.range(20_000, 60_000).selectExpr("id AS k")
    ra = hll_registers(a, "k", p=8)
    rb = hll_registers(b, "k", p=8)
    merged = ra.union(rb).groupBy("bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    [eu] = hll_estimate(merged, p=8).collect()
    [direct] = hll_estimate(
        hll_registers(a.union(b), "k", p=8), p=8
    ).collect()
    assert eu["est_distinct"] == direct["est_distinct"]
    [ea] = hll_estimate(ra, p=8).collect()
    [eb] = hll_estimate(rb, p=8).collect()
    overlap = ea["est_distinct"] + eb["est_distinct"] - eu["est_distinct"]
    assert abs(overlap - 20_000) < 0.2 * 60_000, overlap


def test_hll_null_keys_are_ignored(spark):
    """NULL keys must not register (COUNT(DISTINCT) semantics — r10
    advice): a frame with NULLs mixed in yields bit-identical registers
    and estimate to the non-null subset, and no NULL-bucket row."""
    from squirreling_spark.pipeline.sketch import hll_estimate, hll_registers

    clean = spark.range(1000).selectExpr("CAST(id AS STRING) AS k")
    dirty = clean.union(
        spark.range(50).selectExpr("CAST(NULL AS STRING) AS k")
    )
    rc = hll_registers(clean, "k", p=8)
    rd = hll_registers(dirty, "k", p=8)
    assert rd.where(F.col("bucket").isNull()).count() == 0
    assert {
        (r["bucket"], r["max_rho"]) for r in rd.collect()
    } == {(r["bucket"], r["max_rho"]) for r in rc.collect()}
    [ec] = hll_estimate(rc, p=8).collect()
    [ed] = hll_estimate(rd, p=8).collect()
    assert ec == ed


def test_hll_small_range_correction(spark):
    """corrected=True switches to linear counting below 5m/2 where the
    raw harmonic estimate is biased: at n = 30 << m = 256 the corrected
    estimate must land within 20% of truth AND strictly closer than the
    raw one; at n >> 5m/2 corrected == raw (branch not taken)."""
    from squirreling_spark.pipeline.sketch import hll_estimate, hll_registers

    small = spark.range(30).selectExpr("CAST(id AS STRING) AS k")
    regs = hll_registers(small, "k", p=8)
    [raw] = hll_estimate(regs, p=8).collect()
    [cor] = hll_estimate(regs, p=8, corrected=True).collect()
    assert abs(cor["est_distinct"] - 30) <= 6, cor["est_distinct"]
    assert abs(cor["est_distinct"] - 30) < abs(raw["est_distinct"] - 30)
    big = spark.range(100_000).selectExpr("CAST(id AS STRING) AS k")
    regs_b = hll_registers(big, "k", p=8)
    [raw_b] = hll_estimate(regs_b, p=8).collect()
    [cor_b] = hll_estimate(regs_b, p=8, corrected=True).collect()
    assert raw_b["est_distinct"] == cor_b["est_distinct"]


def _qs_exact(vals, q_num, q_den):
    import math

    xs = sorted(vals)
    return xs[math.ceil(q_num * len(xs) / q_den) - 1]


def test_qsketch_containment_and_relative_error(spark):
    """Log-histogram quantile guarantee: for every group and quantile,
    the TRUE order statistic (ceil(q·n)-th smallest) lies in
    [q_lo, q_hi], and the bucket half-width is <= 2^-(b+1) of the value
    (3.125% at b=4) for values beyond the exact range — across positive,
    negative, zero, and huge magnitudes."""
    import random

    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    random.seed(11)
    vals = (
        [random.randint(0, 10**7) for _ in range(4000)]
        + [random.randint(-(10**4), 10**4) for _ in range(2000)]
        + [0, 1, 2, 2**45, -(2**41)]
    )
    rows = [(f"g{i % 2}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, v long")
    sk = qsketch_build(df, "v", b=4, group_cols=("grp",))
    out = qsketch_quantiles(
        sk, quantiles=((10, 100), (50, 100), (99, 100)), b=4,
        group_cols=("grp",),
    ).collect()
    assert len(out) == 6
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for r in out:
        exact = _qs_exact(by_g[r["grp"]], r["q_ppm"], 10**6)
        assert r["q_lo"] <= exact <= r["q_hi"], (r, exact)
        assert r["q_hi"] - r["q_lo"] <= max(1, abs(exact)) * 2 ** -4 + 1, r


def test_qsketch_small_values_exact_and_monotonic(spark):
    """Values below 2^(b+1) occupy width-1 buckets (quantiles of small
    integers are EXACT), and the bucket id map is monotonic so rank
    order is preserved across the sign boundary."""
    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    vals = list(range(-31, 32))  # all within the exact range at b=4
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = qsketch_build(df, "v", b=4)
    assert sk.count() == len(vals)  # one exact bucket per value
    out = {
        r["q_ppm"]: r
        for r in qsketch_quantiles(
            sk, quantiles=((25, 100), (50, 100), (75, 100)), b=4
        ).collect()
    }
    for ppm, (num, den) in [(250000, (25, 100)), (500000, (50, 100)),
                            (750000, (75, 100))]:
        exact = _qs_exact(vals, num, den)
        r = out[ppm]
        assert r["q_lo"] == r["q_hi"] == r["q_est"] == exact, (r, exact)


def test_qsketch_merge_by_bucket_sum(spark):
    """Counters are linear: sketching two shards separately and merging
    by bucket-wise SUM gives bit-identical cells — and quantiles — as
    sketching the whole."""
    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    lo = spark.range(0, 50_000).selectExpr("id AS v")
    hi = spark.range(50_000, 120_000).selectExpr("CAST(id * 3 AS LONG) AS v")
    both = lo.union(hi)
    merged = (
        qsketch_build(lo, "v", b=4)
        .union(qsketch_build(hi, "v", b=4))
        .groupBy("bid")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    full = qsketch_build(both, "v", b=4)
    assert {
        (r["bid"], r["cnt"]) for r in merged.collect()
    } == {(r["bid"], r["cnt"]) for r in full.collect()}
    qm = qsketch_quantiles(merged, b=4).collect()
    qf = qsketch_quantiles(full, b=4).collect()
    assert sorted(map(tuple, qm)) == sorted(map(tuple, qf))


def test_qsketch_state_is_bounded(spark):
    """The 100 TB property: 1M distinct values over 2^40 of range still
    produce a bounded bucket table (≤ 2·(64-b)·2^b + 2^(b+2) cells),
    and NULLs are ignored like aggregate semantics."""
    from squirreling_spark.pipeline.sketch import qsketch_build

    df = spark.range(1_000_000).selectExpr(
        "CASE WHEN id % 97 = 0 THEN NULL ELSE CAST(id * id AS LONG) END AS v"
    )
    sk = qsketch_build(df, "v", b=4)
    n = sk.count()
    assert n <= 2 * 60 * 16 + 64, n
    assert sk.where(F.col("bid").isNull()).count() == 0


def test_qsketch_weighted_quantiles_match_exact(spark):
    """weight_col mode: the weighted q-quantile bucket must contain the
    exact weighted order statistic (the smallest v with cumulative
    weight >= ceil(q * W)) — checked against a brute-force weighted rank
    on skewed integer weights."""
    import math
    import random

    from squirreling_spark.pipeline.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    random.seed(13)
    rows = [
        (random.randint(1, 10**6), random.randint(1, 1000))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "v long, w long")
    sk = qsketch_build(df, "v", b=4, weight_col="w")
    out = qsketch_quantiles(
        sk, quantiles=((50, 100), (90, 100)), b=4
    ).collect()
    total = sum(w for _, w in rows)
    ordered = sorted(rows)
    for r in out:
        target = -(-r["q_ppm"] * total // 10**6)  # ceil
        cum = 0
        for v, w in ordered:
            cum += w
            if cum >= target:
                exact = v
                break
        assert r["n_total"] == total
        assert r["q_lo"] <= exact <= r["q_hi"], (r, exact)


def test_qsketch_bid_monotonic_invertible_cross_engine(spark):
    """Bucket-map algebra pinned at the boundaries: over an adversarial
    value set (0, ±1, ±2^k, ±(2^k±1) for k ≤ 61, plus random), the bid
    map is monotonic non-decreasing in v, every value lies inside its
    own bucket's [lo, hi], and DuckDB replays bid/lo/hi bit-for-bit
    (the abs() guards keep every div/shift operand non-negative, where
    Spark div and DuckDB // agree)."""
    import random

    import duckdb

    from squirreling_spark.pipeline.sketch import (
        _qs_bid_sql,
        _qs_bounds_sql,
    )

    random.seed(17)
    vals = {0, 1, -1}
    for k in range(1, 62):
        for d in (-1, 0, 1):
            vals.add((1 << k) + d)
            vals.add(-((1 << k) + d))
    vals |= {random.randint(-(2**61), 2**61) for _ in range(500)}
    vals = sorted(vals)

    b = 4
    bid = _qs_bid_sql("v", b, True)
    lo, hi = _qs_bounds_sql("_bid", b, True)
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .selectExpr("v", f"{bid} AS _bid")
        .selectExpr(
            "v", "_bid", f"{lo} AS lo", f"{hi} AS hi"
        )
        .orderBy("v")
        .collect()
    )
    prev_bid = None
    for r in rows:
        assert r["lo"] <= r["v"] <= r["hi"], r
        if prev_bid is not None:
            assert r["_bid"] >= prev_bid, r
        prev_bid = r["_bid"]

    dbid = _qs_bid_sql("v", b, False)
    dlo, dhi = _qs_bounds_sql("_bid", b, False)
    con = duckdb.connect()
    con.execute("CREATE TABLE vv(v BIGINT)")
    con.executemany("INSERT INTO vv VALUES (?)", [(v,) for v in vals])
    duck = con.execute(
        f"SELECT v, _bid, {dlo} AS lo, {dhi} AS hi"
        f" FROM (SELECT v, {dbid} AS _bid FROM vv) ORDER BY v"
    ).fetchall()
    assert [(r["v"], r["_bid"], r["lo"], r["hi"]) for r in rows] == [
        tuple(t) for t in duck
    ]


def test_cms_phi_guarantee_planted_heavy_hitter(spark):
    """The φ-heavy-hitter contract of the pure default: a planted term
    holding >> φ of the token mass can NEVER be missing from the output
    (CMS estimates are one-sided; the threshold filter only removes
    terms whose TRUE share is below φ minus the sketch error, never
    above). Planted at ~5% with φ = 0.05%."""
    rows = [(i, "planted " * 5 + f"filler{i} noise{i % 97}") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = cms_top_terms(docs, "text", k=20, width=W, depth=D).collect()
    assert any(r["term"] == "planted" for r in out), out
    top = max(out, key=lambda r: r["cms_count"])
    assert top["term"] == "planted"
