"""Property-based cross-engine parity (hypothesis): the fixture-based
oracle gate proves parity on the testdata distribution; these tests
throw RANDOMIZED inputs — unicode, quotes, control characters, nulls,
extreme ints — at the same dual-engine pipeline, targeting SURVEY §7.3's
"semantics parity under dynamic typing" hard part where engines
actually diverge (collation, null ordering, string edge cases).

Each example builds the SAME table in Spark and DuckDB, runs an
equivalent query in both, and compares through the driver-exact
canonicalizer (tests/parity.py::_canon_cells — dtype-sensitive).

FINDING (first run of these tests): upper()/lower() parity holds only
for characters whose SIMPLE and FULL Unicode case mappings coincide —
Spark (Java) applies full mappings (ß→SS, ŉ→ʼN, İ→i̇), DuckDB applies
simple per-codepoint ones (ß→ẞ, ŉ→ŉ, İ→i). The divergence is pinned in
test_unicode_case_mapping_divergence below; the case-transforming
properties therefore generate ASCII (the domain the corpus operators'
lower()-normalized fingerprints rely on — the fixtures are ASCII), and
the case-free properties keep the full unicode generator."""

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.parity import _canon, _canon_cells

# Text without ASCII control chars (Spark CSV-of-life issues aside, the
# engines themselves must agree on these), plus specifically nasty
# inhabitants: quotes, backslashes, unicode beyond BMP.
_text = st.one_of(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), max_codepoint=0x10FFF
        ),
        max_size=12,
    ),
    st.sampled_from(["", "'", '"', "\\", "a,b", "ß", "ŉ", "𐍈x", "  pad  "]),
)
# ASCII-only variant for case-transforming properties (see FINDING above)
_ascii_text = st.one_of(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=12,
    ),
    st.sampled_from(["", "'", '"', "\\", "a,b", "  pad  ", "A a"]),
)
_ascii_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
              _ascii_text),
    min_size=1, max_size=12,
)
_key = st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1))
_rows = st.lists(st.tuples(_key, _text), min_size=1, max_size=12)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _both(spark, rows, spark_sql, duck_sql):
    pdf = pd.DataFrame(rows, columns=["k", "v"]).astype(
        {"k": "Int64", "v": "object"}
    )
    sdf = spark.createDataFrame(
        [(int(k) if k is not None else None, v) for k, v in rows],
        "k bigint, v string",
    )
    sdf.createOrReplaceTempView("prop_t")
    got = _canon_cells(_canon(spark.sql(spark_sql).toPandas()))
    con = duckdb.connect()
    con.register("prop_t", pdf)
    want = _canon_cells(_canon(con.execute(duck_sql).df()))
    con.close()
    assert got == want, (got[:5], want[:5])


@_SETTINGS
@given(rows=_rows)
def test_group_order_null_semantics(spark, rows):
    """GROUP BY with null keys + count/min/max + ORDER BY NULLS FIRST
    must agree cell-for-cell on arbitrary inputs (null grouping, 3VL,
    and null-ordering are classic cross-engine divergence points)."""
    sql = """
        SELECT k,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(v) AS BIGINT) AS n_v,
               CAST(min(length(v)) AS BIGINT) AS min_len,
               CAST(max(length(v)) AS BIGINT) AS max_len
        FROM prop_t GROUP BY k
    """
    _both(spark, rows, sql, sql)


@_SETTINGS
@given(rows=_ascii_rows)
def test_string_pack_semantics(spark, rows):
    """upper/trim/substr/replace/concat over randomized ASCII (the
    documented case-mapping parity domain) must agree byte-for-byte
    (md5 of the transformed value compared, so any codepoint-level
    divergence — not just length — flips the test)."""
    sql = """
        SELECT k,
               md5(upper(v) || ':' || trim(v) || ':'
                   || replace(v, 'a', '@')) AS h,
               CAST(length(substr(v, 1, 3)) AS BIGINT) AS pre_len
        FROM prop_t
    """
    _both(spark, rows, sql, sql)


@_SETTINGS
@given(rows=_ascii_rows)
def test_distinct_and_setop_semantics(spark, rows):
    """DISTINCT over (nullable, string) pairs and EXCEPT ALL against the
    upper-cased projection — duplicate/null identity semantics."""
    sql = """
        SELECT v FROM prop_t
        EXCEPT ALL
        SELECT upper(v) FROM prop_t
    """
    _both(spark, rows, sql, sql)


def test_unicode_case_mapping_divergence(spark):
    """Pin the cross-engine boundary the property run found: Spark
    (Java) applies FULL Unicode case mappings, DuckDB applies SIMPLE
    per-codepoint ones. Any operator that case-normalizes non-ASCII
    text before an oracle comparison must account for this (the corpus
    fingerprints lower() ASCII fixture text, which both engines map
    identically)."""
    got = spark.sql("SELECT upper('\u00df'), upper('\u0149'), lower('\u0130')").collect()[0]
    assert tuple(got) == ("SS", "\u02bcN", "i\u0307")  # full mappings
    duck = duckdb.sql("SELECT upper('\u00df'), upper('\u0149'), lower('\u0130')").fetchone()
    assert duck == ("\u1e9e", "\u0149", "i")           # simple mappings


# --- operator-level properties: custom ops vs brute-force references -------

_ev = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, t)
    min_size=0, max_size=15,
)


@_SETTINGS
@given(left=_ev, right=_ev)
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join (operators/asof_join.py) against a quadratic Python
    reference on random keyed timelines — backward AND forward, ties
    and duplicate timestamps included."""
    from squirreling_spark.operators.asof_join import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [(0, -1, -1)],
        "k int, t int, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, t, t * 1000 + k) for k, t in right] or [(0, -999, 0)],
        "k int, t int, payload int",
    )
    for direction in ("backward", "forward"):
        got = {
            (r["k"], r["t"], r["lid"]): r["payload_right"]
            for r in asof_join(
                ldf, rdf, on="t", by="k", direction=direction
            ).collect()
        }
        rrows = [(k, t, t * 1000 + k) for k, t in right] or [(0, -999, 0)]
        for (lk, lt, lid), g in got.items():
            if direction == "backward":
                cand = [(rt, p) for rk, rt, p in rrows
                        if rk == lk and rt <= lt]
                want = max(cand)[1] if cand else None
            else:
                cand = [(rt, p) for rk, rt, p in rrows
                        if rk == lk and rt >= lt]
                want = min(cand)[1] if cand else None
            assert g == want, (direction, lk, lt, g, want)


@_SETTINGS
@given(
    a=st.lists(st.integers(0, 999), min_size=0, max_size=12),
    b=st.lists(st.integers(0, 999), min_size=0, max_size=12),
)
def test_positional_join_matches_zip(spark, a, b):
    """positional_join (operators/positional_join.py) must equal
    null-padded zip over the declared orderings for any two lists,
    including unequal lengths and duplicates."""
    from itertools import zip_longest

    from squirreling_spark.operators.positional_join import positional_join

    ldf = spark.createDataFrame([(v,) for v in a] or [(None,)], "lv int")
    rdf = spark.createDataFrame([(v,) for v in b] or [(None,)], "rv int")
    la, lb = (a or [None]), (b or [None])
    got = sorted(
        ((r["lv"], r["rv"]) for r in positional_join(
            ldf, rdf, left_order=["lv"], right_order=["rv"]
        ).collect()),
        key=lambda p: (p[0] is None, p[0], p[1] is None, p[1]),
    )
    want = sorted(
        zip_longest(sorted(la, key=lambda v: (v is None, v)),
                    sorted(lb, key=lambda v: (v is None, v))),
        key=lambda p: (p[0] is None, p[0], p[1] is None, p[1]),
    )
    assert got == want


@_SETTINGS
@given(
    points=st.lists(st.integers(-20, 120), min_size=0, max_size=12),
    ivs=st.lists(
        st.tuples(st.integers(-20, 120), st.integers(0, 30)),
        min_size=0, max_size=10,
    ),
    width=st.sampled_from([1, 3, 7, 50]),
)
def test_range_join_matches_bruteforce(spark, points, ivs, width):
    """range_join (operators/range_join.py) — binned hash equi-join —
    against the quadratic containment reference, across bin widths that
    both undershoot and overshoot the interval lengths (each interval
    must appear in EVERY bin it spans, a pair exactly once)."""
    from squirreling_spark.operators.range_join import range_join

    ldf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)] or [(-1, -999)],
        "pid int, point int",
    )
    rdf = spark.createDataFrame(
        [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)]
        or [(-1, -999, -999)],
        "iid int, lo int, hi int",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(ldf, rdf, "point", "lo", "hi", width).collect()
    )
    lrows = list(enumerate(points)) or [(-1, -999)]
    rrows = [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)] or [
        (-1, -999, -999)
    ]
    want = sorted(
        (pid, iid)
        for pid, p in lrows
        for iid, lo, hi in rrows
        if lo <= p <= hi
    )
    assert got == want


@_SETTINGS
@given(
    terms=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=40,
    ),
    width=st.sampled_from([4, 64, 4096]),
)
def test_cms_guarantee_on_random_input(spark, terms, width):
    """The one-sided CMS guarantee (estimate >= exact, exact when no
    collision) must hold for ANY input — including width=4, where
    collisions are certain and only the inequality side survives."""
    from squirreling_spark.pipeline.sketch import cms_build, cms_estimate

    toks = spark.createDataFrame([(t,) for t in terms], "term string")
    sketch = cms_build(toks, "term", width=width, depth=3)
    exact = toks.groupBy("term").count().withColumnRenamed("count", "exact")
    est = cms_estimate(exact, sketch, "term", width=width, depth=3)
    rows = est.collect()
    assert len(rows) == len(set(terms))
    for r in rows:
        assert r["cms_count"] >= r["exact"], (r["term"], width)
    total = sum(1 for _ in terms)
    mass = sketch.groupBy("row").sum("cnt").collect()
    assert all(m[1] == total for m in mass)


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1, max_size=30,
    ),
)
def test_connected_components_both_arms_match_union_find(spark, edges):
    """connected_components (pipeline/dedup.py) on random graphs —
    self-loops, duplicate edges, both orientations — must equal an
    independent Python union-find, for BOTH the driver arm and the
    forced distributed (pointer-jumping) arm."""
    from squirreling_spark.pipeline.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # canonical label = min node id in the component
    comp = {}
    for n, r in want.items():
        comp.setdefault(find(r), []).append(n)
    want = {n: min(ns) for r, ns in comp.items() for n in ns}

    edf = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    for thresh in (10**9, 0):  # driver arm, then forced distributed arm
        got = {
            r["node"]: r["label"]
            for r in connected_components(
                edf, "id_a", "id_b", driver_threshold=thresh
            ).collect()
        }
        assert got == want, (thresh, got, want)


_nfc_text = st.one_of(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"), max_codepoint=0x10FFF
        ),
        max_size=10,
    ),
    st.sampled_from(
        ["café", "é", "Å", "Å", "가",
         "q̣̇", "̣̇", "ｶﾞ", "क़"]
    ),
)


@_SETTINGS
@given(texts=st.lists(_nfc_text, min_size=1, max_size=8))
def test_nfc_normalize_cross_implementation(spark, texts):
    """Python unicodedata NFC (the Spark operator's Arrow UDF) must agree
    byte-for-byte with DuckDB's utf8proc nfc_normalize on ARBITRARY
    unicode — two independent Unicode implementations fuzzed against each
    other (combining reordering under canonical ordering, singletons,
    Hangul, composition exclusions like U+0958)."""
    from squirreling_spark.pipeline.text import nfc_normalize_docs

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_chars_nfc"], r["fp_nfc"], r["changed"])
        for r in nfc_normalize_docs(sdf, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    con.register("nfc_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        int(d): (int(n), fp, bool(ch))
        for d, n, fp, ch in con.execute(
            "SELECT doc_id, length(nfc_normalize(text)),"
            " md5(nfc_normalize(text)), text != nfc_normalize(text)"
            " FROM nfc_t"
        ).fetchall()
    }
    con.close()
    assert got == want


_bm25_word = st.sampled_from(["query", "merge", "scan", "row", "agg", "x"])
_bm25_doc = st.lists(_bm25_word, min_size=1, max_size=12).map(" ".join)


@_SETTINGS
@given(docs=st.lists(_bm25_doc, min_size=1, max_size=10))
def test_bm25_scores_bit_identical_cross_engine(spark, docs):
    """bm25_rank's rational-idf fixed-order arithmetic claim, fuzzed: for
    arbitrary tiny corpora the double scores must be BIT-identical to the
    DuckDB oracle (no tolerance), and invariant to partitioning."""
    from squirreling_spark.pipeline.retrieval import bm25_oracle_sql, bm25_rank

    terms = ["query", "merge"]
    rows = [(i, d) for i, d in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_rank(sdf, "text", "doc_id", terms, topk=20).collect()
    ]
    got2 = [
        (r["doc_id"], r["score"])
        for r in bm25_rank(
            sdf.repartition(5), "text", "doc_id", terms, topk=20
        ).collect()
    ]
    assert got == got2  # partitioning-invariant
    con = duckdb.connect()
    con.register("bm_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = bm25_oracle_sql(terms, topk=20, table="bm_t")
    # oracle columns are (doc_id, dl, tf1, tf2, score) — id first, score last
    want = [(int(r[0]), r[-1]) for r in con.execute(sql).fetchall()]
    con.close()
    # compare (id, exact double) pairs in rank order
    assert [(d, s) for d, s in got] == want


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),           # skewed key space (hot keys)
            st.integers(-(2**40), 2**40),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_salted_agg_equals_plain_agg(spark, rows):
    """Salt-invariance, fuzzed: the two-phase salted aggregation must
    equal the plain groupBy bit-for-bit for ANY input (including hot-key
    distributions — the case it exists for) and any salt assignment."""
    from pyspark.sql import functions as F

    from squirreling_spark.operators.skew import salted_agg

    sdf = spark.createDataFrame(rows, "k bigint, v bigint")
    got = {
        (r["k"]): (r["n"], r["s"])
        for r in salted_agg(
            sdf,
            ["k"],
            aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.sum("v").alias("ps"),
            ],
            final_aggs=[
                F.sum("pn").cast("bigint").alias("n"),
                F.sum("ps").cast("bigint").alias("s"),
            ],
        ).collect()
    }
    want = {
        (r["k"]): (r["n"], r["s"])
        for r in sdf.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
        )
        .collect()
    }
    assert got == want


_dw = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
_ddoc = st.lists(_dw, min_size=3, max_size=25).map(" ".join)


@_SETTINGS
@given(
    docs=st.lists(_ddoc, min_size=1, max_size=6),
    bench=st.lists(_ddoc, min_size=1, max_size=3),
)
def test_decontaminate_flags_are_sound(spark, docs, bench):
    """Soundness fuzz: every (doc, bench) match decontaminate_neardup
    reports must have TRUE shingle Jaccard >= threshold against that
    benchmark item (the exact-verify stage must never pass a band-only
    collision through), and max_jaccard must equal the brute-force value
    for the reported top match."""
    from squirreling_spark.pipeline.dedup import decontaminate_neardup

    tau = 0.35
    drows = [(i, d) for i, d in enumerate(docs)]
    brows = [(100 + i, b) for i, b in enumerate(bench)]
    sdf = spark.createDataFrame(drows, "doc_id bigint, text string")
    bdf = spark.createDataFrame(brows, "bench_id bigint, text string")
    out = decontaminate_neardup(
        sdf, bdf, "text", "doc_id", threshold=tau
    ).collect()

    def sh(t):
        toks = t.split(" ")
        if len(toks) < 3:
            return {t}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    dsh = {i: sh(d) for i, d in drows}
    bsh = {i: sh(b) for i, b in brows}
    for r in out:
        a, b = dsh[r["doc_id"]], bsh[r["top_bench_id"]]
        j = round(len(a & b) / len(a | b), 6)
        assert j >= tau, (r, j)
        assert r["max_jaccard"] <= max(
            round(len(dsh[r["doc_id"]] & bs) / len(dsh[r["doc_id"]] | bs), 6)
            for bs in bsh.values()
        )
