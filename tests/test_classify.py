"""Hashed-linear quality classifier: the two weight paths (row-local
closed form vs broadcast weights table) must produce identical decisions,
the closed form must stay shuffle-free, and the bloom-prefiltered dedup
must equal plain incremental dedup even across planted collisions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_classifier_paths_equal(spark):
    """Closed-form scoring == broadcast-weights scoring when the weights
    table materializes the same hash-derived weights (both accumulate in
    exact decimal, so equality is exact, not approximate)."""
    from squirreling_spark.pipeline.classify import (
        hashed_weights_table,
        linear_quality_score,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "lorem ipsum dolor sit amet"),
        (3, ""),
        (4, "   "),
        (5, "repeated repeated repeated repeated"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    n = 1 << 12
    closed = linear_quality_score(
        df, "text", "doc_id", n_buckets=n
    ).orderBy("doc_id")
    w = hashed_weights_table(spark, n)
    joined = linear_quality_score(
        df, "text", "doc_id", n_buckets=n, weights=w
    ).orderBy("doc_id")
    assert closed.collect() == joined.collect()


def test_classifier_closed_form_no_shuffle(spark):
    """The default path is a row-local fold: no exchange, no Python
    evaluator — it scores at scan speed."""
    from squirreling_spark.pipeline.classify import linear_quality_score

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        linear_quality_score(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_classifier_empty_doc_gets_bias(spark):
    from squirreling_spark.pipeline.classify import linear_quality_score

    df = spark.createDataFrame([(1, "")], "doc_id int, text string")
    row = linear_quality_score(df, "text", "doc_id", bias=0.25).collect()[0]
    assert row["n_tokens"] == 0
    assert row["logit"] == pytest.approx(0.25)
    assert bool(row["keep"]) is True


def test_bloom_dedup_equals_exact(spark):
    """Bloom prefilter must not change the RESULT — only which rows pay
    for verification. Planted: a true duplicate of a stored doc (bloom
    hit, verified dup → dropped) and fresh docs (kept)."""
    from squirreling_spark.pipeline.dedup import (
        bloom_incremental_dedup,
        incremental_dedup,
        normalized_fingerprint,
    )

    store_docs = spark.createDataFrame(
        [(i, f"stored document number {i}") for i in range(50)],
        "doc_id int, text string",
    )
    seen = store_docs.select(
        normalized_fingerprint("text").alias("fingerprint")
    )
    new_docs = spark.createDataFrame(
        [(100, "stored document number 7"),   # exact dup of stored
         (101, "Stored  Document   Number 9"),  # dup after normalization
         (102, "a genuinely new document"),
         (103, "another new one"),
         (104, "a genuinely new document")],   # batch-internal dup
        "doc_id int, text string",
    )
    got = bloom_incremental_dedup(
        new_docs, seen, "text", "doc_id", m=1 << 14, k=5
    )
    want = incremental_dedup(new_docs, seen, "text", "doc_id")
    assert (
        sorted(r["fingerprint"] for r in got.collect())
        == sorted(r["fingerprint"] for r in want.collect())
    )
    by_id = {r["keep_id"]: r for r in got.collect()}
    assert set(by_id) == {102, 103}
    assert by_id[102]["n_copies"] == 2  # batch-internal dup collapsed
    # true dups of the store never appear, regardless of bloom path
    assert 100 not in by_id and 101 not in by_id


def test_bloom_false_positive_still_correct(spark):
    """With a degenerate one-bit space (m=1) every position collides:
    all batch docs become bloom candidates (false positives), all must
    survive the exact verify. False negatives are impossible by
    construction."""
    from squirreling_spark.pipeline.dedup import bloom_incremental_dedup

    seen = spark.createDataFrame(
        [("deadbeef" * 4,)], "fingerprint string"
    )
    new_docs = spark.createDataFrame(
        [(1, "fresh one"), (2, "fresh two")], "doc_id int, text string"
    )
    out = bloom_incremental_dedup(
        new_docs, seen, "text", "doc_id", m=1, k=2
    ).collect()
    assert sorted(r["keep_id"] for r in out) == [1, 2]
    assert all(r["bloom_checked"] for r in out)  # every row was verified


def test_langid_known_texts(spark):
    """Hand-scored fixtures: profile trigrams at known positions give
    exact integer scores; the argmax picks the right language; docs with
    no profile hit fall back to 'und' with score 0."""
    from squirreling_spark.pipeline.classify import langid_ngram

    rows = [
        (1, "the thing of the day"),     # en-heavy
        (2, "der schein ich und die"),   # de-heavy
        (3, "xyzq"),                     # no profile hits -> und
        (4, ""),                         # empty -> und, 0 grams
        (5, None),                       # null -> und, 0 grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["lang_pred"], r["score"], r["n_grams"])
        for r in langid_ngram(docs).collect()
    }
    assert got[1][0] == "en" and got[1][1] > 0
    assert got[2][0] == "de" and got[2][1] > 0
    assert got[3] == ("und", 0, 2)
    assert got[4] == ("und", 0, 0)
    assert got[5] == ("und", 0, 0)
    # exact score, hand-counted: "the thing of the day" lowercased —
    # 'the' occurs at positions 1 and 14 (2 hits x9), ' th' at 13 and
    # before 'thing'? no — ' th' occurs at ' thing'(4) and ' the'(13)
    # (2 x6), 'he ' at 'the '(2) and 'he d'? 'the day' (2 x6), ' of'
    # once (x4), 'ing' once (x5). en = 2*9+2*6+2*6+4+5 = 51.
    assert got[1] == ("en", 51, 18)


def test_langid_tiebreak_and_validation(spark):
    """Equal top scores break to the lexicographically smallest language;
    malformed profiles (self-overlapping grams, non-3-char, bad weights)
    are rejected before any job runs."""
    import pytest as _pytest

    from squirreling_spark.pipeline.classify import langid_ngram

    # 'que' carries weight 5 for BOTH fr and es -> tie -> 'es' < 'fr'
    docs = spark.createDataFrame([(1, "que")], "doc_id long, text string")
    [r] = langid_ngram(docs).collect()
    assert (r["lang_pred"], r["score"]) == ("es", 5)

    for bad in [
        [("xx", "aba", 1)],   # g[0] == g[2] self-overlap
        [("xx", "ab", 1)],    # not 3 chars
        [("xx", "abc", 0)],   # non-positive weight
    ]:
        with _pytest.raises(ValueError):
            langid_ngram(docs, profiles=bad)


def test_langid_plan_is_row_local(spark):
    """The 100 TB property: language ID compiles the profile INTO the row
    expression — the physical plan has NO join, NO explode/generate, NO
    exchange; scoring runs at scan speed inside one projection."""
    from squirreling_spark.pipeline.classify import langid_ngram

    docs = spark.createDataFrame(
        [(1, "the quick brown fox")], "doc_id long, text string"
    )
    plan = (
        langid_ngram(docs)._jdf.queryExecution().executedPlan().toString()
    )
    for op in ("Join", "Generate", "Exchange"):
        assert op not in plan, (op, plan)


def test_langid_n_grams_counts_raw_text(spark):
    """n_grams is defined over the RAW text, not the lowered copy (r10
    advice): U+0130 lowercases to 2 code points on the JVM, which must
    not inflate the gram-position count."""
    from squirreling_spark.pipeline.classify import langid_ngram

    docs = spark.createDataFrame(
        [(1, "İİİİ")], "doc_id long, text string"
    )
    [r] = langid_ngram(docs).collect()
    assert r["n_grams"] == 2  # len(raw)=4 -> 2 trigram positions


def test_langid_profile_literal_fidelity(spark):
    """Grams that would break SQL string-literal fidelity across engines
    (backslashes — Spark escapes them, DuckDB doesn't — quotes, control
    chars) are rejected up front (r10 advice)."""
    import pytest as _pytest

    from squirreling_spark.pipeline.classify import langid_ngram

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    for bad_gram in ["a\\b", "a'b", "a\tb", "a\x7fb"]:
        with _pytest.raises(ValueError):
            langid_ngram(docs, profiles=[("xx", bad_gram, 1)])


def test_langid_russian_is_a_shipped_default(spark):
    """r11 verdict task 8: the Cyrillic (Russian) profile is a DEFAULT —
    no profiles= knob needed — and Latin-script predictions are
    unchanged by its presence (Cyrillic grams can't occur in them)."""
    from squirreling_spark.pipeline.classify import (
        LANG_PROFILES,
        langid_ngram,
    )

    assert "ru" in {lang for lang, _, _ in LANG_PROFILES}
    rows = [
        (1, "the thing of the day and the morning"),
        (2, "что приятного остается при всего"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["lang_pred"], r["score"])
        for r in langid_ngram(docs).collect()
    }
    assert got[1][0] == "en"
    assert got[2][0] == "ru" and got[2][1] > 0


def test_langid_custom_profile_non_latin_oracle_parity(spark):
    """Caller-supplied profiles (r10 verdict task 8): extend the default
    table (which now ships Russian) with a Greek profile and verify
    (a) the custom non-Latin script scores and wins on Greek text,
    (b) the Spark operator and the independent DuckDB oracle algorithm
    agree row-for-row on a 6-language fixture (the cross-engine
    lower()/length()/replace() identity holds for BMP scripts)."""
    import duckdb

    from squirreling_spark.pipeline.classify import (
        LANG_PROFILES,
        langid_ngram,
        langid_oracle_sql,
    )

    el = [
        ("el", "και", 7), ("el", " το", 6), ("el", "την", 5),
        ("el", "της", 5), ("el", "ερα", 4),
    ]
    profs = LANG_PROFILES + el
    rows = [
        (1, "the thing of the day and the morning"),
        (2, "der schein ich und die sonne"),
        (3, "le jour les questions de la vie"),
        (4, "что приятного остается при всего"),
        (5, "de la que el gato en la casa"),
        (6, "και το καλοκαιρι της ημερας και την θαλασσα"),
        (7, ""),
        (8, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["lang_pred"], r["score"], r["n_grams"])
        for r in langid_ngram(docs, profiles=profs).collect()
    }
    assert got[1][0] == "en"
    assert got[2][0] == "de"
    assert got[4][0] == "ru" and got[4][1] > 0
    assert got[6][0] == "el" and got[6][1] > 0
    assert got[7] == ("und", 0, 0) and got[8] == ("und", 0, 0)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            langid_oracle_sql("documents", profiles=profs)
        ).fetchall()
    }
    assert oracle == got, (oracle, got)
