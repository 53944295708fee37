"""Removal transforms (pipeline/dedup.remove_dup_substrings,
pipeline/corpus.remove_boilerplate_lines): cleaned-text semantics the
graded row can't isolate — short-doc whole-window removal, blank-line
preservation, min_docs thresholds, order preservation.
"""
from squirreling_spark.pipeline.corpus import remove_boilerplate_lines
from squirreling_spark.pipeline.dedup import remove_dup_substrings


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_remove_dup_substrings_spans(spark):
    shared = " ".join(f"w{i}" for i in range(16))
    rows = [
        (0, "alpha beta " + shared + " gamma delta"),
        (1, "start words " + shared + " end words"),
        (2, "totally unique words only here nothing shared at all"),
    ]
    out = {r.doc_id: r for r in remove_dup_substrings(_df(spark, rows), "text", "doc_id").collect()}
    # the 16 shared tokens vanish from both docs; the unique doc is intact
    assert out[0].clean_text == "alpha beta gamma delta"
    assert out[1].clean_text == "start words end words"
    assert out[0].n_removed == 16 and out[1].n_removed == 16
    assert out[2].n_removed == 0
    assert out[2].clean_text == rows[2][1]


def test_remove_dup_substrings_short_doc_whole_window(spark):
    rows = [
        (0, "tiny duplicated document"),
        (1, "tiny duplicated document"),
        (2, "another short one"),
    ]
    out = {r.doc_id: r for r in remove_dup_substrings(_df(spark, rows), "text", "doc_id").collect()}
    # <16-token docs form one whole-doc window; duplicates empty out but
    # keep their row
    assert out[0].clean_text == "" and out[0].n_removed == 3
    assert out[1].clean_text == ""
    assert out[2].clean_text == "another short one" and out[2].n_removed == 0


def test_remove_boilerplate_lines(spark):
    rows = [
        (0, "unique opening\ncookie banner text\nreal content zero"),
        (1, "real content one\nCookie Banner Text\nmore body"),
        (2, "real content two\n\ncookie banner text"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(_df(spark, rows), "text", "doc_id").collect()
    }
    # normalized (case/trim) match across >=2 docs drops the line in ALL
    assert out[0].clean_text == "unique opening\nreal content zero"
    assert out[1].clean_text == "real content one\nmore body"
    # blank lines are preserved, never treated as boilerplate
    assert out[2].clean_text == "real content two\n"
    assert [out[i].n_removed for i in range(3)] == [1, 1, 1]
    assert out[2].n_lines == 3


def test_remove_boilerplate_min_docs_threshold(spark):
    rows = [
        (0, "shared line\nbody a"),
        (1, "shared line\nbody b"),
        (2, "shared line\nbody c"),
    ]
    out = remove_boilerplate_lines(_df(spark, rows), "text", "doc_id", min_docs=4)
    assert all(r.n_removed == 0 for r in out.collect())


def test_pack_sequences_placement(spark):
    from squirreling_spark.pipeline.pack import pack_sequences

    rows = [
        (0, "a b c"),            # eff 4 -> seq0 [0,4)
        (1, " ".join(["w"] * 9)),  # eff 10 -> [4,14): spans seq0+seq1
        (2, "x y"),              # eff 3 -> [14,17)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sorted(
        (r.seq_id, r.doc_id, r.doc_start, r.n_toks)
        for r in pack_sequences(df, "text", "doc_id", seq_len=8).collect()
    )
    assert out == [
        (0, 0, 0, 4),   # doc0 fully in seq0
        (0, 1, 0, 4),   # doc1 tokens 0-3 fill seq0
        (1, 1, 4, 6),   # doc1 tokens 4-9 (incl. EOS) open seq1
        (1, 2, 0, 2),   # doc2 tokens 0-1 continue seq1
        (2, 2, 2, 1),   # doc2 token 2 (EOS) spills into seq2
    ]


def test_pack_sequences_custom_id_col(spark):
    # regression (r8 advice): id_col != 'doc_id' hit an unresolved-column
    # error because the bucket expression used the pre-rename name
    from squirreling_spark.pipeline.pack import pack_sequences

    rows = [(10, "a b c"), (11, "d e")]
    df = spark.createDataFrame(rows, "docno bigint, text string")
    out = sorted(
        (r.seq_id, r.doc_id, r.doc_start, r.n_toks)
        for r in pack_sequences(df, "text", "docno", seq_len=8).collect()
    )
    assert out == [(0, 10, 0, 4), (0, 11, 0, 3)]


def test_pack_sequences_noncastable_ids_kept(spark):
    # ids that don't cast to BIGINT fall into one leading NULL bucket
    # (ordered first) instead of being silently dropped via a NULL join key
    from squirreling_spark.pipeline.pack import pack_sequences

    rows = [("doc-a", "a b c"), ("doc-b", "d e")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = sorted(
        (r.seq_id, r.doc_id, r.doc_start, r.n_toks)
        for r in pack_sequences(df, "text", "doc_id", seq_len=8).collect()
    )
    assert out == [(0, "doc-a", 0, 4), (0, "doc-b", 0, 3)]


def test_pack_sequences_bucketing_invariant(spark):
    # the two-level cumsum must equal the naive global cumsum regardless
    # of bucket size
    from squirreling_spark.pipeline.pack import pack_sequences

    rows = [(i, " ".join(["t"] * (3 + i % 11))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    base = sorted(map(tuple, pack_sequences(df, "text", "doc_id", 64, bucket_size=4096).collect()))
    for bs in (1, 7, 50):
        got = sorted(map(tuple, pack_sequences(df, "text", "doc_id", 64, bucket_size=bs).collect()))
        assert got == base, bs
    # every sequence except the last is exactly full
    import collections

    fill = collections.Counter()
    for seq_id, _, _, n in base:
        fill[seq_id] += n
    last = max(fill)
    assert all(v == 64 for s, v in fill.items() if s != last)


def test_pack_sequences_plan_no_global_row_window(spark, sf001):
    # the document-row window must be PARTITIONED by the bucket key; only
    # the bucket-count-sized window (rows = corpus/bucket_size, above the
    # aggregate) may be unpartitioned — a global row-level window would be
    # a single task at 100 TB
    from squirreling_spark.pipeline.pack import pack_sequences

    df = spark.read.parquet(f"{sf001}/documents.parquet")
    plan = (
        pack_sequences(df, "text", "doc_id")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("windowspecdefinition(") == 2
    assert "windowspecdefinition(_bkt#" in plan  # row window bucket-keyed


def test_scrub_pii_patterns(spark):
    from squirreling_spark.pipeline.text import scrub_pii

    rows = [
        (0, "mail me at jo.doe+x@sub.example.co.uk today"),
        (1, "call +1 (415) 555-0134 or 415.555.0199 now"),
        (2, "server at 10.0.255.7 and 192.168.1.1 up"),
        (3, "clean text with no personal data at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in scrub_pii(df, "text", "doc_id").collect()}
    assert out[0].n_email == 1 and "<EMAIL>" in out[0].scrubbed
    assert "jo.doe" not in out[0].scrubbed
    assert out[1].n_phone == 2 and out[1].scrubbed.count("<PHONE>") == 2
    assert out[2].n_ipv4 == 2 and out[2].scrubbed.count("<IPV4>") == 2
    assert out[3].scrubbed == rows[3][1]
    assert (out[3].n_email, out[3].n_phone, out[3].n_url, out[3].n_ipv4) \
        == (0, 0, 0, 0)


def test_lm_bucket_sample_shape(spark):
    from squirreling_spark.pipeline.corpus import lm_bucket_sample

    rows = [
        (i, ("the of and to in is " * 6 + f"extra w{i} " * (i % 5)) if i % 3 == 0
         else ("zq xv kj wp mn bb " * 6 + f"junk j{i} " * (i % 5)) if i % 3 == 1
         else ("the of zq xv and kj " * 6 + f"mid m{i} " * (i % 5)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ref = df.filter(df.doc_id % 3 == 0)  # reference-like = stopword runs
    out = lm_bucket_sample(df, ref, "text", "doc_id").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # reference-like docs score highest -> head; gibberish -> tail
    head_ids = {r.doc_id for r in by_bucket["head"]}
    assert head_ids and all(i % 3 == 0 for i in head_ids)
    tail_ids = {r.doc_id for r in by_bucket["tail"]}
    assert all(i % 3 == 1 for i in tail_ids)
    # keep rates bind per bucket: head all kept is not guaranteed by the
    # md5 rule per-row, but rates order must hold in aggregate
    frac = {
        b: sum(r.kept for r in rs) / len(rs) for b, rs in by_bucket.items()
    }
    assert frac["head"] >= frac["middle"] >= frac["tail"]
