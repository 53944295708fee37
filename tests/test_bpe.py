"""BPE trainer semantics: greedy left-to-right merging over the wrapped
representation, overlap counting, deterministic tie-break, multi-round
merges into merged tokens."""

from squirreling_spark.pipeline.bpe import bpe_train


def _rules(spark, texts, merges):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_train(df, "text", merges=merges).collect()
    ]


def test_overlapping_pairs_counted_merged_greedily(spark):
    # "aaaa": three adjacent (a,a) positions counted; the merge itself is
    # greedy left-to-right, so round 2's best pair is (aa,aa) from
    # "aaaa" -> <aa><aa> while "aaa" -> <aa><a> contributes (aa,a).
    rules = _rules(spark, ["aaaa aaaa aaa"], 2)
    assert rules[0] == (1, "a", "a", "aa", 2 * 3 + 2)
    assert rules[1][1:4] == ("aa", "aa", "aaaa")


def test_tiebreak_is_lexicographic(spark):
    # (a,b) and (b,a) both occur twice ("abab": ab x2, ba x1... use two
    # words): "ab ab" gives (a,b)=2; "ba ba" gives (b,a)=2 -> (a,b) wins.
    rules = _rules(spark, ["ab ab ba ba"], 1)
    assert rules[0] == (1, "a", "b", "ab", 2)


def test_merges_build_on_merged_tokens(spark):
    # "abc" x3: round 1 (a,b) vs (b,c) tie -> (a,b); round 2 merges the
    # MERGED token (ab, c).
    rules = _rules(spark, ["abc abc abc"], 2)
    assert rules[0] == (1, "a", "b", "ab", 3)
    assert rules[1] == (2, "ab", "c", "abc", 3)


def test_word_boundaries_and_case_contract(spark):
    # Words are [a-z]+ runs of the RAW text: "Go-cart" contributes "o"
    # and "cart"; pairs never span word boundaries.
    rules = _rules(spark, ["Go-cart cart"], 1)
    assert rules[0][1:4] == ("a", "r", "ar") or rules[0][1:4] == ("c", "a", "ca")
    # deterministic: (a,r) and (c,a) and (r,t) all have count 2 -> lex
    # smallest (a,r) wins
    assert rules[0] == (1, "a", "r", "ar", 2)


def test_exhausted_corpus_stops_early(spark):
    # single-char words have no pairs: training stops with no rules.
    assert _rules(spark, ["a b c a"], 4) == []


def test_subword_freqs_segment_with_trained_vocab(spark):
    from squirreling_spark.pipeline.bpe import bpe_subword_freqs

    # merges learned: (a,b)->ab then (ab,c)->abc; "ab" alone stays "ab",
    # "abd" segments to [ab, d].
    df = spark.createDataFrame(
        [("abc abc abc ab abd",)], ["text"]
    )
    got = {
        r["token"]: (r["n_occurrences"], r["token_len"])
        for r in bpe_subword_freqs(df, "text", merges=2).collect()
    }
    assert got == {"abc": (3, 3), "ab": (2, 2), "d": (1, 1)}


def test_encode_docs_counts_and_order_preserving_fp(spark):
    from squirreling_spark.pipeline.bpe import bpe_encode_docs

    # corpus: "ab" dominates -> merge 1 = (a,b)->ab. Doc 1 "ab ab cd":
    # 3 words; "ab" encodes to 1 token, "cd" stays 2 -> 4 tokens.
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab ba")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in bpe_encode_docs(df, "text", "doc_id", merges=1).collect()
    }
    assert rows[1]["n_words"] == 3 and rows[1]["n_tokens"] == 4
    assert rows[2]["n_words"] == 2 and rows[2]["n_tokens"] == 3  # ab + b,a
    # fingerprint is order-preserving: "ab ab cd" != "cd ab ab"
    df2 = spark.createDataFrame(
        [(1, "cd ab ab"), (2, "ab ba")], "doc_id bigint, text string"
    )
    rows2 = {
        r["doc_id"]: r
        for r in bpe_encode_docs(df2, "text", "doc_id", merges=1).collect()
    }
    assert rows2[1]["fp_tokens"] != rows[1]["fp_tokens"]
    assert rows2[2]["fp_tokens"] == rows[2]["fp_tokens"]


def test_wordpiece_argmax_differs_from_bpe(spark):
    """The likelihood score must pick rare-but-collocated over merely
    frequent: 'ab' is the most FREQUENT pair but a and b are common
    solo, while q/z occur ONLY together (perfect collocation)."""
    from squirreling_spark.pipeline.bpe import (
        WP_SCALE,
        bpe_train,
        wordpiece_train,
    )

    text = " ".join(["ab"] * 10 + ["ax"] * 20 + ["by"] * 20 + ["qz"] * 2)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    bpe = bpe_train(df, "text", merges=1).collect()[0]
    wp = wordpiece_train(df, "text", merges=1).collect()[0]
    assert (bpe["lhs"], bpe["rhs"]) == ("a", "x")  # count 20, tie->lex
    assert (wp["lhs"], wp["rhs"]) == ("q", "z")    # 2/(2*2) beats all
    # score_key is the exact quantized rational
    assert wp["score_key"] == 2 * WP_SCALE // (2 * 2)
    assert wp["pair_count"] == 2


def test_wordpiece_merges_build_on_merged_tokens(spark):
    """Round 2 must see round 1's merged token as a single unit."""
    from squirreling_spark.pipeline.bpe import wordpiece_train

    # only word: "qzx" repeated — round 1 merges the best pair, round 2
    # must merge the RESULT with the remaining char.
    df = spark.createDataFrame(
        [(1, "qzx qzx qzx")], "doc_id bigint, text string"
    )
    rules = wordpiece_train(df, "text", merges=2).collect()
    assert len(rules) == 2
    assert rules[0]["merged"] in ("qz", "zx")
    assert rules[1]["merged"] == "qzx"
    # round 3 has nothing left to merge -> early stop
    rules3 = wordpiece_train(df, "text", merges=3).collect()
    assert len(rules3) == 2
