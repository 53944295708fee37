"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All codegen'd built-ins — no Python in the loop —
so they run at full scan speed over 100 TB of documents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from squirreling_spark.qutil import spread

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "fr": ["le", "la", "les", "et", "est"],
}


def tokens(text_col: str) -> Column:
    """Whitespace tokenization of pre-normalized text."""
    return F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token count (whitespace + BPE-ish subword estimate), char count,
    distinct-token count, mean token length."""
    toks = tokens(text_col)
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    # BPE-ish proxy: ~1 token per 4 chars, at least one per word.
    bpe = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.greatest(F.ceil(F.length(t) / 4).cast("int"), F.lit(1)),
    )
    return spread(df, by=[id_col]).select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(total_len.cast("double") / n, 6).alias("mean_token_len"),
        bpe.alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality score in [0,1]: stopword ratio, type-token ratio,
    length band. Deterministic closed-form — reproducible at any scale."""
    toks = tokens(text_col)
    n = F.size(toks)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), sw)).cast("double")
    stop_ratio = F.round(
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.when(t.isin(*STOPWORDS["en"]), 1).otherwise(0),
        ).cast("double")
        / n,
        6,
    )
    ttr = F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6)
    len_band = (
        F.when((n >= 20) & (n <= 2000), F.lit(1.0))
        .when(n >= 5, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    score = F.round(
        (F.least(stop_ratio * 4, F.lit(1.0)) + ttr + len_band) / 3, 6
    )
    return spread(df, by=[id_col]).select(
        F.col(id_col),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        len_band.alias("length_band"),
        n_stop.alias("n_stopword_types"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-profile language ID: count hits per language's stopword
    list, argmax with lexicographic tie-break (plus a CJK codepoint check)."""
    toks = tokens(text_col)

    def hit_counter(words):
        # F.aggregate requires an exactly-2-arg merge lambda; bind the
        # stopword list via closure.
        return lambda acc, tok: acc + F.when(tok.isin(*words), 1).otherwise(0)

    scores = [
        F.struct(
            F.aggregate(toks, F.lit(0), hit_counter(words)).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    # array_max on struct(hits, lang): max hits, ties broken by lang DESC —
    # invert lang ordering is not needed for a deterministic heuristic; the
    # comparison is lexicographic over (hits, lang).
    best = F.array_max(F.array(*scores))
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(
            F.lit("unknown")
        )
    )
    return spread(df, by=[id_col]).select(
        F.col(id_col), pred.alias("pred_lang"), best.getField("hits").alias("hits")
    )


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Fused one-pass document profile: token stats + quality + language ID
    + fingerprints in a single select. At scale this is the operationally
    right shape — the four analyses share tokenization, and fusing them
    means one scan and zero joins; Catalyst CSE evaluates the shared
    subexpressions (split / distinct) once per row."""
    toks = tokens(text_col)
    n = F.size(toks)
    ndis = F.size(F.array_distinct(toks))
    sumlen = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    bpe = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, x: acc
        + F.greatest(F.ceil(F.length(x) / 4).cast("int"), F.lit(1)),
    )

    def hits(words):
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, tok: acc + F.when(tok.isin(*words), 1).otherwise(0),
        )

    lang_scores = [
        F.struct(hits(words).alias("hits"), F.lit(lang).alias("lang"))
        for lang, words in sorted(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*lang_scores))
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(
            F.lit("unknown")
        )
    )

    stop_ratio = F.round(hits(STOPWORDS["en"]).cast("double") / n, 6)
    ttr = F.round(ndis.cast("double") / n, 6)
    len_band = (
        F.when((n >= 20) & (n <= 2000), F.lit(1.0))
        .when(n >= 5, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    quality = F.round(
        (F.least(stop_ratio * 4, F.lit(1.0)) + ttr + len_band) / 3, 6
    )

    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    norm_toks = F.split(norm, " ")
    return spread(df, by=[id_col]).select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n.alias("n_tokens"),
        ndis.alias("n_distinct"),
        F.round(sumlen.cast("double") / n, 6).alias("mean_token_len"),
        bpe.cast("bigint").alias("n_bpe_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        len_band.alias("length_band"),
        quality.alias("quality"),
        pred.alias("pred_lang"),
        best.getField("hits").cast("bigint").alias("lang_hits"),
        F.md5(norm).alias("fp_exact"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(norm_toks)), " ")
        ).alias("fp_bag"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_prefix"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-tokenization step for LLM training sequences. Row-local: tokens →
    per-chunk slices → posexplode; one scan, no shuffle, no Python. Chunk
    count uses pure integer arithmetic so any engine reproduces it:
    1 + (n - window + stride - 1) div stride for n > window, else 1."""
    stride = window - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # int/int is double division in both engines; floor of a non-negative
    # quotient == integer division, exactly representable at these sizes.
    n_chunks = (
        F.when(n <= window, F.lit(1))
        .otherwise(F.floor((n - window + stride - 1) / F.lit(stride)) + 1)
        .cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.array_join(F.slice(toks, j * stride + 1, window), " "),
    )
    return spread(df, by=[id_col]).select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment from a salted md5 of the id
    — stable across runs, engines, partitionings, and appends (a given doc
    never migrates between splits when the corpus grows). Row-local."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split:"), F.col(id_col).cast("string"))), 1, 4), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return spread(df, by=[id_col]).select(
        F.col(id_col), bucket.cast("bigint").alias("bucket"), split.alias("split")
    )


# PII patterns restricted to the RE2 ∩ Java-regex common dialect so the
# same pattern strings run in Spark and the DuckDB oracle. Round 7:
# phone accepts the real-world separator forms ((415) 555-0134,
# 415.555.0199, +1 prefixes) — the country prefix is optional AS A
# GROUP, so a bare number can't feed its area-code digits to the
# prefix — and IPv4 joined the scrub set (C4/RefinedWeb/Dolma all
# strip or mask it).
PII_PATTERNS = {
    "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "phone": "(?:\\+?[0-9]{1,2}[ .\\-]?)?\\(?[0-9]{3}\\)?[ .\\-][0-9]{3}"
             "[ .\\-][0-9]{4}",
    "url": "https?://[^ ]+",
    "ipv4": "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
}


def scrub_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact emails/phones/URLs with typed placeholder tokens and report
    per-category hit counts. Chained regexp_replace — row-local codegen,
    scan-speed at any scale."""
    scrubbed = F.col(text_col)
    counts = {}
    for kind, pat in PII_PATTERNS.items():
        counts[kind] = F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return spread(df, by=[id_col]).select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        *[c.cast("bigint").alias(f"n_{k}") for k, c in counts.items()],
    )


def pack_sequences(
    chunks: DataFrame,
    token_col: str,
    order_cols: list[str],
    shard_col: str,
    budget: int = 512,
) -> DataFrame:
    """Greedy token-budget packing: assign ordered chunks to training
    sequences of ≤ ``budget`` tokens. Greedy fill is inherently sequential
    (each bin depends on every prior chunk), so it cannot be a window
    expression; it runs as an Arrow-batched ``applyInPandas`` per shard —
    shards (e.g. the hash_split bucket or a date partition) pack
    independently and in parallel, which is how a 100 TB corpus keeps the
    sequential step bounded: O(shard size) per task, deterministic given
    the (shard, order_cols) sort. Oversized single chunks get a bin of
    their own."""
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in chunks.schema.fields
    )
    schema = f"{out_fields}, seq_idx BIGINT, seq_tokens BIGINT"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        seq_idx, seq_tokens = [], []
        cur_seq, cur_tok = 0, 0
        for tok in pdf[token_col]:
            tok = int(tok)
            if cur_tok > 0 and cur_tok + tok > budget:
                cur_seq += 1
                cur_tok = 0
            seq_idx.append(cur_seq)
            cur_tok += tok
            seq_tokens.append(cur_tok)
        pdf["seq_idx"] = pd.Series(seq_idx, dtype="int64")
        # per-row running count is finalized below into the bin total
        totals = pdf.groupby("seq_idx")[token_col].sum().astype("int64")
        pdf["seq_tokens"] = pdf["seq_idx"].map(totals)
        return pdf

    return chunks.groupBy(shard_col).applyInPandas(pack, schema=schema)


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprints: exact md5 of normalized text, order-invariant
    md5 of the sorted distinct token set, and a locality-ish prefix hash."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = F.split(norm, " ")
    bag = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    return spread(df, by=[id_col]).select(
        F.col(id_col),
        F.md5(norm).alias("fp_exact"),
        bag.alias("fp_bag"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_prefix"),
    )


def nfc_normalize_docs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Unicode NFC normalization + change audit — the canonicalization
    step a multilingual corpus needs before dedup/fingerprinting (the
    same text arrives composed from one crawl and decomposed from
    another; NFC makes hash-based dedup see them as equal).

    Spark has no built-in normalizer, so this is an Arrow-batched pandas
    UDF (``unicodedata.normalize`` — same Unicode composition tables as
    the oracle's utf8proc ``nfc_normalize``). Scale shape: row-local
    scan-parallel batches, zero shuffles; the UDF output is materialized
    ONCE in its own projection (PythonUDF aliases are non-cheap, so
    CollapseProject keeps the two-step select and every downstream use
    references the single materialized attribute)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    staged = spread(df, by=[id_col]).select(
        F.col(id_col),
        F.col(text_col),
        _nfc(F.col(text_col)).alias("__nfc"),
    )
    return staged.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("n_chars_raw"),
        F.length("__nfc").cast("bigint").alias("n_chars_nfc"),
        (F.col(text_col) != F.col("__nfc")).alias("changed"),
        F.md5(F.col("__nfc")).alias("fp_nfc"),
    )


# The Gopher quality-filter stop list (Rae et al. 2021, appendix A1.1:
# "contains at least two of the following English words").
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: int = 3,
    max_mean_wlen: int = 10,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rule set (Rae et al. 2021, A1.1) — the
    canonical pretraining-corpus filter stack: word-count bounds, mean
    word length in [3, 10], symbol-to-word ratio ≤ 0.1 ('#' chars plus
    '...'/'…' ellipses), ≤ 90% of lines starting with a bullet, ≤ 30%
    ending with an ellipsis, ≥ 80% of words containing an alphabetic
    character, and ≥ 2 distinct Gopher stop words present.

    INTEGER-EXACT by construction: every ratio rule is evaluated by
    cross-multiplication over integer counts (10·symbols ≤ words,
    10·bullet_lines ≤ 9·lines, 10·ellipsis_lines ≤ 3·lines,
    10·alpha_words ≥ 8·words, 3·words ≤ Σwordlen ≤ 10·words) — no
    float division, so Spark and any oracle agree bit-for-bit, and the
    decision is partition-layout independent. All signals are row-local
    codegen expressions over one scan: zero shuffle, zero Python — at
    100 TB this fuses into the ingest projection.

    Output: (id, n_words, sum_wlen, n_symbols, n_lines, n_bullet_lines,
    n_ellipsis_lines, n_alpha_words, n_stopwords, keep)."""
    toks = tokens(text_col)
    txt = F.col(text_col)
    n_words = F.size(toks).cast("bigint")
    sum_wlen = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
    )
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#")))
    n_dots = (
        (F.length(txt) - F.length(F.replace(txt, F.lit("...")))) / 3
    ).cast("bigint")
    n_uni = F.length(txt) - F.length(F.replace(txt, F.lit("…")))
    n_symbols = (n_hash + n_dots + n_uni).cast("bigint")
    lines = F.split(txt, "\n")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin("•", "-", "*"),
        )
    ).cast("bigint")
    n_ell = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...")
            | F.rtrim(l).endswith("…"),
        )
    ).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("bigint")
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    ).cast("bigint")
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (sum_wlen >= min_mean_wlen * n_words)
        & (sum_wlen <= max_mean_wlen * n_words)
        & (n_symbols * 10 <= n_words)
        & (n_bullet * 10 <= n_lines * 9)
        & (n_ell * 10 <= n_lines * 3)
        & (n_alpha * 10 >= n_words * 8)
        & (n_stop >= min_stopwords)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        sum_wlen.alias("sum_wlen"),
        n_symbols.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell.alias("n_ellipsis_lines"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stopwords"),
        keep.alias("keep"),
    )


def c4_quality_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 heuristic cleaning rule set (Raffel et al. 2020, §2.2) — the
    line-and-page filter the original C4 pipeline ran over Common Crawl,
    complementing ``gopher_quality`` (Gopher judges a document; C4
    REWRITES it line-by-line, then judges the remainder):

    - keep only lines that end in a terminal punctuation mark
      (``.`` ``!`` ``?`` ``"``) after right-trim;
    - drop lines with fewer than ``min_words_per_line`` words;
    - drop lines containing the word "javascript" (case-insensitive
      substring, as in the original heuristic);
    - drop the whole page if it contains "lorem ipsum"
      (case-insensitive) or a ``{`` character (code leakage);
    - drop the page if the CLEANED text has fewer than
      ``min_sentences`` sentence-final marks (``.`` ``!`` ``?``).

    Every signal is a row-local codegen expression over one scan —
    zero shuffle, zero Python, exact integer/boolean decisions, so any
    SQL oracle agrees bit-for-bit and the pass fuses into the ingest
    projection at 100 TB. Sentence counting is the integer
    length-difference fold (no regex), identical in Spark and DuckDB.

    Output: (id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, keep, clean_text)."""
    txt = F.col(text_col)
    lines = F.split(txt, "\n")
    kept = F.filter(
        lines,
        lambda l: (
            F.rtrim(l).endswith(".")
            | F.rtrim(l).endswith("!")
            | F.rtrim(l).endswith("?")
            | F.rtrim(l).endswith('"')
        )
        & (F.size(F.split(F.trim(l), " ")) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sent = (
        (F.length(clean) - F.length(F.replace(clean, F.lit("."))))
        + (F.length(clean) - F.length(F.replace(clean, F.lit("!"))))
        + (F.length(clean) - F.length(F.replace(clean, F.lit("?"))))
    ).cast("bigint")
    has_lorem = F.lower(txt).contains("lorem ipsum")
    has_brace = txt.contains("{")
    keep = ~has_lorem & ~has_brace & (n_sent >= min_sentences)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep.alias("keep"),
        clean.alias("clean_text"),
    )

def html_main_content(
    df: DataFrame, html_col: str, id_col: str
) -> DataFrame:
    """Main-content extraction from raw HTML — the first transform every
    web-crawl pipeline (CCNet / C4 / trafilatura-class extractors) runs
    before any quality or dedup pass:

    - drop ``<script>``/``<style>`` blocks wholesale (their contents
      must never leak into the visible text);
    - drop LINK-DENSE lines (navigation/footer boilerplate): a line
      whose anchor text is at least half of its visible text,
      evaluated by integer cross-multiplication (2·anchor_len ≥
      vis_len) — the classic link-density heuristic;
    - strip remaining tags, decode the core entities (``&lt; &gt;
      &quot; &#39;`` then ``&amp;`` LAST, so ``&amp;lt;`` decodes to
      the literal ``&lt;``), normalize whitespace, drop blank lines.

    Every step is a JVM-side regex / higher-order-function expression
    in the regex subset Java and RE2 interpret identically (non-greedy
    spans, ``(?is)`` flags, ``[^>]`` classes — the same shared-subset
    contract as ``scrub_pii``): one scan, zero shuffle, zero Python.
    Anchor inner text is matched as ``[^<]*`` (tag-free), so nested
    markup inside an anchor undercounts its density — acceptable for
    the boilerplate-nav shape this targets.

    Output: (id, n_lines, n_link_dropped, n_script_blocks,
    n_style_blocks, clean_text)."""
    raw = F.col(html_col)

    def _count(pat):
        return F.size(
            F.regexp_extract_all(raw, F.lit(pat), F.lit(0))
        ).cast("bigint")

    deblocked = F.regexp_replace(
        F.regexp_replace(raw, r"(?is)<script[^>]*>.*?</script>", ""),
        r"(?is)<style[^>]*>.*?</style>",
        "",
    )

    def _vis(l):
        txt = F.trim(
            F.regexp_replace(
                F.regexp_replace(l, "<[^>]+>", " "), r"\s+", " "
            )
        )
        for ent, ch in (
            ("&lt;", "<"),
            ("&gt;", ">"),
            ("&quot;", '"'),
            ("&#39;", "'"),
            ("&amp;", "&"),
        ):
            txt = F.replace(txt, F.lit(ent), F.lit(ch))
        return txt

    def _alen(l):
        return F.aggregate(
            F.regexp_extract_all(
                l, F.lit("(?i)<a[^>]*>([^<]*)</a>"), F.lit(1)
            ),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.length(s),
        )

    per_line = F.transform(
        F.split(deblocked, "\n"),
        lambda l: F.struct(
            _vis(l).alias("vis"), _alen(l).alias("alen")
        ),
    )
    base = df.select(
        F.col(id_col),
        _count("(?i)<script").alias("n_script_blocks"),
        _count("(?i)<style").alias("n_style_blocks"),
        per_line.alias("__v"),
    )
    is_link = (
        lambda s: (F.length(s["vis"]) > 0)
        & (s["alen"] > 0)
        & (s["alen"] * 2 >= F.length(s["vis"]))
    )
    kept = F.filter(
        F.col("__v"), lambda s: (F.length(s["vis"]) > 0) & ~is_link(s)
    )
    return base.select(
        id_col,
        F.size("__v").cast("bigint").alias("n_lines"),
        F.size(F.filter(F.col("__v"), is_link))
        .cast("bigint")
        .alias("n_link_dropped"),
        "n_script_blocks",
        "n_style_blocks",
        F.array_join(F.transform(kept, lambda s: s["vis"]), "\n").alias(
            "clean_text"
        ),
    )


def markdown_sections(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """STRUCTURE-AWARE document sectioning: split markdown-ish text at
    ATX headings (``#`` … ``######`` + space) into (preamble, section*)
    rows — the chunk-by-structure pass RAG and long-context pipelines
    run instead of fixed-token windows (``chunk_documents``), keeping
    semantic units intact.

    Row-local: heading positions, section boundaries, per-section
    word/line counts and the body fingerprint are all higher-order
    functions over one split — zero shuffle, zero Python — followed by
    a single posexplode. Section rows: (id, sec_idx, level — 0 for the
    preamble, heading — '' for the preamble, n_lines, n_words,
    fp_text = md5 of the newline-joined body)."""
    txt = F.col(text_col)
    out = df.select(F.col(id_col), F.split(txt, "\n").alias("__ln"))
    hpos = (
        "filter(sequence(1, size(__ln)),"
        " i -> element_at(__ln, i) RLIKE '^#{1,6} ')"
    )
    starts = (
        f"CASE WHEN size({hpos}) > 0 AND element_at({hpos}, 1) = 1"
        f" THEN {hpos} ELSE concat(array(1), {hpos}) END"
    )
    out = out.select(id_col, "__ln", F.expr(starts).alias("__st"))
    secs = F.expr(
        """
        transform(sequence(1, size(__st)), j -> named_struct(
          'sec_idx', CAST(j - 1 AS BIGINT),
          'level', CAST(length(regexp_extract(
                     element_at(__ln, element_at(__st, j)),
                     '^(#{1,6}) ', 1)) AS BIGINT),
          'heading', trim(regexp_replace(
                     element_at(__ln, element_at(__st, j)),
                     '^#{1,6} ', '')),
          'is_head', element_at(__ln, element_at(__st, j))
                       RLIKE '^#{1,6} ',
          'body', slice(__ln,
                    element_at(__st, j)
                      + CASE WHEN element_at(__ln, element_at(__st, j))
                             RLIKE '^#{1,6} ' THEN 1 ELSE 0 END,
                    (CASE WHEN j < size(__st)
                          THEN element_at(__st, j + 1) - 1
                          ELSE size(__ln) END)
                    - (element_at(__st, j)
                       + CASE WHEN element_at(__ln, element_at(__st, j))
                              RLIKE '^#{1,6} ' THEN 1 ELSE 0 END) + 1)
        ))
        """
    )
    sec = out.select(
        id_col, F.explode(secs).alias("s")
    )
    body = F.col("s.body")
    body_txt = F.array_join(body, "\n")
    return sec.select(
        id_col,
        F.col("s.sec_idx").alias("sec_idx"),
        F.when(F.col("s.is_head"), F.col("s.level"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("level"),
        F.when(F.col("s.is_head"), F.col("s.heading"))
        .otherwise(F.lit(""))
        .alias("heading"),
        F.size(body).cast("bigint").alias("n_lines"),
        F.size(
            F.filter(
                F.split(F.trim(F.regexp_replace(body_txt, r"\s+", " ")), " "),
                lambda w: F.length(w) > 0,
            )
        )
        .cast("bigint")
        .alias("n_words"),
        F.md5(body_txt).alias("fp_text"),
    )
