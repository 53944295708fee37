"""Corpus-hygiene operators for LLM training-data pipelines: segment-level
dedup (CCNet-style), repetition signals (Gopher-style), benchmark
contamination checks, deterministic stratified sampling, and TF-IDF salient
terms.

All operators are codegen'd built-ins keyed on high-cardinality columns
(segment text, n-gram text, doc_id), so every shuffle partitions evenly and
every aggregate gets a map-side partial — the shapes survive a 1000-executor
100 TB corpus. No Python runs in any loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from squirreling_spark.pipeline.ckpt import truncate_lineage
from squirreling_spark.pipeline.text import tokens
from squirreling_spark.qutil import spread


def _segments(df: DataFrame, text_col: str, id_col: str, width: int) -> DataFrame:
    """(id, seg_idx, seg): non-overlapping ``width``-token windows. The
    trailing segment keeps whatever tokens remain. Row-local — one scan."""
    toks = tokens(text_col)
    n = F.size(toks)
    n_seg = F.ceil(n / F.lit(float(width))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )
    return spread(df).select(
        F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking — the standard long-document →
    training-example splitter: ``chunk_tokens``-token windows advancing
    by ``chunk_tokens - overlap``, so consecutive chunks share
    ``overlap`` tokens of context. Output (id, chunk_idx, start_tok,
    n_tokens, chunk_text).

    Rules (pinned by tests/test_corpus_ops.py and the DuckDB oracle):
    the final window keeps whatever tokens remain; a non-first window
    whose content is entirely contained in its predecessor (fewer than
    ``overlap + 1`` tokens left) is NOT emitted; blank documents emit no
    chunks.

    Scale shape: one row-local projection + posexplode — no shuffle at
    all; chunk rows inherit the document partitioning, so a 100 TB
    corpus chunks at full scan bandwidth. The window arithmetic is a
    static ``sequence`` expression (whole-stage codegen), not a UDF."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step)),
        lambda s: (s == 0) | (s + overlap < n),
    )
    exploded = (
        spread(df)
        .filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "start_tok"),
        )
    )
    chunk = F.slice(F.col("__toks"), F.col("start_tok") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def dedup_segments(
    df: DataFrame, text_col: str, id_col: str, width: int = 8
) -> DataFrame:
    """Corpus-wide segment dedup (the line-level dedup of CCNet, with
    fixed-width token windows as the unit): a segment occurring in several
    documents survives only at its first occurrence ordered by
    (doc_id, seg_idx); later copies are dropped and each document is
    re-assembled from its surviving segments.

    Scale shape: one groupBy on segment text (high cardinality, map-side
    partial min) picks the keeper, one shuffle join marks duplicates, one
    groupBy doc_id re-assembles. collect_list is bounded by document size,
    never by corpus size. No windows, no driver state."""
    seg = _segments(df, text_col, id_col, width)
    keeper = seg.groupBy("seg").agg(
        F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("keeper")
    )
    marked = seg.join(keeper, "seg").withColumn(
        "is_dup",
        F.struct(F.col(id_col), F.col("seg_idx")) != F.col("keeper"),
    )
    kept_struct = F.when(
        ~F.col("is_dup"), F.struct(F.col("seg_idx"), F.col("seg"))
    )
    out = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s.getField("seg"),
            ),
            " ",
        ).alias("_clean"),
    )
    n_kept = (F.col("n_segments") - F.col("n_dropped")).alias("n_kept")
    return out.select(
        F.col(id_col),
        "n_segments",
        n_kept,
        "n_dropped",
        F.when(
            F.col("n_segments") > F.col("n_dropped"), F.md5(F.col("_clean"))
        ).alias("clean_fp"),
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition signals (the Gopher quality-filter family):
    most-frequent-bigram coverage, duplicated-bigram fraction, duplicated-
    token fraction. Two keyed aggregations, both on (doc_id[, bigram]) —
    partitions by document, no skew, no windows."""
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = spread(df).select(
        F.col(id_col),
        n.alias("_n"),
        F.size(F.array_distinct(toks)).alias("_ndis"),
        F.explode(bigrams).alias("bg"),
    )
    per_bg = base.groupBy(id_col, "bg").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("_n").alias("_n"),
        F.first("_ndis").alias("_ndis"),
    )
    per_doc = per_bg.groupBy(id_col).agg(
        F.first("_n").alias("_n"),
        F.first("_ndis").alias("_ndis"),
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.max(F.struct(F.col("c"), F.col("bg"))).alias("_top"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("_dup_bg"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        "n_bigrams",
        F.col("_top").getField("bg").alias("top_bigram"),
        F.col("_top").getField("c").cast("bigint").alias("top_bigram_count"),
        F.round(
            2 * F.col("_top").getField("c") / F.col("_n"), 6
        ).alias("top_bigram_token_frac"),
        F.round(F.col("_dup_bg") / F.col("n_bigrams"), 6).alias(
            "dup_bigram_frac"
        ),
        F.round(1 - F.col("_ndis") / F.col("_n"), 6).alias("dup_token_frac"),
    )


def word_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, ng): all overlapping word ``n``-grams. Row-local explode."""
    toks = tokens(text_col)
    cnt = F.size(toks)
    grams = F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return spread(df).select(F.col(id_col), F.explode(grams).alias("ng"))


def contamination_check(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bench_pred,
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination scan: flag corpus documents sharing any word
    ``n``-gram with a held-out benchmark set (``bench_pred`` selects the
    benchmark documents). The decontamination step every LLM data pipeline
    runs before training.

    Scale shape: the join keys on n-gram text — high cardinality, hash
    partitioned evenly. The benchmark side is DISTINCT n-grams only; when it
    fits (the common case — benchmarks are tiny next to the corpus) AQE
    turns the join into a broadcast, otherwise it stays a well-partitioned
    shuffle join. Returns (id, n_hits) for contaminated documents."""
    grams = word_ngrams(df, text_col, id_col, n)
    bench = grams.filter(bench_pred(F.col(id_col))).select("ng").distinct()
    return (
        grams.filter(~bench_pred(F.col(id_col)))
        .join(bench, "ng")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("ng")).cast("bigint").alias("n_hits"))
    )


def stratified_sample(
    df: DataFrame, id_col: str, strata_col: str, rate_col
) -> DataFrame:
    """Deterministic per-stratum downsampling (domain mixing): keep a row
    iff its salted md5 bucket falls under the stratum's target rate.
    Row-local filter — no shuffle, no RNG, stable across runs, engines,
    partitionings, and corpus appends (a kept document stays kept when the
    corpus grows — critical for incremental 100 TB re-runs)."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    rate = rate_col(F.col(strata_col))
    return (
        spread(df)
        .select(
            F.col(id_col),
            F.col(strata_col),
            bucket.alias("bucket"),
            rate.cast("bigint").alias("rate"),
        )
        .filter(F.col("bucket") < F.col("rate"))
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-k salient terms per document by TF-IDF. The idf is kept as the
    exact rational n_docs/df (single IEEE division — bit-identical across
    engines, unlike ln()); ranking ties break on term text.

    Scale shape: term-frequency groupBy (doc_id, term) and document-
    frequency groupBy (term) both partition on high-cardinality keys with
    map-side partials; the corpus size joins back in via a 1-row broadcast;
    the final top-k window partitions by doc_id — millions of small
    partitions, the shape WindowGroupLimit handles without skew."""
    tf = (
        spread(df)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", (F.col("tf") * F.col("n_docs")) / F.col("df"))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round("score", 6).alias("tfidf"),
            "rank",
        )
    )


def adaptive_quality_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    pct: float = 0.5,
) -> DataFrame:
    """FineWeb-style adaptive filtering: keep rows whose quality score
    reaches their GROUP's ``pct``-percentile — a per-source (per-domain,
    per-language) cutoff instead of one global threshold, so a noisy
    source doesn't flood the corpus and a clean one isn't over-pruned.

    Returns the surviving rows plus the ``cutoff`` column. Scale shape:
    the cutoff table is one row per group (tiny -> broadcast back, no
    second shuffle of the corpus); the percentile itself is exact
    (percentile_cont collects each group's scores — fine for thousands of
    groups; at extreme group cardinality swap in approx_percentile, which
    keeps a bounded sketch and a map-side partial merge)."""
    cut = df.groupBy(group_col).agg(
        F.expr(
            f"percentile_cont({pct}) WITHIN GROUP (ORDER BY {score_col})"
        ).alias("cutoff")
    )
    return df.join(F.broadcast(cut), group_col).filter(
        F.col(score_col) >= F.col("cutoff")
    )


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2): consecutive lowercase token pairs, row-local explode.
    Documents with fewer than two tokens contribute no rows."""
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    n = F.size(toks)
    # slice with length n-1 = 0 (single-token doc) yields [], so zip_with
    # produces no pairs — no special-casing needed.
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return spread(df).select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def ngram_lm_score(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """CCNet-style language-model quality scoring, Spark-native: train a
    bigram model on ``reference`` (the trusted slice — wiki, curated set),
    then score every ``corpus`` document by how well the model predicts it.
    Low scores = gibberish / boilerplate / wrong-language; the classic
    perplexity-bucket step of CCNet, re-expressed without KenLM.

    Determinism note: every per-bigram quantity stays in INTEGER domain
    (counts), aggregated exactly; each document's score is ONE double
    division of two bigints — bit-identical across engines and partition
    layouts, unlike a per-bigram log-prob sum. Score = pooled add-one
    estimate ``(sum_c2 + n) / (sum_c1 + n*V)`` where c2 = reference count
    of the bigram, c1 = reference count of its prefix token, V = reference
    vocabulary size; higher = more reference-like. ``oov_rate`` = fraction
    of bigrams never seen in the reference.

    Scale shape: reference counts are one groupBy each on (w1, w2) and
    (w1) — map-side partials, high-cardinality keys. The corpus side
    explodes to bigrams once and joins the count tables on their natural
    keys; at 100 TB those are plain shuffle hash joins that partition
    evenly (token-distributed), and the per-doc rollup is one more
    map-side-combined groupBy. No windows, no Python, no driver state."""
    ref_bg = _bigrams(reference, text_col, id_col)
    # r12 (guide §2.3 aggregate-before-shuffle): c1 and V derive from the
    # (w1, w2) count table — Σ_w2 c2 and countDistinct over c2's key set
    # are the SAME integers — so the reference bigram explode feeds ONE
    # corpus-sized aggregation instead of three. The count table is
    # lineage-truncated because three consumers (c1, V, the probe join)
    # reference it and the branch aliases differ, so neither static nor
    # AQE exchange reuse fires (measured: zero ReusedExchange, the
    # reference corpus re-exploded per consumer without it).
    c2 = truncate_lineage(
        ref_bg.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("c2")
        )
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    vocab = c2.agg(
        F.countDistinct("w2").cast("bigint").alias("v")
    )

    bg = _bigrams(corpus, text_col, id_col)
    scored = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            id_col,
            F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum(F.when(F.col("c2") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.sum("c2").cast("bigint").alias("sum_c2"),
        F.sum("c1").cast("bigint").alias("sum_c1"),
    )
    return per_doc.crossJoin(F.broadcast(vocab)).select(
        id_col,
        "n_bigrams",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_bigrams")).alias("oov_rate"),
        (
            (F.col("sum_c2") + F.col("n_bigrams")).cast("double")
            / (F.col("sum_c1") + F.col("n_bigrams") * F.col("v"))
        ).alias("lm_score"),
    )


def boilerplate_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Boilerplate exposure per document: the corpus's ``top_n`` most
    frequent bigrams are taken as the boilerplate set ("click here",
    "all rights", nav-bar fragments), and each document reports what
    fraction of its bigrams fall in that set — the C4/Gopher-style signal
    for template-heavy pages that length/stopword filters miss.

    Scale shape: global bigram counts are one map-side-combined groupBy
    on high-cardinality keys; the top-n set is tiny (TakeOrdered) and
    broadcasts back; the per-doc rollup is one more combining groupBy.
    Ties at the top-n boundary break on bigram text so the set is
    deterministic across engines and partitionings."""
    bg = _bigrams(df, text_col, id_col)
    top = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.desc("__cnt"), "w1", "w2")
        .limit(top_n)
        .select("w1", "w2", F.lit(1).alias("__boiler"))
    )
    marked = bg.join(F.broadcast(top), ["w1", "w2"], "left")
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum(F.coalesce(F.col("__boiler"), F.lit(0)))
        .cast("bigint")
        .alias("n_boiler"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "n_boiler",
        (F.col("n_boiler").cast("double") / F.col("n_bigrams")).alias(
            "boiler_frac"
        ),
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    target_frac_pct: int = 30,
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """Temperature-flattened source mixing at alpha = 0.5 — the
    multilingual/multi-domain rebalancing step (T5's examples-proportional
    mixing, XLM-R's alpha-smoothing): sample source s with probability
    proportional to p_s^alpha instead of p_s, so giant sources stop
    drowning small ones while tiny ones aren't uniformly inflated.

    alpha = 0.5 makes the weight sqrt(n_s) — IEEE sqrt is
    correctly-rounded in every engine, so quantizing it to ppm
    (floor(sqrt(n_s)*1e6 + 0.5), an INTEGER) is bit-portable, and the
    keep decision becomes a pure integer cross-multiplication:

        keep  iff  bucket · denom < numer,
        numer = target_frac_pct · N · w_ppm · n_buckets,
        denom = 100 · Σw_ppm · n_s

    — no float ever compared, so the sample is identical across engines,
    partitionings, and runs (generic alpha would need pow(), whose last
    ulp differs between libms; that variant belongs behind det_round).
    The md5 bucket is salted per-op and keyed on the id alone, so a kept
    document stays kept when the corpus grows (incremental re-runs).

    Scale shape: one tiny groupBy for the per-source counts (map-side
    combined, |sources| rows), broadcast back, then a row-local filter —
    the corpus itself is touched in ONE streaming pass with no shuffle.
    Arithmetic stays in decimal(38,0) (Spark) / HUGEINT (DuckDB), exact
    up to corpus sizes far beyond 100 TB row counts.

    Returns kept rows: (id, stratum, n_source, w_ppm, bucket)."""
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_source")
    )
    w_ppm = F.floor(
        F.sqrt(F.col("n_source")) * 1_000_000 + F.lit(0.5)
    ).cast("bigint")
    weighted = counts.select(
        strata_col, "n_source", w_ppm.alias("w_ppm")
    )
    # totals via an unpartitioned window over the |sources|-row aggregate
    # (NOT a second .agg() branch off `weighted` — an unshared subtree
    # would recompute the per-source counts, i.e. scan the corpus twice)
    w_all = W.partitionBy()
    rates = weighted.select(
        "*",
        F.sum("w_ppm").over(w_all).cast("bigint").alias("wsum_ppm"),
        F.sum("n_source").over(w_all).cast("bigint").alias("n_total"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("temp:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )
    dec = "decimal(38,0)"
    numer = (
        F.lit(target_frac_pct).cast(dec)
        * F.col("n_total").cast(dec)
        * F.col("w_ppm").cast(dec)
        * F.lit(n_buckets).cast(dec)
    )
    denom = (
        F.lit(100).cast(dec)
        * F.col("wsum_ppm").cast(dec)
        * F.col("n_source").cast(dec)
    )
    return (
        spread(df)
        .select(F.col(id_col), F.col(strata_col))
        .join(F.broadcast(rates), strata_col)
        .withColumn("bucket", bucket)
        .filter(F.col("bucket").cast(dec) * denom < numer)
        .select(id_col, strata_col, "n_source", "w_ppm", "bucket")
    )


def domain_reweight(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    loss_col: str,
    rounds: int = 2,
    eta: int = 4,
    floor_ppm: int = 10_000,
    salt: str = "doremi",
) -> DataFrame:
    """DoReMi-style domain mixture reweighting — the data-mixing
    OPTIMIZATION step (vs temperature_mix's static rebalance): domains
    whose sampled documents score HIGH on a per-document loss proxy get
    upweighted multiplicatively each round, re-sampled, and re-measured,
    so the final mixture concentrates on high-excess-loss domains.

    Determinism contract (the temperature_mix conventions): the loss
    proxy arrives as an INTEGER per row; every round's domain means,
    excess, multiplicative update (w·(1e6 + η·excess) DIV 1e6, clamped
    to [floor_ppm, ·] and renormalized to ppm), and the salted-md5
    sampling rule are pure integer arithmetic — every divisor positive,
    so Spark's truncating DIV and DuckDB's flooring ``//`` agree — and
    the whole T-round loop unrolls into oracle SQL.

    Scale shape: per-round work is one row-local sample filter over the
    corpus + one map-side-combined groupBy to |domains| rows; weights
    stay a broadcast-sized table joined back (never collected); the
    corpus is scanned T+1 times (persist the scored projection if memory
    allows). Returns one row per domain: ``n_docs``, ``mean_loss``, and
    per round t ``n_kept_r{t}`` + ``w{t}_ppm``."""
    M = 1_000_000
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col(id_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % M
    )
    # r12 (guide §5 persist what is reused): `scored` is referenced
    # T+1 times (the initial aggregate + every round's sample filter);
    # without truncation each reference re-runs the caller's loss
    # projection (tokenize + TTR in the registered row) over the full
    # corpus. The table is 3 narrow columns per document — exactly the
    # "persist the scored projection" trade the docstring names.
    scored = truncate_lineage(
        df.select(
            F.col(domain_col).alias("domain"),
            F.col(loss_col).cast("bigint").alias("loss"),
            bucket.alias("bucket"),
        )
    )
    w_all = W.partitionBy()
    cur = (
        scored.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("loss").cast("bigint").alias("sum_loss"),
        )
        .select(
            "domain",
            "n_docs",
            F.expr("sum_loss DIV n_docs").alias("mean_loss"),
            F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_dom"),
        )
        .select(
            "*", F.expr(f"{M} DIV n_dom").cast("bigint").alias("w_ppm")
        )
    )
    out_cols = ["domain", "n_docs", "mean_loss"]
    for t in range(1, rounds + 1):
        rate = F.least(
            F.lit(M).cast("bigint"), F.col("w_ppm") * F.col("n_dom")
        )
        kept = scored.join(
            F.broadcast(
                cur.select("domain", rate.alias("__rate"))
            ),
            "domain",
        ).filter(F.col("bucket") < F.col("__rate"))
        st = (
            kept.groupBy("domain")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("__nk"),
                F.sum("loss").cast("bigint").alias("__ks"),
            )
            .select(
                "domain",
                "__nk",
                F.expr("__ks DIV __nk").alias("__kmean"),
                F.expr("sum(__ks) over ()").cast("bigint").alias("__as"),
                F.expr("sum(__nk) over ()").cast("bigint").alias("__an"),
            )
            .select(
                "domain",
                "__nk",
                "__kmean",
                F.expr("__as DIV __an").alias("__amean"),
            )
        )
        factor = F.coalesce(
            F.greatest(
                F.lit(M).cast("bigint")
                + eta * (F.col("__kmean") - F.col("__amean")),
                F.lit(0).cast("bigint"),
            ),
            F.lit(M).cast("bigint"),
        )
        upd = (
            cur.join(st, "domain", "left")
            .select(
                *[c for c in cur.columns if c != "w_ppm"],
                F.coalesce("__nk", F.lit(0).cast("bigint")).alias(
                    f"n_kept_r{t}"
                ),
                (F.col("w_ppm") * factor).alias("__wf"),
            )
            .select(
                "*",
                F.greatest(
                    F.expr(f"__wf DIV {M}"),
                    F.lit(floor_ppm).cast("bigint"),
                ).alias("__wr"),
            )
            .drop("__wf")
        )
        cur = upd.select(
            "*",
            F.expr("sum(__wr) over ()").cast("bigint").alias("__wsum"),
        ).select(
            *[c for c in upd.columns if c != "__wr"],
            F.expr(f"(__wr * {M}) DIV __wsum").alias("w_ppm"),
        )
        cur = cur.withColumn(f"w{t}_ppm", F.col("w_ppm"))
        out_cols += [f"n_kept_r{t}", f"w{t}_ppm"]
    return cur.select(*out_cols)


def dsir_importance_sample(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    base_rate_ppm: int = 500_000,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, 'Data Selection for
    Language Models via Importance Resampling'): score every corpus
    document under TWO pooled bigram models — one trained on the trusted
    ``target`` slice, one on the raw corpus itself — and sample with
    probability proportional to the importance ratio
    ``lm_target / lm_raw``, so documents that look more like the target
    distribution than like average crawl are kept preferentially.

    Determinism: each model score is the ngram_lm_score pooled add-one
    estimate — integer sums with ONE double division — and the ratio,
    the base-rate product, and the floor(x+0.5) quantization are all
    single correctly-rounded operations on bit-identical inputs, so the
    keep decision (salted-md5 integer bucket < quantized rate) replays
    exactly in the oracle.

    Scale shape: bigrams explode ONCE; the target and raw count tables
    are plain map-side-combined groupBys joined back on their natural
    token keys (4 shuffle hash joins that partition evenly); the rollup
    is one combining groupBy; the sample decision is row-local. No
    windows, no Python, no driver state."""
    bg = _bigrams(corpus, text_col, id_col)
    tg = _bigrams(target, text_col, id_col)

    def counts(src, pre):
        # r12 (guide §2.3): c1 and V derive from the (w1, w2) count
        # table — Σ_w2 c2 and countDistinct over c2's keys are the SAME
        # integers — one corpus-sized aggregation per source, not three.
        # Lineage-truncated: three consumers reference each count table
        # and exchange reuse does not fire across the differing branch
        # aliases (measured: zero ReusedExchange, 7 scans in the
        # executed plan — each source re-exploded per consumer).
        c2 = truncate_lineage(
            src.groupBy("w1", "w2").agg(
                F.count(F.lit(1)).cast("bigint").alias(f"{pre}c2")
            )
        )
        c1 = c2.groupBy("w1").agg(
            F.sum(f"{pre}c2").cast("bigint").alias(f"{pre}c1")
        )
        v = c2.agg(F.countDistinct("w2").cast("bigint").alias(f"{pre}v"))
        return c2, c1, v

    tc2, tc1, tv = counts(tg, "t_")
    rc2, rc1, rv = counts(bg, "r_")
    scored = (
        bg.join(tc2, ["w1", "w2"], "left")
        .join(tc1, ["w1"], "left")
        .join(rc2, ["w1", "w2"], "left")
        .join(rc1, ["w1"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.coalesce("t_c2", F.lit(0))).cast("bigint").alias("t2"),
            F.sum(F.coalesce("t_c1", F.lit(0))).cast("bigint").alias("t1"),
            F.sum(F.coalesce("r_c2", F.lit(0))).cast("bigint").alias("r2"),
            F.sum(F.coalesce("r_c1", F.lit(0))).cast("bigint").alias("r1"),
        )
        .crossJoin(F.broadcast(tv))
        .crossJoin(F.broadcast(rv))
    )
    lm_t = (F.col("t2") + F.col("n_bigrams")).cast("double") / (
        F.col("t1") + F.col("n_bigrams") * F.col("t_v")
    )
    lm_r = (F.col("r2") + F.col("n_bigrams")).cast("double") / (
        F.col("r1") + F.col("n_bigrams") * F.col("r_v")
    )
    w = lm_t / lm_r
    rate = F.least(
        F.lit(1_000_000).cast("bigint"),
        F.floor(w * F.lit(float(base_rate_ppm)) + F.lit(0.5)).cast("bigint"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col(id_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    return scored.select(
        F.col(id_col),
        "n_bigrams",
        lm_t.alias("lm_target"),
        lm_r.alias("lm_raw"),
        w.alias("importance"),
        rate.alias("rate_ppm"),
        bucket.alias("bucket"),
        (bucket < rate).alias("keep"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """C4-style boilerplate line REMOVAL — the transform counterpart of
    ``boilerplate_stats`` (which only measures): a line whose normalized
    form (lowercased, whitespace-trimmed) occurs in at least ``min_docs``
    DISTINCT documents is dropped from every document; survivors
    reassemble in original order. (C4 dropped lines duplicated across the
    corpus — nav menus, cookie banners, license footers.)

    Output: (doc_id, n_lines, n_removed, clean_text). Blank lines are
    never counted as boilerplate (they'd trivially cross-match) and are
    preserved.

    Scale shape: line explode is row-local; the duplicate-line set is a
    two-level map-combined aggregate on an 8-byte line hash; removal is
    a semi-join on that hash and reassembly keys on doc_id. Same
    partitioning discipline as remove_dup_substrings."""
    lines = spread(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col)), by=["doc_id"]
    ).select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("p", "line"),
    ).withColumn("_norm", F.lower(F.trim(F.col("line")))).withColumn(
        "_h", F.xxhash64(F.col("_norm"))
    )
    boiler = (
        lines.filter(F.col("_norm") != "")
        .select("_h", "doc_id")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
    )
    flagged = lines.join(
        boiler.withColumn("_boiler", F.lit(True)), "_h", "left"
    ).withColumn(
        "_drop", F.col("_boiler").isNotNull() & (F.col("_norm") != "")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("_drop"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_drop"),
                                F.struct(
                                    F.col("p"), F.col("line").alias("line")
                                ),
                            )
                        )
                    ),
                    lambda s: s.line,
                ),
            ).alias("clean_text"),
        )
    )


def lm_bucket_sample(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
    rates: dict | None = None,
    cutoff_sample_ppm: int = 1_000_000,
) -> DataFrame:
    """CCNet's perplexity-bucket step, completed: split the corpus into
    head / middle / tail by LM quality score (ngram_lm_score — higher =
    more reference-like) at the quartile cutoffs, then keep each bucket
    at its own rate via the salted-md5 integer rule (head kept, middle
    subsampled, tail mostly dropped — the standard curation shape).

    Determinism: lm_score is one double division of exact integers
    (bit-identical cross-engine); cutoffs are interpolated quartiles of
    those bit-identical doubles at p = 0.25 / 0.75 (exact binary
    fractions), det-rounded to 1e-9 before comparison so a last-ulp
    interpolation difference between engines cannot flip a bucket; the
    keep decision is the md5-bucket rule (stable under appends and
    partitioning).

    Scale: the exact-percentile cutoff aggregate sees
    ``cutoff_sample_ppm`` of documents (deterministic md5 sample) — at
    100 TB set it so the single-reducer percentile sees ~1e6 values; the
    default passes everything (exact at test scale). Everything else is
    row-local against the broadcast 1-row cutoff table."""
    rates = rates or {"head": 100, "middle": 50, "tail": 10}
    # r12: the scores frame feeds BOTH the cutoff aggregate and the
    # bucket projection; without truncation the whole scoring subtree
    # (corpus bigram explode + model joins) executes twice (measured:
    # 8 scans / 28 exchanges in the executed plan). The table is one
    # row per document — the cheap side of the §8 "decide with small
    # rows" trade.
    scores = truncate_lineage(
        ngram_lm_score(corpus, reference, text_col, id_col)
    )
    cut_src = scores
    if cutoff_sample_ppm < 1_000_000:
        samp = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lmcut:"), F.col(id_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1_000_000
        )
        cut_src = scores.filter(samp < cutoff_sample_ppm)
    cuts = cut_src.agg(
        F.percentile(F.col("lm_score"), F.lit(0.25)).alias("p25"),
        F.percentile(F.col("lm_score"), F.lit(0.75)).alias("p75"),
    )
    from squirreling_spark.qutil import det_round

    b = scores.crossJoin(F.broadcast(cuts)).withColumn(
        "bucket",
        F.when(
            F.col("lm_score") > det_round(F.col("p75"), 9), F.lit("head")
        )
        .when(
            F.col("lm_score") > det_round(F.col("p25"), 9), F.lit("middle")
        )
        .otherwise(F.lit("tail")),
    )
    rate = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )[F.col("bucket")]
    keep_bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("lmb:"), F.col(id_col).cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return b.select(
        F.col(id_col),
        "lm_score",
        "bucket",
        (keep_bucket < rate).alias("kept"),
    )


def epoch_schedule(
    df: DataFrame,
    text_col: str,
    source_col: str,
    cap_epochs_ppm: int = 1_000_000,
) -> DataFrame:
    """Token-budget EPOCH SCHEDULING across sources — the data-recipe
    table every pretraining run starts from (the per-source
    epochs/sampling-proportion tables of the LLaMA / Gopher / Pile
    papers): given per-source token counts, a total token budget (here
    one corpus epoch, Σ tokens), and sqrt-upweighting of small sources
    (the temperature-mixing weight), compute each source's allocated
    tokens and implied epochs, capped at ``cap_epochs_ppm`` (default
    exactly 1.0 epoch — the no-repetition rule; upweighted small
    sources genuinely hit it, their surplus reported via ``capped``).

    INTEGER-EXACT end to end: weights are floor(sqrt(tokens)·1e6)
    (IEEE sqrt is correctly rounded — same contract as
    temperature_mix), every normalization/allocation is an integer
    div in decimal(38,0)/HUGEINT — overflow-proof at 100 TB token
    counts — so both engines agree bit-for-bit.

    Distributed shape: one map-combined per-source aggregate (|sources|
    rows), one 1-row total broadcast back; everything downstream is
    arithmetic on the tiny schedule table.

    Output: (source, n_docs, tokens, w_ppm, alloc_tokens, epochs_ppm,
    capped, final_tokens)."""
    from squirreling_spark.pipeline.text import tokens as _toks

    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(_toks(text_col))).cast("bigint").alias("tokens"),
    )
    per = per.withColumn(
        "w_raw",
        F.floor(F.sqrt(F.col("tokens").cast("double")) * 1_000_000).cast(
            "bigint"
        ),
    )
    tot = per.agg(
        F.sum("tokens").cast("bigint").alias("__T"),
        F.sum("w_raw").cast("bigint").alias("__W"),
    )
    d38 = lambda c: f"CAST({c} AS DECIMAL(38,0))"
    j = per.crossJoin(F.broadcast(tot))
    j = j.withColumn(
        "w_ppm",
        F.expr(
            f"CAST({d38('w_raw')} * 1000000 div {d38('__W')} AS BIGINT)"
        ),
    ).withColumn(
        "alloc_tokens",
        F.expr(
            f"CAST({d38('__T')} * {d38('w_ppm')} div 1000000 AS BIGINT)"
        ),
    )
    raw_epochs = (
        f"{d38('alloc_tokens')} * 1000000 div {d38('tokens')}"
    )
    return j.select(
        source_col,
        "n_docs",
        "tokens",
        "w_ppm",
        "alloc_tokens",
        F.expr(
            f"CAST(least({raw_epochs},"
            f" CAST({cap_epochs_ppm} AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("epochs_ppm"),
        F.expr(f"({raw_epochs}) > {cap_epochs_ppm}").alias("capped"),
        F.expr(
            f"CAST(least({d38('alloc_tokens')},"
            f" {d38('tokens')} * {cap_epochs_ppm} div 1000000)"
            f" AS BIGINT)"
        ).alias("final_tokens"),
    )


def sample_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int = 10,
    salt: str = "gs",
) -> DataFrame:
    """Deterministic k-per-group sampling — the balanced-subset
    primitive (fixed-size eval slices per source/language, class-
    balanced fine-tuning sets): rank rows inside each group by a salted
    md5 of the id (a reproducible pseudo-random order, append-stable:
    adding documents never reorders existing ranks' keys) and keep the
    first ``k``.

    Skew-safe two-stage ranking (the ``_topk_per_query`` pattern): a
    single ``Window.partitionBy(group)`` would funnel each group's full
    row volume through one task; instead rank locally per (physical
    partition, group), prune to k, then rank the ≤ partitions·k
    survivors — both window inputs stay bounded at any group size.

    Output: (id, group, rank) for the kept rows."""
    from pyspark.sql import Window

    key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    local = df.select(F.col(id_col), F.col(group_col), key.alias("__k"))
    local = local.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid", group_col).orderBy(
        "__k", id_col
    )
    pruned = (
        local.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__pid")
    )
    w = Window.partitionBy(group_col).orderBy("__k", id_col)
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(id_col, group_col, "rank")
    )


def source_drift_tv(
    df: DataFrame,
    text_col: str,
    source_col: str,
) -> DataFrame:
    """Per-source token-distribution DRIFT vs the global corpus — the
    mixture-monitoring signal (is one crawl slice drifting away from
    the blend?): total-variation distance between each source's unigram
    distribution and the whole corpus's, in ppm.

    INTEGER-EXACT: both distributions quantize to ppm integers
    (``p_i = c_i·1e6 div C_s``, ``q_i = total_i·1e6 div T``); the
    off-source mass Σ_{i∉s} q_i — which would otherwise need a
    vocab×sources cross product — factors EXACTLY as ``Q_all − Σ_{i∈s}
    q_i`` where ``Q_all = Σ_i q_i`` is one global vocab aggregate. So
    tv_ppm = (Σ_{i∈s} |p_i−q_i| + Q_all − Σ_{i∈s} q_i) div 2, all in
    bigint — bit-identical cross-engine, quantization IS the contract.

    Distributed shape: one explode → map-combined (source, token)
    counts; token totals = one vocab-sized aggregate joined back on
    token; per-source totals and (T, Q_all) broadcast as tiny
    aggregates. Nothing larger than the vocabulary ever shuffles.

    Output: (source, n_tokens, vocab_in_source, tv_ppm, top_token —
    the source's most over/under-represented token by |p−q|, ties
    token-ascending — top_gap_ppm)."""
    from pyspark.sql import Window

    from squirreling_spark.pipeline.text import tokens as _toks

    st = (
        df.select(F.col(source_col), F.explode(_toks(text_col)).alias("tok"))
        .groupBy(source_col, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = st.groupBy("tok").agg(F.sum("c").cast("bigint").alias("total"))
    per_src = st.groupBy(source_col).agg(
        F.sum("c").cast("bigint").alias("src_total")
    )
    g = tot.agg(
        F.sum("total").cast("bigint").alias("T"),
    )
    # q_i needs T first; Q_all = sum of the quantized q_i over the vocab
    tot_q = tot.crossJoin(F.broadcast(g)).select(
        "tok",
        "total",
        F.expr("CAST(total * 1000000 div T AS BIGINT)").alias("q"),
    )
    qa = tot_q.agg(F.sum("q").cast("bigint").alias("Q_all"))
    j = (
        st.join(tot_q.select("tok", "q"), "tok")
        .join(F.broadcast(per_src), source_col)
        .select(
            source_col,
            "tok",
            "q",
            F.expr("CAST(c * 1000000 div src_total AS BIGINT)").alias("p"),
        )
    )
    gaps = j.select(
        source_col,
        "tok",
        "q",
        F.abs(F.col("p") - F.col("q")).alias("gap"),
    )
    agg = gaps.groupBy(source_col).agg(
        F.sum("gap").cast("bigint").alias("__sum_gap"),
        F.sum("q").cast("bigint").alias("__q_in"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_in_source"),
    )
    w = Window.partitionBy(source_col).orderBy(F.desc("gap"), "tok")
    top = (
        gaps.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            source_col,
            F.col("tok").alias("top_token"),
            F.col("gap").alias("top_gap_ppm"),
        )
    )
    return (
        agg.join(F.broadcast(per_src), source_col)
        .crossJoin(F.broadcast(qa))
        .join(top, source_col)
        .select(
            source_col,
            F.col("src_total").alias("n_tokens"),
            "vocab_in_source",
            F.expr(
                "CAST((__sum_gap + Q_all - __q_in) div 2 AS BIGINT)"
            ).alias("tv_ppm"),
            "top_token",
            "top_gap_ppm",
        )
    )


def ngram_novelty(
    df: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """Per-document n-gram novelty score: the fraction of a document's
    DISTINCT word n-grams whose corpus-wide first occurrence (minimum
    ``id_col``) is this document. High-novelty documents contribute new
    text; near-zero novelty marks mirrors, quotes, and boilerplate — the
    corpus-level complement of pairwise near-dup detection, and a
    standard training-data curation signal.

    Scale shape: two gram-keyed map-combined aggregates (distinct per
    doc, then min(doc) per gram) plus ONE hash join back on the gram —
    high-cardinality keys, evenly partitioned, no pair explosion at any
    scale. "First" is defined by the id order: ids must be stable
    (ingest order / snapshot ids), making the score deterministic.

    Output: (id, n_grams, n_novel, novelty_ppm) for documents with at
    least one n-gram (>= n tokens)."""
    grams = word_ngrams(df, text_col, id_col, n).distinct()
    # r12 (guide §2.3/§2.4): no corpus-wide gram join — n_novel per doc
    # is the COUNT of grams whose min(id) equals the doc, so the heavy
    # gram-string shuffle happens once (the min aggregate) and the only
    # join is doc-keyed over two doc-sized aggregates. Same integers:
    # Σ_grams-in-doc [doc == first(gram)] == |{g : first(g) = doc}|.
    per_doc = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    novel = (
        grams.groupBy("ng")
        .agg(F.min(F.col(id_col)).alias("__first"))
        .groupBy("__first")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__novel"))
        .select(F.col("__first").alias(id_col), "__novel")
    )
    return (
        per_doc.join(novel, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce("__novel", F.lit(0)).cast("bigint").alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("(n_novel * 1000000) div n_grams").cast("bigint"),
        )
    )


# Knuth multiplicative hash constant (2^32 / phi) — public-domain
# arithmetic reproducible in ANY engine with 64-bit integers; the id is
# folded to 31 bits first so the product stays far inside bigint
# (2^31 * 2654435761 < 2^63).
_SPLIT_PRIME = 2654435761
_SPLIT_FOLD = 2_147_483_648  # 2^31
_SPLIT_MOD = 4_294_967_296  # 2^32


def stratified_hash_split(
    df: DataFrame,
    id_col: str,
    test_pm: int = 50,
    valid_pm: int = 50,
) -> DataFrame:
    """Deterministic train/valid/test assignment by integer hash of the
    id — the reproducible split every training pipeline needs: stable
    under reshuffling, re-ingestion, and engine changes (no RNG, no
    row order dependence), and disjoint by construction.

    bucket = ((id mod 2^31) * 2654435761 mod 2^32) mod 1000; the first
    ``test_pm`` buckets are test, the next ``valid_pm`` valid, the rest
    train. Pure row-local arithmetic — zero shuffle, exact in any
    engine with 64-bit integers (DuckDB oracle replays it verbatim).

    Output: input rows + (bucket, split)."""
    bucket = F.expr(
        f"((({id_col} % {_SPLIT_FOLD}) * {_SPLIT_PRIME})"
        f" % {_SPLIT_MOD}) % 1000"
    ).cast("bigint")
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < test_pm, "test")
        .when(F.col("bucket") < test_pm + valid_pm, "valid")
        .otherwise("train"),
    )
