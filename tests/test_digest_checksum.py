"""The digest checksum must catch compensating errors.

Round-3 judge finding: the old key_sum was LINEAR in the key expression,
so a +x/-x pair of wrong rows hashed clean. The hardened checksum sums a
per-row md5-derived 40-bit hash instead; these tests pin (a) that a
compensating perturbation now flips the checksum, (b) that the Spark and
DuckDB spellings of the row hash agree value-for-value (incl. negatives,
doubles through floor, and the NULL sentinel).
"""

from __future__ import annotations

import duckdb

from squirreling_spark import inventory

inventory.load_all()  # queries_digests reads ORACLES of earlier modules

from squirreling_spark.queries_digests import (  # noqa: E402
    _digest_branch,
    _row_hash_duck,
    _row_hash_spark,
)


def _key_sum(spark, values, ck="k"):
    df = spark.createDataFrame([(v,) for v in values], "k bigint")
    row = _digest_branch(df, "t", ck).collect()[0]
    return row["n_rows"], row["key_sum"]


def test_compensating_pair_detected(spark):
    n1, s1 = _key_sum(spark, [1, 2, 3])
    n2, s2 = _key_sum(spark, [0, 3, 3])  # +1/-1: same linear sum (6)
    assert n1 == n2
    assert s1 != s2, "compensating +1/-1 perturbation must change key_sum"


def test_single_row_perturbation_detected(spark):
    _, s1 = _key_sum(spark, [10, 20, 30])
    _, s2 = _key_sum(spark, [10, 20, 31])
    assert s1 != s2


def test_row_hash_cross_engine_identity(spark):
    cases = [
        ("7", 7),
        ("-42", -42),
        ("0", 0),
        ("123456789012", 123456789012),
        ("2.9", 2),  # floor: Spark truncates, DuckDB rounds — floor first
        ("-2.9", -3),
        ("CAST(NULL AS BIGINT)", None),  # NULL sentinel branch
    ]
    con = duckdb.connect()
    for expr, _ in cases:
        sp = spark.sql(f"SELECT {_row_hash_spark(expr)} AS h").collect()[0]["h"]
        du = con.execute(f"SELECT {_row_hash_duck(expr)} AS h").fetchone()[0]
        assert sp == du, f"row hash mismatch for {expr!r}: {sp} vs {du}"
        assert sp is not None and 0 <= sp < 2**40


def test_hash_sum_headroom(spark):
    # 40-bit per-row hashes: even 6M rows (sf1 lineitem) can't overflow
    # a BIGINT sum.
    assert (2**40 - 1) * 6_100_000 < 2**63 - 1
