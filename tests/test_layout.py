"""Z-order layout (pipeline/layout.py): Morton key correctness against a
Python bit-interleave reference, the data-skipping benefit vs a
single-column sort, and the write path's plan shape."""
import pytest
from pyspark.sql import functions as F

from squirreling_spark.pipeline.layout import (
    quantize,
    zorder_key,
    zorder_layout,
    zorder_repartition,
)


def _morton_ref(q1: int, q2: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((q1 >> i) & 1) << (2 * i + 1)
        z |= ((q2 >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 200, 255) for b in (0, 3, 7, 254)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b",
            zorder_key([F.col("a"), F.col("b")], bits=8).alias("z"),
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_ref(a, b, 8), (a, b)


def test_quantize_covers_range_exactly(spark):
    df = spark.createDataFrame([(i,) for i in range(10, 110)], "v long")
    q = df.select(
        quantize(
            F.col("v"), F.lit(10), F.lit(109), bits=4
        ).alias("q")
    )
    vals = sorted({r["q"] for r in q.collect()})
    assert vals == list(range(16))  # full [0, 2^bits) coverage, no clip


def test_zorder_buckets_tighten_second_column_spans(spark):
    """The point of z-order: bucket by the FIRST column alone and the
    second column's per-bucket min/max spans ~the whole domain (no
    pruning); z-order both and every bucket's span on BOTH columns
    shrinks. Grid data makes the contrast deterministic."""
    n = 32
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")
    laid = zorder_layout(df, ["a", "b"], bits=5, n_buckets=16)
    spans = laid.groupBy("bucket").agg(
        (F.max("a") - F.min("a")).alias("sa"),
        (F.max("b") - F.min("b")).alias("sb"),
    ).collect()
    assert len(spans) == 16
    # every z-bucket is a quadrant-ish cell: both spans well under the
    # domain (31); a single-column sort leaves sb == 31 in EVERY bucket
    assert all(r["sa"] <= 15 and r["sb"] <= 15 for r in spans), spans


def test_zorder_repartition_plan_is_one_range_exchange(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
    )
    out = zorder_repartition(df, ["a", "b"], bits=8, num_files=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # range exchange + bounds broadcast + the single-ROW partial-agg
    # merge (SinglePartition over 8 one-row partials) — nothing that
    # moves the main data twice
    assert plan.lower().count("exchange") <= 3


def test_zorder_layout_rejects_non_power_of_two_buckets(spark):
    df = spark.range(4).select(F.col("id").alias("a"),
                               F.col("id").alias("b"))
    with pytest.raises(ValueError):
        zorder_layout(df, ["a", "b"], bits=4, n_buckets=12)


def test_zorder_write_produces_tight_file_stats(spark, tmp_path):
    """The operator's whole point, verified on REAL parquet footers:
    write grid data z-ordered and every output file's min/max span on
    BOTH columns is a fraction of the domain (data skipping prunes on
    these stats); an `a`-sorted write leaves `b` spanning the full
    domain in every file."""
    import pyarrow.parquet as pq

    n = 64
    df = spark.createDataFrame(
        [(a, b) for a in range(n) for b in range(n)], "a long, b long"
    )
    zpath = str(tmp_path / "z")
    zorder_repartition(df, ["a", "b"], bits=6, num_files=16).drop(
        "zkey"
    ).write.parquet(zpath)

    import glob

    spans_a, spans_b = [], []
    for f in glob.glob(zpath + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mn_a = mn_b = 1 << 60
        mx_a = mx_b = -(1 << 60)
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                st = col.statistics
                name = col.path_in_schema
                if st is None or name not in ("a", "b"):
                    continue
                if name == "a":
                    mn_a, mx_a = min(mn_a, st.min), max(mx_a, st.max)
                else:
                    mn_b, mx_b = min(mn_b, st.min), max(mx_b, st.max)
        if mx_a >= 0:
            spans_a.append(mx_a - mn_a)
            spans_b.append(mx_b - mn_b)
    assert len(spans_a) >= 8  # range partition actually split the data
    # every file covers ≤ ~a quadrant per dimension (domain span = 63)
    assert max(spans_a) <= 33, spans_a
    assert max(spans_b) <= 33, spans_b
