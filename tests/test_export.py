"""Shuffle-shard export tests (pipeline/export.py): the oracle gate
proves the layout math; these pin the operational properties — the
physical writer produces exactly the declared layout, shards are
balanced, and the shuffle actually mixes."""

import math

from pyspark.sql import functions as F

from squirreling_spark.pipeline.export import (
    shard_assignments,
    write_shards,
)
from squirreling_spark.qutil import t

SF = "/root/testdata/sf0.01"
N = 16


def test_writer_matches_declared_layout(spark, tmp_path):
    """write_shards' physical files contain each shard's documents in
    exactly shard_assignments' declared order."""
    docs = t(spark, SF, "documents").select("doc_id", "source")
    path = str(tmp_path / "shards")
    write_shards(docs, "doc_id", path, n_shards=N)
    declared = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in shard_assignments(docs, "doc_id", n_shards=N).collect()
    }
    for shard in range(N):
        part = spark.read.parquet(f"{path}/shard={shard}")
        got = [r["doc_id"] for r in part.collect()]  # parquet row order
        want = [
            declared[(shard, p)] for p in range(1, len(got) + 1)
        ]
        assert got == want, f"shard {shard} order differs"


def test_shards_are_balanced(spark):
    """md5 uniformity: no shard more than 2x the mean (tight at 5k docs /
    16 shards; a broken hash would send everything to one writer)."""
    docs = t(spark, SF, "documents").select("doc_id")
    sizes = [
        r["shard_n_docs"]
        for r in shard_assignments(docs, "doc_id", n_shards=N)
        .select("shard", "shard_n_docs")
        .distinct()
        .collect()
    ]
    n = docs.count()
    assert len(sizes) == N
    assert sum(sizes) == n
    mean = n / N
    assert max(sizes) < 2 * mean and min(sizes) > mean / 2


def test_shuffle_actually_mixes(spark):
    """The intra-shard order must not correlate with doc_id order: the
    rank correlation between pos and doc_id within a shard should be
    near zero (a writer that forgot the shuffle key would emit doc_id
    order and train on corpus order)."""
    docs = t(spark, SF, "documents").select("doc_id")
    a = shard_assignments(docs, "doc_id", n_shards=N)
    rows = (
        a.filter(F.col("shard") == 0)
        .select("doc_id", "pos")
        .orderBy("pos")
        .collect()
    )
    ids = [r["doc_id"] for r in rows]
    n = len(ids)
    rank_of = {d: i for i, d in enumerate(sorted(ids))}
    xs = list(range(n))
    ys = [rank_of[d] for d in ids]
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    rho = cov / (sx * sy)
    assert abs(rho) < 0.15, f"shuffle leaks input order: rho={rho:.3f}"
