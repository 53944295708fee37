"""Salted scale probe (round-7 verdict task 8): the 10x probe in
scale_probe.py replicates IDENTICAL copies, which inflates LSH pair
growth (every replica is an exact dup of its source -> replicated band
buckets) and hides skew behavior. This probe replicates documents with
PER-COPY TEXT PERTURBATION (two appended salt tokens per replica), so
replicas are near-identical — high-Jaccard near-dups, the realistic
100 TB load — and measures the top LSH cost centers at 3x/10x/30x/100x,
reporting per-unit cost (time / factor) so sub-linearity is visible.

Usage: python scripts/scale_probe_salted.py [factor ...] [query ...]
Defaults: factors 3 10 30, queries the three round-6 cost centers.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

SRC = "/root/testdata/sf0.1"
QUERIES = ["dedup_minhash_lsh", "decontaminate_neardup", "image_dhash_neardup"]
FACTORS = [3, 10, 30]


def salted_dir(spark, factor: int) -> str:
    dst = f"/tmp/sq_salted_{factor}x"
    import os

    if os.path.exists(f"{dst}/_done"):
        return dst
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    rep = docs.crossJoin(
        spark.range(factor).withColumnRenamed("id", "__rep")
    )
    # per-copy salt: replica r of a doc appends two tokens that vary by
    # replica AND doc — near-identical to the source (Jaccard stays
    # high), never byte-identical, so exact-dup collapse can't hide the
    # LSH candidate load the way identical replication does
    rep = (
        rep.withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat(
                    F.col("text"),
                    F.lit(" salt"),
                    F.col("__rep").cast("string"),
                    F.lit(" mark"),
                    (F.col("doc_id") % 13).cast("string"),
                )
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * n_max)
        .drop("__rep")
    )
    rep.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    open(f"{dst}/_done", "w").write("ok")
    return dst


def time_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    """(best-of-2 seconds, output row count). The count is a separate
    action — probes report OUTPUT growth too, because an operator can be
    time-sub-linear yet output-quadratic (the r7 dhash finding)."""
    fn = inventory.QUERIES[name]
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    n = fn(spark, sf_dir).count()
    return best, n


def main():
    args = sys.argv[1:]
    factors = [int(a) for a in args if a.isdigit()] or FACTORS
    queries = [a for a in args if not a.isdigit()] or QUERIES
    spark = get_spark("salted-probe")
    base = {q: time_query(spark, q, SRC) for q in queries}
    hdr = f"{'query':24s} {'1x':>7s} {'rows':>9s}"
    for f in factors:
        hdr += f" {str(f) + 'x':>8s} {'t/unit':>7s} {'rows':>10s} {'r/unit':>7s}"
    print(hdr)
    rows = {q: [base[q]] for q in queries}
    for f in factors:
        dst = salted_dir(spark, f)
        for q in queries:
            rows[q].append(time_query(spark, q, dst))
    for q in queries:
        t0, n0 = rows[q][0]
        line = f"{q:24s} {t0:7.2f} {n0:9d}"
        for i, f in enumerate(factors):
            t, n = rows[q][i + 1]
            line += (
                f" {t:8.2f} {t / (t0 * f):7.2f}"
                f" {n:10d} {n / (max(n0, 1) * f):7.2f}"
            )
        print(line)


if __name__ == "__main__":
    main()
