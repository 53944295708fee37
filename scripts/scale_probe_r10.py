"""Round-10 scale probes (r9 verdict Missing #2 / task 3 + task 9).

1. docs_communities at 3x/30x/100x over DISJOINT-GRAPH document replicas:
   plain doc_id-offset replicas duplicate TEXT, so the MinHash-LSH front
   end would pair every doc with its own copies — densifying ONE graph
   instead of growing F independent ones (a harness-made superlinearity,
   the same pitfall scale_probe_b45 documents for customer names). Here
   every token gets a per-replica suffix: the token bijection preserves
   each replica's internal shingle-overlap structure (so per-replica
   candidate graphs stay isomorphic-in-distribution to the 1x graph)
   while making shingle sets across replicas disjoint — F independent
   similarity graphs, the honest scaling shape for a GRAPH operator.
   Expect t/unit flat-to-falling and r/unit ~= 1.00 (LSH banding is
   hash-probabilistic per suffix, so ~1.00, not exactly 1).

2. docs_langid at 3x/30x/100x over plain doc_id-offset replicas (text
   duplicated — langid is row-local, so replica content is irrelevant to
   the plan): r/unit exactly 1.00 (one row per doc), t/unit expected to
   FALL toward scan speed as the per-query fixed cost amortizes.

3. label_propagation round-depth sweep at 1x (r9 verdict Wrong #2 done
   criterion): wall time for iters in {1, 2, 4, 8} over the sf0.1
   similarity graph — with per-round lineage truncation the MARGINAL
   cost per extra round must stay flat instead of growing with the
   nested-plan depth.

Usage: python scripts/scale_probe_r10.py [factor ...]   (default 3 30 100)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

SRC = "/root/testdata/sf0.1"


def build_plain(spark, factor: int) -> str:
    dst = f"/tmp/sq_r10_{factor}x"
    if os.path.exists(f"{dst}/_done"):
        return dst
    rep = spark.range(factor).withColumnRenamed("id", "__rep")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_d = docs.agg(F.max("doc_id")).head()[0] + 1
    docs.crossJoin(rep).withColumn(
        "doc_id", F.col("doc_id") + F.col("__rep") * n_d
    ).drop("__rep").repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    open(f"{dst}/_done", "w").write("ok")
    return dst


def build_disjoint(spark, factor: int) -> str:
    dst = f"/tmp/sq_r10d_{factor}x"
    if os.path.exists(f"{dst}/_done"):
        return dst
    rep = spark.range(factor).withColumnRenamed("id", "__rep")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_d = docs.agg(F.max("doc_id")).head()[0] + 1
    docs.crossJoin(rep).withColumn(
        "doc_id", F.col("doc_id") + F.col("__rep") * n_d
    ).withColumn(
        "text",
        F.expr(
            "array_join(transform(split(text, ' '),"
            " t -> concat(t, '_', CAST(__rep AS STRING))), ' ')"
        ),
    ).drop("__rep").repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    open(f"{dst}/_done", "w").write("ok")
    return dst


def build_events(spark, factor: int) -> str:
    """Disjoint-user event replicas (the b45 recipe): user_id/event_id
    offset per replica, so TRUE distinct-user cardinality grows by F —
    the honest shape for a cardinality sketch (duplicated users would
    leave registers unchanged by design; that invariance is unit-tested
    instead)."""
    dst = f"/tmp/sq_r10e_{factor}x"
    if os.path.exists(f"{dst}/_done"):
        return dst
    rep = spark.range(factor).withColumnRenamed("id", "__rep")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_e = ev.agg(F.max("event_id")).head()[0] + 1
    n_u = ev.agg(F.max("user_id")).head()[0] + 1
    ev.crossJoin(rep).withColumn(
        "event_id", F.col("event_id") + F.col("__rep") * n_e
    ).withColumn(
        "user_id", F.col("user_id") + F.col("__rep") * n_u
    ).drop("__rep").repartition(32).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )
    open(f"{dst}/_done", "w").write("ok")
    return dst


def time_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    fn = inventory.QUERIES[name]
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best, fn(spark, sf_dir).count()


def lpa_depth_sweep(spark) -> None:
    from squirreling_spark.pipeline.dedup import minhash_lsh_candidates
    from squirreling_spark.pipeline.graph import label_propagation
    from squirreling_spark.qutil import t

    pairs = minhash_lsh_candidates(
        t(spark, SRC, "documents"), "text", "doc_id", 32, 8
    ).persist()
    n_pairs = pairs.count()  # materialize: the sweep times LPA, not LSH
    print(f"  lpa sweep: {n_pairs} candidate edges", flush=True)
    prev = None
    for iters in (1, 2, 4, 8):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            label_propagation(pairs, "id_a", "id_b", iters=iters).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        marginal = "" if prev is None else f" marginal={best - prev:+.2f}s"
        print(f"  [iters={iters}] lpa: {best:.2f}s{marginal}", flush=True)
        prev = best
    pairs.unpersist()


def main():
    factors = [int(a) for a in sys.argv[1:]] or [3, 30, 100]
    spark = get_spark("r10-probe")
    lpa_depth_sweep(spark)
    probes = {
        "docs_communities": build_disjoint,
        "docs_langid": build_plain,
        "events_hll_users": build_events,
    }
    base = {q: time_query(spark, q, SRC) for q in probes}
    for q in probes:
        print(f"  [1x] {q}: {base[q][0]:.2f}s rows={base[q][1]}", flush=True)
    for f in factors:
        for q, builder in probes.items():
            dst = builder(spark, f)
            tt, n = time_query(spark, q, dst)
            t0, n0 = base[q]
            print(
                f"  [{f}x] {q}: {tt:.2f}s t/unit={tt / (t0 * f):.2f}"
                f" rows={n} r/unit={n / (max(n0, 1) * f):.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
