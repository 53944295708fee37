"""Round-11 scale probes (r10 verdict tasks 1 and 5).

1. docs_length_quantiles at 3x/30x/100x over plain doc_id-offset replicas:
   replicas duplicate text, so the per-source LENGTH DISTRIBUTION is
   invariant under replication — the quantile sketch's bucket table keeps
   the same bids with counts x F, and every quantile row must come back
   BIT-IDENTICAL (r/unit 1.00 and value-identical: a semantic check, not
   just a perf one). t/unit expected to fall toward scan speed.

2. cms_top_terms (the new PURE-sketch default) over the same replicas:
   token counts and the φ threshold both scale by F, so the top-20 term
   list is invariant (modulo φ-rounding at the boundary, which 500 ppm of
   a 60k-doc corpus never straddles); output constant 20 rows. The probe
   exercises the broadcast-scoring path — the only term-keyed shuffle is
   the φ-survivor group.

3. docs_hll_ngrams (now pure) over DISJOINT token-suffix replicas
   (the r10 recipe: per-replica token suffixes keep each replica's gram
   structure while making gram sets disjoint, so TRUE distinct-gram
   cardinality grows by F — duplicated grams would leave registers
   unchanged by design). Output constant (one row per source); estimates
   grow ~F.

4. events_user_overlap (now pure) over disjoint-user event replicas —
   re-probed because the registered plan changed (exact self-join
   dropped): expect the 1x cost to shrink vs the r10 probe and t/unit to
   keep falling.

Usage: python scripts/scale_probe_r11.py [factor ...]   (default 3 30 100)
Run ISOLATED — no concurrent Spark/DuckDB jobs (timings contaminate).
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
    dst = f"/tmp/sq_r10_{factor}x"  # shared cache with the r10 probes
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


def main():
    factors = [int(a) for a in sys.argv[1:]] or [3, 30, 100]
    spark = get_spark("r11-probe")
    probes = {
        "docs_length_quantiles": build_plain,
        "cms_top_terms": build_plain,
        "docs_hll_ngrams": build_disjoint,
        "events_user_overlap": build_events,
        # second half: weighted quantiles share the scale-invariance
        # argument of the unweighted probe (weights scale by F, ranks
        # cancel); cross-source gram overlap runs on DISJOINT replicas
        # so per-pair union/overlap truly grow by F (jaccard_ppm stays
        # ~invariant at the estimate level, rows constant).
        "docs_token_mass_quantiles": build_plain,
        "sources_gram_overlap": build_disjoint,
    }
    base = {q: time_query(spark, q, SRC) for q in probes}

    # Invariant projections: counts scale by F by design (n_total,
    # cms_count), the SEMANTIC outputs must not — quantile buckets per
    # (source, q) and the ordered heavy-hitter term list.
    def invariant(q, sf_dir):
        df = inventory.QUERIES[q](spark, sf_dir)
        if q in ("docs_length_quantiles", "docs_token_mass_quantiles"):
            df = df.select("source", "q_ppm", "q_lo", "q_hi", "q_est")
        else:  # cms_top_terms: ordered term list
            df = df.select("term")
        return sorted(map(tuple, df.collect()))

    base_vals = {
        q: invariant(q, SRC)
        for q in (
            "docs_length_quantiles",
            "docs_token_mass_quantiles",
            "cms_top_terms",
        )
    }
    for q in probes:
        print(f"  [1x] {q}: {base[q][0]:.2f}s rows={base[q][1]}", flush=True)
    for f in factors:
        for q, builder in probes.items():
            dst = builder(spark, f)
            tt, n = time_query(spark, q, dst)
            t0, n0 = base[q]
            print(
                f"  [{f}x] {q}: {tt:.2f}s rows={n} "
                f"t/unit={tt / (t0 * f):.2f} rows_const={n == n0}",
                flush=True,
            )
            if q in base_vals:
                vals = invariant(q, dst)
                print(
                    f"         {q} invariant="
                    f"{'YES' if vals == base_vals[q] else 'NO'}",
                    flush=True,
                )
            if q == "docs_hll_ngrams":
                # disjoint grams: summed estimates must grow ~F
                est_f = (
                    inventory.QUERIES[q](spark, dst)
                    .agg(F.sum("est_distinct")).head()[0]
                )
                est_1 = (
                    inventory.QUERIES[q](spark, SRC)
                    .agg(F.sum("est_distinct")).head()[0]
                )
                print(
                    f"         est growth {est_f / est_1:.2f}x (target ~{f}x)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
