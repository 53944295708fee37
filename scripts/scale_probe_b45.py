"""Scale probes for the round-8 batch-4/5 operators.

Replication is per-family, chosen so the probe measures the OPERATOR's
scaling and not an artifact of the harness:

- customer (fuzzy_name_matches): replicas get NEW keys and names
  REGENERATED from the new key ('Customer#%09d'), exactly the shape a
  bigger TPC-H would have. (Offsetting only the key would duplicate
  name strings F times and manufacture C(F,2) lev=0 pairs per name — a
  harness-made quadratic, not an operator property.)
- lineitem (part_triangle_stats): BOTH l_orderkey and l_partkey offset
  per replica → F disjoint copies of the co-order graph. Wedge work
  should scale ~linearly; overlapping node sets would instead densify
  the one graph and square the wedge count by construction.
- events (scd2_intervals, event_pattern_match, attribution_linear,
  events_trend_ols): event_id/user_id offset per replica — disjoint
  users, per-user history unchanged (the realistic way an event log
  grows).
- documents (text_lexical_diversity, sample_weighted_systematic,
  token_cooccurrence): doc_id offset per replica (token profile work is
  per-document; co-occurrence pair-count work is per-document too, with
  the pair VOCABULARY shared — the realistic corpus-growth shape).

Usage: python scripts/scale_probe_b45.py [factor ...]   (default 3 10 30)
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
FACTORS = [3, 10, 30]

FAMILIES = {
    "customer": ["fuzzy_name_matches"],
    "lineitem": ["part_triangle_stats"],
    "events": [
        "scd2_intervals",
        "event_pattern_match",
        "attribution_linear",
        "events_trend_ols",
        "events_transition_matrix",
        "rfm_segmentation",
        "session_path_topk",
    ],
    "documents": [
        "text_lexical_diversity",
        "sample_weighted_systematic",
        "token_cooccurrence",
        "build_postings",
    ],
    "lineitem2": ["lineitem_corr_matrix"],
    "orders": ["customer_pareto_abc"],
}


def build(spark, factor: int) -> str:
    dst = f"/tmp/sq_b45_{factor}x"
    import os

    if os.path.exists(f"{dst}/_done"):
        return dst
    rep = spark.range(factor).withColumnRenamed("id", "__rep")

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    n_c = cust.agg(F.max("c_custkey")).head()[0] + 1
    cust.crossJoin(rep).withColumn(
        "c_custkey", F.col("c_custkey") + F.col("__rep") * n_c
    ).withColumn(
        "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
    ).drop("__rep").repartition(32).write.mode("overwrite").parquet(
        f"{dst}/customer.parquet"
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    n_o = li.agg(F.max("l_orderkey")).head()[0] + 1
    n_p = li.agg(F.max("l_partkey")).head()[0] + 1
    li.crossJoin(rep).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("__rep") * n_o
    ).withColumn(
        "l_partkey", F.col("l_partkey") + F.col("__rep") * n_p
    ).drop("__rep").repartition(32).write.mode("overwrite").parquet(
        f"{dst}/lineitem.parquet"
    )

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

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    n_ok = orders.agg(F.max("o_orderkey")).head()[0] + 1
    n_ck = orders.agg(F.max("o_custkey")).head()[0] + 1
    orders.crossJoin(rep).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("__rep") * n_ok
    ).withColumn(
        "o_custkey", F.col("o_custkey") + F.col("__rep") * n_ck
    ).drop("__rep").repartition(32).write.mode("overwrite").parquet(
        f"{dst}/orders.parquet"
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_d = docs.agg(F.max("doc_id")).head()[0] + 1
    docs.crossJoin(rep).withColumn(
        "doc_id", F.col("doc_id") + F.col("__rep") * n_d
    ).drop("__rep").repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
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
    factors = [int(a) for a in sys.argv[1:]] or FACTORS
    spark = get_spark("b45-probe")
    names = [q for qs in FAMILIES.values() for q in qs]
    base = {q: time_query(spark, q, SRC) for q in names}
    hdr = f"{'query':28s} {'1x':>7s} {'rows':>9s}"
    for f in factors:
        hdr += f" {str(f) + 'x':>8s} {'t/unit':>7s} {'rows':>10s} {'r/unit':>7s}"
    print(hdr, flush=True)
    rows = {q: [base[q]] for q in names}
    for f in factors:
        dst = build(spark, f)
        for q in names:
            rows[q].append(time_query(spark, q, dst))
            tt, n = rows[q][-1]
            t0, n0 = base[q]
            print(
                f"  [{f}x] {q}: {tt:.2f}s t/unit={tt / (t0 * f):.2f}"
                f" rows={n} r/unit={n / (max(n0, 1) * f):.2f}",
                flush=True,
            )
    for q in names:
        t0, n0 = rows[q][0]
        line = f"{q:28s} {t0:7.2f} {n0:9d}"
        for i, f in enumerate(factors):
            tt, n = rows[q][i + 1]
            line += (
                f" {tt:8.2f} {tt / (t0 * f):7.2f}"
                f" {n:10d} {n / (max(n0, 1) * f):7.2f}"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
