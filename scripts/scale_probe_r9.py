"""Round-9 scale probes (r8 verdict tasks 2 + 6).

1. part_triangle_stats at 30x under the DEFAULT 16 GiB driver heap with
   the new reliable-storage checkpoint knob (SPARK_GRAFT_CHECKPOINT_DIR):
   the r8 probe OOM'd at 16g because localCheckpoint stores blocks on
   executor memory/disk; reliable checkpointing moves them to disk paths
   and must clear the watch-item without the 64g override.
2. 100x probes for the two super-linear-risk operators:
   fuzzy_name_matches (r/unit drifted 1.11 -> 1.37 at 30x) and
   part_triangle_stats.

Replica construction matches scripts/scale_probe_b45.py exactly
(operator-aware: regenerated customer names, disjoint co-order graphs),
only restricted to the two tables these operators read.

Usage: python scripts/scale_probe_r9.py [factor ...]   (default 30 100)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# reliable checkpoint dir BEFORE any session/env use
os.environ.setdefault("SPARK_GRAFT_CHECKPOINT_DIR", "/tmp/sq_ckpt_r9")

from pyspark.sql import functions as F

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

SRC = "/root/testdata/sf0.1"
NAMES = ["fuzzy_name_matches", "part_triangle_stats"]


def build(spark, factor: int) -> str:
    dst = f"/tmp/sq_r9_{factor}x"
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
    factors = [int(a) for a in sys.argv[1:]] or [30, 100]
    spark = get_spark("r9-probe")
    print(
        "driver mem:",
        spark.sparkContext.getConf().get("spark.driver.memory"),
        " checkpoint dir:",
        os.environ["SPARK_GRAFT_CHECKPOINT_DIR"],
        flush=True,
    )
    base = {q: time_query(spark, q, SRC) for q in NAMES}
    for q in NAMES:
        print(f"  [1x] {q}: {base[q][0]:.2f}s rows={base[q][1]}", flush=True)
    for f in factors:
        dst = build(spark, f)
        for q in NAMES:
            tt, n = time_query(spark, q, dst)
            t0, n0 = base[q]
            print(
                f"  [{f}x] {q}: {tt:.2f}s t/unit={tt / (t0 * f):.2f}"
                f" rows={n} r/unit={n / (max(n0, 1) * f):.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
