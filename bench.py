"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

# Headline set: one representative per operator family (scan, filter, agg,
# joins, window, nested, set ops, dedup, similarity, text).
HEADLINE = [
    "scan_project",
    "filter_where",
    "hash_agg_q1",
    "group_having",
    "join_inner",
    "join_left",
    "join_semi",
    "topk",
    "union_all",
    "except_all",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("squirreling-bench")

    names = [n for n in HEADLINE if n in inventory.QUERIES]
    # Warm the JVM + parquet footers once so we measure query time, not
    # session bootstrap.
    inventory.QUERIES["count_star"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        fn = inventory.QUERIES[name]
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink executes the complete physical plan without paying
        # driver-side row transfer — measures engine throughput, not py4j.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
