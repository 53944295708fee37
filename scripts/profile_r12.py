"""Round-12 optimization profiler: per-query breakdown of where bench
seconds go — construction (Python + eager actions), execution into the
noop sink, Spark job/stage counts, and the formatted plan.

Usage:
    python scripts/profile_r12.py [query ...]        # default: full HEADLINE
    SPARK_GRAFT_PROFILE_OUT=/tmp/profile_r12.json

For each query it records:
  t_build   — seconds to call fn(spark, sf_dir) (includes any eager
              count/checkpoint actions the operator performs)
  t_exec    — seconds for the noop write of the returned frame
  t_total   — t_build + t_exec (what bench.py times as one interval)
  n_jobs    — Spark jobs launched across both phases (statusTracker via
              a dedicated job group)
  runs      — both passes' (t_build, t_exec); pass 1 absorbs JIT warmup,
              min is the steady-state number (bench methodology)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("squirreling-profile-r12")
    sc = spark.sparkContext
    names = sys.argv[1:] or [n for n in HEADLINE if n in inventory.QUERIES]
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))

    # warm the catalog/footers like bench.py does
    try:
        inventory.QUERIES["count_star"](spark, sf_dir).collect()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup error: {exc}", file=sys.stderr)

    out: dict[str, dict] = {}
    for name in names:
        fn = inventory.QUERIES[name]
        rec: dict = {"runs": []}
        for r in range(runs):
            group = f"profile:{name}:{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
            except Exception as exc:  # noqa: BLE001
                rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"ERROR {name}: {rec['error']}", file=sys.stderr)
                break
            finally:
                sc.setJobGroup(None, None)
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            rec["runs"].append(
                {
                    "t_build": round(t1 - t0, 4),
                    "t_exec": round(t2 - t1, 4),
                    "t_total": round(t2 - t0, 4),
                    "n_jobs": len(jobs),
                }
            )
        if rec["runs"]:
            best = min(rec["runs"], key=lambda x: x["t_total"])
            rec["best"] = best
            print(
                f"{name:36s} total={best['t_total']:7.3f} "
                f"build={best['t_build']:7.3f} exec={best['t_exec']:7.3f} "
                f"jobs={best['n_jobs']}"
            )
        out[name] = rec

    path = os.environ.get("SPARK_GRAFT_PROFILE_OUT", "/tmp/profile_r12.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
