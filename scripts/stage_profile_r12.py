"""Stage-level profile of one query: runs it with the Spark UI enabled and
dumps per-stage executorRunTime / shuffle bytes / task counts from the
REST API, plus a build-phase breakdown (construction vs analysis).

Usage: python scripts/stage_profile_r12.py <query> [runs]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

name = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
sf_dir = "/root/testdata/sf0.1"

spark = get_spark(
    f"stage-profile-{name}", extra_conf={"spark.ui.enabled": "true"}
)
sc = spark.sparkContext
inventory.QUERIES["count_star"](spark, sf_dir).collect()

fn = inventory.QUERIES[name]
for r in range(runs):
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t1 = time.perf_counter()
    _ = df.schema  # force analysis
    t2 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(
        f"run{r}: construct={t1-t0:.3f} analyze={t2-t1:.3f} "
        f"exec={t3-t2:.3f} total={t3-t0:.3f}"
    )

ui = sc.uiWebUrl
app = sc.applicationId
with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
    stages = json.load(r)
stages.sort(key=lambda s: -s.get("executorRunTime", 0))
print(f"\n{'stage':>6} {'tasks':>5} {'runMs':>8} {'cpuMs':>8} {'shRead':>10} {'shWrite':>10} {'in':>10}  name")
for s in stages[:25]:
    print(
        f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
        f"{s.get('executorRunTime',0):>8} {s.get('executorCpuTime',0)//1000000:>8} "
        f"{s.get('shuffleReadBytes',0):>10} {s.get('shuffleWriteBytes',0):>10} "
        f"{s.get('inputBytes',0):>10}  {s['name'][:60]}"
    )
tot = sum(s.get("executorRunTime", 0) for s in stages)
print(f"total executorRunTime across stages: {tot} ms")
