"""A/B: does the interleaved bench evict Spark's 100-entry codegen cache,
making every pass recompile? Run the bench loop (interleaved, 3 rounds)
over a 30-query subset twice in separate JVMs:

  python scripts/ab_codegen_cache.py default
  python scripts/ab_codegen_cache.py big      # maxEntries=10000

and compare per-query best-of.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

SUBSET = [
    "scan_project", "filter_where", "topk", "join_inner",
    "window_row_number", "hash_agg_q1", "group_having", "q3_shipping_priority",
    "q6_forecast_revenue", "q18_large_volume", "q21_waiting_supplier",
    "binary_header_parse", "audio_header_parse", "video_mp4_meta",
    "image_pixel_decode", "html_extract", "markdown_sections",
    "embedding_int8_quant", "events_resample_locf", "events_winsorize",
    "spatial_join", "table_profile_orders", "url_canonicalize",
    "c4_quality_filter", "gopher_quality_filter", "robots_filter",
    "event_pattern_match", "scd2_intervals", "customer_pareto_abc",
    "fuzzy_name_matches", "dedup_substrings",
]

mode = sys.argv[1] if len(sys.argv) > 1 else "default"
extra = {}
if mode == "big":
    extra["spark.sql.codegen.cache.maxEntries"] = "10000"

spark = get_spark(f"ab-codegen-{mode}", extra_conf=extra)
sf_dir = "/root/testdata/sf0.1"
inventory.QUERIES["count_star"](spark, sf_dir).collect()

samples: dict[str, list[float]] = {n: [] for n in SUBSET}
for _ in range(3):
    for name in SUBSET:
        fn = inventory.QUERIES[name]
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples[name].append(time.perf_counter() - start)

out = {n: [round(x, 3) for x in s] for n, s in samples.items()}
best = {n: min(s) for n, s in samples.items()}
print(json.dumps({"mode": mode, "total_best": round(sum(best.values()), 2),
                  "runs": out}))
with open(f"/tmp/ab_codegen_{mode}.json", "w") as fh:
    json.dump(out, fh, indent=1)
