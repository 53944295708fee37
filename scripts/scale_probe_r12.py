"""Round-12 scale probes.

1. docs_length_cdf at 3x/30x/100x over plain doc_id-offset replicas:
   replicas duplicate text, so every per-source length DISTRIBUTION is
   invariant — bucket counts scale by F and the ppm CDF bounds must come
   back BIT-IDENTICAL per (source, probe) while n_total grows by F (the
   semantic projection check). Plan is the quantile-family shape (two
   bucket-level exchanges), so t/unit should fall toward scan speed.

2. events_user_overlap + sources_gram_overlap re-timed post-refactor
   (r11 verdict task 2: both now run through hll_pairwise_overlap, which
   adds a LIMIT-bounded group-count probe job at build time): expect
   ~unchanged cost and identical outputs vs the pre-refactor r11 probe
   rows (the register-algebra plan is byte-equivalent; only the guard
   job is new).

region_hll_corrected is deliberately NOT probed: its input (nation x
region) is constant-size by definition — the low-n slice IS the point
(linear-counting regime), so there is no scale axis to exercise.

Usage: python scripts/scale_probe_r12.py [factor ...]   (default 3 30 100)
Run ISOLATED — no concurrent Spark/DuckDB jobs (timings contaminate).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

from scale_probe_r11 import SRC, build_disjoint, build_events, build_plain

inventory.load_all()


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
    spark = get_spark("r12-probe")
    probes = {
        "docs_length_cdf": build_plain,
        "events_user_overlap": build_events,
        "sources_gram_overlap": build_disjoint,
    }
    base = {q: time_query(spark, q, SRC) for q in probes}

    def cdf_invariant(sf_dir):
        df = inventory.QUERIES["docs_length_cdf"](spark, sf_dir)
        return sorted(
            map(
                tuple,
                df.select(
                    "source", "probe", "cdf_lo_ppm", "cdf_hi_ppm"
                ).collect(),
            )
        )

    base_cdf = cdf_invariant(SRC)
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
            if q == "docs_length_cdf":
                vals = cdf_invariant(dst)
                print(
                    "         cdf bounds invariant="
                    f"{'YES' if vals == base_cdf else 'NO'}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
