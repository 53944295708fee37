"""Scale probes for the round-9 operator batch (events_debounce,
docs_ngram_novelty, docs_split_assign, token_pair_lift).

Reuses scripts/scale_probe_b45.py's operator-aware replica builder
(disjoint users for events; doc_id-offset replicas for documents — note
the replicas duplicate TEXT, so ngram_novelty's replica docs correctly
score 0 novelty, and token_pair_lift's lift is replication-INVARIANT by
construction: every count in lift = F·n_pair·F·N/(F·df1·F·df2) scales
out, so the top-50 should be constant — a semantic check and a probe).

Usage: python scripts/scale_probe_r9b.py [factor ...]   (default 3 10 30)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from scale_probe_b45 import SRC, build, time_query  # noqa: E402

from squirreling_spark import inventory  # noqa: E402
from squirreling_spark.session import get_spark  # noqa: E402

inventory.load_all()

NAMES = [
    "events_debounce",
    "docs_split_assign",
    "docs_ngram_novelty",
    "token_pair_lift",
]


def main():
    factors = [int(a) for a in sys.argv[1:]] or [3, 10, 30]
    spark = get_spark("r9b-probe")
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
