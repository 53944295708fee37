"""Pre-flight smoke gate: run EVERY graded-window query against the DuckDB
oracle at sf0.001 and fail loudly on any mismatch or error.

This is the cheap (<2 min) end-of-round check: the full parity suite
(``pytest tests/test_parity.py``) covers all registered queries at sf0.01;
this covers exactly the 50 queries the driver grades, at the smallest scale
factor, so there is never again a round that ships with known-red graded
rows (round 2 shipped with 4 red graded rows the local cache had already
flagged).

Usage:  python scripts/preflight.py  [sf_dir]
Exit code 0 = all graded queries green.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark
from tests.parity import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("squirreling-preflight")
    inventory.load_all()

    failures: list[str] = []
    t0 = time.perf_counter()
    for name in inventory.GRADE_ORDER:
        fn = inventory.QUERIES[name]
        oracle = inventory.ORACLES.get(name)
        start = time.perf_counter()
        try:
            if oracle is None:
                rows = fn(spark, sf_dir).collect()
                errs = [] if rows is not None else [f"{name}: no result"]
            else:
                errs = compare(name, fn, oracle, spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — report, keep checking
            errs = [f"{name}: {type(exc).__name__}: {exc}"]
        status = "ok" if not errs else "FAIL"
        print(f"{status:4s} {name:28s} {time.perf_counter() - start:6.2f}s")
        failures.extend(errs)

    total = time.perf_counter() - t0
    if failures:
        print(f"\nPREFLIGHT FAIL ({len(failures)} problems, {total:.1f}s):")
        for f in failures:
            print(" -", f[:400])
        return 1
    print(f"\nPREFLIGHT OK: {len(inventory.GRADE_ORDER)} graded queries "
          f"green in {total:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
