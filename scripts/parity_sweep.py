"""Full-inventory parity sweep at an arbitrary scale dir with per-query
progress and a resume file — the once-per-round sf0.1 run (r3 judge task
5) that catches scale-dependent semantics the sf0.01 gate can't.

Usage: python scripts/parity_sweep.py [sf_dir] [state_file] [shard]
Re-running skips queries already recorded green in state_file.

``shard`` is an optional ``i/n`` spec (e.g. ``0/3``): the sorted query
list is strided ``names[i::n]`` so n processes can sweep in parallel,
each with its own state file; merge the state files for the ledger.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark
from tests.parity import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    state_path = Path(
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/parity_sweep_state.json"
    )
    state: dict[str, str] = (
        json.loads(state_path.read_text()) if state_path.exists() else {}
    )
    inventory.load_all()
    spark = get_spark("parity-sweep")

    names = sorted(inventory.ORACLES)
    if len(sys.argv) > 3:
        idx, num = (int(p) for p in sys.argv[3].split("/"))
        names = names[idx::num]
    failures = []
    t0 = time.perf_counter()
    for name in names:
        if state.get(name) == "ok":
            continue
        start = time.perf_counter()
        try:
            errs = compare(
                name,
                inventory.QUERIES[name],
                inventory.ORACLES[name],
                spark,
                sf_dir,
            )
        except Exception as exc:  # noqa: BLE001
            errs = [f"{name}: {type(exc).__name__}: {exc}"[:300]]
        status = "ok" if not errs else "FAIL"
        state[name] = status if not errs else str(errs)[:300]
        state_path.write_text(json.dumps(state, indent=1))
        print(
            f"{status:4s} {name:28s} {time.perf_counter() - start:7.1f}s",
            flush=True,
        )
        failures.extend(errs)

    done = sum(1 for v in state.values() if v == "ok")
    print(
        f"\n{done}/{len(names)} green at {sf_dir} "
        f"({time.perf_counter() - t0:.0f}s this run)"
    )
    if failures:
        for f in failures:
            print(" -", f[:300])
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
