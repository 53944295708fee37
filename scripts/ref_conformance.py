"""Run the reference-test conformance sweep and write CONFORMANCE.json.

Replays every extractable query from the reference's own test suite
(/root/reference/test/execute) through engine.execute_sql and checks the
reference's own expected outputs. See squirreling_spark/conformance.py.

Usage: python scripts/ref_conformance.py [file-substring]
"""
import collections
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from squirreling_spark.conformance import extract_all, run_conformance


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        # the reference implements JS arithmetic: div-by-zero is NULL,
        # size(NULL) is NULL — Spark's non-ANSI mode with modern
        # sizeOfNull matches
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.sizeOfNull", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1] if len(sys.argv) > 1 else None
    cases = extract_all().cases
    if only:
        cases = [c for c in cases if only in c.file]
    byfile = collections.defaultdict(list)
    for c in cases:
        byfile[c.file].append(c)
    per_file = {}
    issues = []
    t0 = time.time()
    for fname in sorted(byfile):
        res = run_conformance(spark, byfile[fname])
        ok = res["pass"] + res["run_only_ok"] + res["expected_errors_ok"]
        n_msg = sum(
            1 for c in byfile[fname] if c.expect_error and c.expect_msg
        )
        per_file[fname] = {
            "ok": ok,
            "total": res["total"],
            "checked": res["pass"],
            "fail": len(res["fail"]),
            "error": len(res["error"]),
            "dynamic_skip": res["dynamic_skip"],
            # round 9: .toThrow('...') message assertions verified by
            # content (substring, modulo trailing "(row N)")
            "msg_asserted": n_msg,
            "msg_ok": res["expected_errors_msg_ok"],
        }
        print(
            f"{fname}: {ok}/{res['total']} ok ({res['pass']} checked)",
            flush=True,
        )
        issues += [
            {"case": label, "query": q[:200], "why": why[:300]}
            for label, q, why in res["fail"] + res["error"]
        ]
    totals = {
        "ok": sum(f["ok"] for f in per_file.values()),
        "total": sum(f["total"] for f in per_file.values()),
        "checked": sum(f["checked"] for f in per_file.values()),
        "fail": sum(f["fail"] for f in per_file.values()),
        "error": sum(f["error"] for f in per_file.values()),
        "msg_asserted": sum(f["msg_asserted"] for f in per_file.values()),
        "msg_ok": sum(f["msg_ok"] for f in per_file.values()),
        "seconds": round(time.time() - t0, 1),
    }
    out = {"totals": totals, "per_file": per_file, "issues": issues}
    with open("CONFORMANCE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(totals))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
