"""Simulate the DRIVER's surface: vanilla SparkSession (its config, not
ours), import __spark_entry__, smoke entry(), then run every queries() entry
at sf0.01 against its oracle_sql() via DuckDB — the driver's exact gate."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

# Vanilla session: whatever Spark 4 defaults are (ANSI on, 200 shuffle
# partitions, JVM-default TZ) — the driver controls this, not us.
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
print("ansi =", spark.conf.get("spark.sql.ansi.enabled"))
print("tz   =", spark.conf.get("spark.sql.session.timeZone", None))

import __spark_entry__ as e
from tests.parity import compare

rows = e.entry(spark).collect()
print(f"entry(): {len(rows)} rows OK")

qs, oracles = e.queries(), e.oracle_sql()
if len(sys.argv) > 1:  # incremental re-verify: driver_sim.py q1 q2 ...
    unknown = [n for n in sys.argv[1:] if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    qs = {n: qs[n] for n in sys.argv[1:]}
fails = []
for name in sorted(qs):
    if name not in oracles:
        n = len(qs[name](spark, "/root/testdata/sf0.01").collect())
        print(f"  rows-only {name}: {n} rows")
        continue
    errs = compare(name, qs[name], oracles[name], spark, "/root/testdata/sf0.01")
    status = "OK " if not errs else "FAIL"
    print(f"  {status} {name}")
    if errs:
        fails.extend(errs)

if fails:
    print("\nFAILURES:")
    for f in fails:
        print(" -", f[:400])
    sys.exit(1)
print(f"\nALL {len(qs)} queries pass under vanilla driver session")
