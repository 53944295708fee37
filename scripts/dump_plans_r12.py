"""Dump .explain('formatted') for named queries into plans/r12/.

Usage: python scripts/dump_plans_r12.py <suffix> <outdir> <query> [query ...]
(run from the tree whose code should be dumped; suffix = before|after)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root))

from squirreling_spark import inventory
from squirreling_spark.session import get_spark

inventory.load_all()

suffix, outdir = sys.argv[1], Path(sys.argv[2])
outdir.mkdir(parents=True, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(f"dump-plans-r12-{suffix}")

for name in sys.argv[3:]:
    df = inventory.QUERIES[name](spark, sf_dir)
    txt = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    (outdir / f"{name}_{suffix}.txt").write_text(txt)
    print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
