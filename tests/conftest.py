import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from squirreling_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("squirreling-tests", cpus=8)
    yield s


@pytest.fixture(autouse=True, scope="module")
def _drop_leaked_temp_views():
    """Cross-module temp-view hygiene: engine.execute_sql registers its
    ``tables=`` fixtures as session-global temp views and returns a LAZY
    result, so callers can't drop them — after a module finishes, any
    views left behind could collide with a later module's bare-column
    dtype resolution (the r6 verdict's INVALID_INDEX_OF_ZERO order
    dependence). Every module registers its own fixtures, so dropping
    all temporary views at module teardown is safe."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return
    try:
        for tbl in s.catalog.listTables():
            if tbl.isTemporary:
                try:
                    s.catalog.dropTempView(tbl.name)
                except Exception:  # noqa: BLE001 — hygiene is best-effort
                    pass
    except Exception:  # noqa: BLE001
        pass


@pytest.fixture(scope="session")
def sf001():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01():
    # Default parity scale; override (e.g. /root/testdata/sf0.1 for the
    # once-per-round full-inventory run catching scale-dependent
    # semantics) via SPARK_GRAFT_PARITY_SF.
    import os

    return os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
