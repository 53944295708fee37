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
