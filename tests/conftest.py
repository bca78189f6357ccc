from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from fastembed_rs_spark.session import get_spark

    spark = get_spark("tests", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
