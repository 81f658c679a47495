import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_output_databricks_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep pytest startup lean
    # FAIR scheduler: stage-ahead tests must exercise the real staged
    # path (the r4 FIFO guard falls back to plain read-ahead otherwise)
    os.environ.setdefault("SPARK_GRAFT_SCHEDULER", "FAIR")
    s = build_session(app_name="engine-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
