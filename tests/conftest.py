import os
import sys

import pytest

# portable: the repo root is this file's parent dir, wherever the
# checkout lives (review finding; the hardcoded /root/repo silently
# imported a DIFFERENT checkout when one happened to exist there)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# right-size the test JVM like cpus/shuffle below: sf0.001 needs well
# under 1g, and the production 48g cap trips strict-overcommit or
# cgroup-limited CI hosts (setdefault — an explicit env wins)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")

from priority_data_pipeline_azure_sql_db_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()  # release the JVM deterministically at session end


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
