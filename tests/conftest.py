import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFDATA = "/root/reference/sql_project-master/data"
SEED_DUMP = "/root/reference/sql_project-master/ddl_dml.sql"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark

    s = get_spark(app_name="fraudmart-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
