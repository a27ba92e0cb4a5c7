import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from client_data_ingester_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cdi-spark-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def products_table(tmp_path):
    from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA
    from client_data_ingester_spark.tables import SnapshotTable

    return SnapshotTable(str(tmp_path / "client_products"), CLIENT_PRODUCTS_SCHEMA)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
