import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_packet_inspector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hpi-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
