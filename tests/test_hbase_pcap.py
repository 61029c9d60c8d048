"""End-to-end conformance on the reference's OWN pcap fixtures
(dev-resources/*.pcap: real HBase 1.2.6 RPC traffic): the full
pcap -> reassembly -> protobuf decode -> correlate -> tables pipeline must
reproduce the invariants the reference asserts in
test/hbase_packet_inspector/core_test.clj:248-377."""

import os

import pytest
from pyspark.sql import functions as F

from hbase_packet_inspector_spark.engine import Engine

FIXDIR = "/root/reference/dev-resources"
TEST_TABLE = "TestTable"
RECORD_COUNT = 100
RECORD_SIZE = 1000
BATCH_GET = 20
CACHING = 20

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference pcap fixtures not present"
)


def tables(spark, name):
    eng = Engine(spark).load_pcap(f"{FIXDIR}/{name}.pcap", ports=(16201,))
    return eng.register_tables().tables


def test_sequential_write(spark):
    # core_test.clj:270-282
    t = tables(spark, "sequentialWrite")
    multi = t["requests"].where(
        (F.col("method") == "multi") & (F.col("table") == TEST_TABLE)
    ).collect()
    assert len(multi) == 1
    m = multi[0]
    assert m.batch == RECORD_COUNT
    assert m.size > RECORD_SIZE * RECORD_COUNT
    assert m.cells == RECORD_COUNT
    acts = t["actions"].where(F.col("call_id") == m.call_id).collect()
    assert len(acts) == RECORD_COUNT
    assert all(a.method == "put" and a.cells == 1 for a in acts)


def test_random_read(spark):
    # core_test.clj:284-299
    t = tables(spark, "randomRead")
    multis = t["responses"].where(F.col("method") == "multi").collect()
    assert len(multis) == RECORD_COUNT // BATCH_GET
    for m in multis:
        assert m.batch == BATCH_GET and m.cells == BATCH_GET
        assert m.size > RECORD_SIZE * m.batch
    results = t["results"].collect()
    assert len(results) == RECORD_COUNT
    assert all(
        r.method == "get" and r.cells == 1 and r.row and r.region and r.table
        for r in results
    )


def test_scan(spark):
    # core_test.clj:301-312: next-rows responses inherit TestTable via
    # scanner state; 100/20 = 5 of them, each > 20 KB with 20 cells
    t = tables(spark, "scan")
    nexts = t["responses"].where(
        (F.col("method") == "next-rows") & (F.col("table") == TEST_TABLE)
    ).collect()
    assert len(nexts) == RECORD_COUNT // CACHING
    for r in nexts:
        assert r.size > RECORD_SIZE * CACHING
        assert r.cells == CACHING


def test_multi_message_packets(spark):
    # core_test.clj:314-316: deferredFlush coalesces messages per packet;
    # 2000 increment infos total (requests + responses)
    t = tables(spark, "deferredFlush")
    n = (
        t["requests"].where(F.col("method") == "increment").count()
        + t["responses"].where(F.col("method") == "increment").count()
    )
    assert n == 2000


def test_small_scan(spark):
    # core_test.clj:318-325: 200 cells total over table 't' small scans
    t = tables(spark, "smallScan")
    total = (
        t["responses"]
        .where((F.col("method") == "small-scan") & (F.col("table") == "t"))
        .agg(F.sum("cells"))
        .collect()[0][0]
    )
    assert total == 200


@pytest.mark.parametrize(
    "fixture,method",
    [
        ("increment", "increment"),
        ("append", "append"),
        ("checkAndPut", "check-and-put"),
        ("checkAndMutate", "check-and-put"),
        ("checkAndDelete", "check-and-delete"),
    ],
)
def test_cas_methods(spark, fixture, method):
    # core_test.clj:327-340: 100 requests and 100 responses per method
    t = tables(spark, fixture)
    assert t["requests"].where(F.col("method") == method).count() == RECORD_COUNT
    assert t["responses"].where(F.col("method") == method).count() == RECORD_COUNT
