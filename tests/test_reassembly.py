"""TCP reassembly tests mirroring the reference's framing semantics
(core_test.clj fragmentation/Nagle coverage via deferredFlush, core.clj:86-100)."""

import datetime as dt
import struct

from hbase_packet_inspector_spark.operators.reassembly import reassemble
from hbase_packet_inspector_spark.schema import TCP_CHUNK_SCHEMA

T0 = dt.datetime(2024, 1, 1)


def chunk(eid, ms, data, client="10.0.0.7", port=40000):
    return {
        "event_id": eid, "ts": T0 + dt.timedelta(milliseconds=ms),
        "client": client, "port": port, "server": "10.0.0.1",
        "src_port": port, "dst_port": 16020, "data": data,
    }


def frame(payload: bytes) -> bytes:
    return struct.pack(">i", len(payload)) + payload


def run(spark, chunks):
    df = spark.createDataFrame(chunks, TCP_CHUNK_SCHEMA)
    return sorted(
        reassemble(df).collect(), key=lambda r: (r.client, r.port, r.msg_seq)
    )


def test_single_message(spark):
    rows = run(spark, [chunk(0, 0, frame(b"hello"))])
    assert len(rows) == 1 and rows[0].data == b"hello"


def test_fragmented_message(spark):
    f = frame(b"A" * 10)
    rows = run(spark, [chunk(0, 0, f[:3]), chunk(1, 5, f[3:8]), chunk(2, 9, f[8:])])
    assert len(rows) == 1
    assert rows[0].data == b"A" * 10
    # completion timestamp = last fragment's packet ts
    assert rows[0].ts == T0 + dt.timedelta(milliseconds=9)


def test_multi_message_per_packet(spark):
    # B5: Nagle coalescing — one packet carries 3 messages
    data = frame(b"one") + frame(b"two") + frame(b"three")
    rows = run(spark, [chunk(0, 0, data)])
    assert [r.data for r in rows] == [b"one", b"two", b"three"]
    assert [r.msg_seq for r in rows] == [0, 1, 2]


def test_message_spanning_and_coalesced(spark):
    # packet1: msg1 + half of msg2; packet2: rest of msg2 + msg3
    m1, m2, m3 = frame(b"aa"), frame(b"bbbb"), frame(b"cc")
    p1 = m1 + m2[:4]
    p2 = m2[4:] + m3
    rows = run(spark, [chunk(0, 0, p1), chunk(1, 5, p2)])
    assert [r.data for r in rows] == [b"aa", b"bbbb", b"cc"]


def test_invalid_length_drops_connection_buffer(spark):
    # mid-stream fragment without header: huge/negative length => discard
    bad = struct.pack(">i", -5) + b"garbage"
    rows = run(spark, [chunk(0, 0, bad), chunk(1, 5, frame(b"ok"))])
    # after the reset, the next well-formed frame parses
    assert [r.data for r in rows] == [b"ok"]


def test_connections_isolated(spark):
    rows = run(
        spark,
        [
            chunk(0, 0, frame(b"c1"), port=40000),
            chunk(1, 0, frame(b"c2"), port=40001),
        ],
    )
    assert {(r.port, r.data) for r in rows} == {(40000, b"c1"), (40001, b"c2")}
