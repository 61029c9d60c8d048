"""TCP stream reassembly + length-prefix framing (SURVEY.md §2 B3/B4/B5/B14).

Reference: per-(client, port) accumulation of payload chunks until the
4-byte big-endian length prefix is satisfied, multiple messages per packet
unrolled, invalid framing discards the connection's buffered state
(core.clj:86-100, 146-150, 192-259).

Spark mapping: the per-connection byte-buffer state machine is imperative by
nature, so this is the one operator implemented with ``applyInPandas`` —
grouped by the connection key, Arrow-batched, ordered by (ts, event_id)
inside each group. At scale each group is one TCP connection (small), and
groups distribute freely across executors; the single shuffle is on
(client, port).
"""

from __future__ import annotations

import struct as _struct

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schema import MAX_RPC_MESSAGE_BYTES

MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("client", T.StringType()),
        T.StructField("port", T.IntegerType()),
        T.StructField("server", T.StringType()),
        T.StructField("inbound", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("msg_seq", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def _valid_length(n: int) -> bool:
    """Framing heuristic (core.clj:86-100): reject non-positive or >256MiB —
    a mid-stream fragment without its header."""
    return 0 < n < MAX_RPC_MESSAGE_BYTES


def _reassemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    client = pdf["client"].iloc[0]
    port = int(pdf["port"].iloc[0])
    server = pdf["server"].iloc[0]
    # `port` is the CLIENT's port by construction, so a chunk whose source
    # port equals it was sent by the client — an inbound request. (Same
    # client-side keying as the reference, core.clj:182-191.)
    inbound = bool(int(pdf["src_port"].iloc[0]) == port)

    out_ts, out_seq, out_data = [], [], []
    buf = bytearray()
    seq = 0
    for ts, data in zip(pdf["ts"], pdf["data"]):
        if data is None:
            continue
        buf.extend(data)
        # unroll every complete message in the buffer (B5: one packet may
        # complete several messages; Nagle/asynchbase coalescing)
        while len(buf) >= 4:
            (n,) = _struct.unpack_from(">i", buf, 0)
            if not _valid_length(n):
                # B14: framing lost -> drop this connection's buffered state
                buf.clear()
                break
            if len(buf) < 4 + n:
                break  # B4: expects more fragments
            out_ts.append(ts)  # completion-packet timestamp (core.clj:226-254)
            out_seq.append(seq)
            out_data.append(bytes(buf[4 : 4 + n]))
            seq += 1
            del buf[: 4 + n]

    return pd.DataFrame(
        {
            "client": client,
            "port": port,
            "server": server,
            "inbound": inbound,
            "ts": out_ts,
            "msg_seq": out_seq,
            "data": out_data,
        }
    )


def reassemble(chunks: DataFrame) -> DataFrame:
    """tcp_chunks (schema.TCP_CHUNK_SCHEMA) -> one row per framed message.

    Grouping includes ``src_port`` so the two directions of one TCP
    connection (client->server requests, server->client responses) keep
    SEPARATE framing buffers — interleaving them would corrupt the length
    prefixes. The reference gets this for free by framing each packet's
    payload against its own direction's stream (core.clj:192-194, 226-254).
    """
    return (
        chunks.groupBy("client", "port", "src_port")
        .applyInPandas(_reassemble_group, MESSAGE_SCHEMA)
    )
