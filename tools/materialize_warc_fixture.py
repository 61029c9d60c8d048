"""Materialize a deterministic committed WARC crawl fixture + its parsed
snapshot — the warc-source analog of materialize_hbase_fixture.py.

Builds ``tests/fixtures/warc_capture/sample.warc.gz`` (a small synthetic
crawl: warcinfo + HTTP request/response pairs over a handful of hosts,
text pages whose bodies derive from md5 of the page index, one PPM image
and one WAV audio response) and parses it back through the library's own
``parse_warc_bytes``, writing the record-level snapshot
``records.parquet`` via pyarrow (single stable file, sorted by record id).

The committed pair gives the ``warc_source_stats`` query a DuckDB oracle:
the driver hash-checks the Spark WARC DataSource's scan + HTTP-envelope
split against an independent engine's aggregation of the pinned parse
output — a regression in the streaming parser, the record framing, or the
HTTP split shows up as an oracle mismatch.

Re-run after any intentional parser change:

    python tools/materialize_warc_fixture.py
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "warc_capture",
)


def _record(wtype: str, rid: str, uri: str | None, payload: bytes,
            ctype: str = "application/http; msgtype=response") -> bytes:
    head = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        "WARC-Date: 2017-03-01T12:00:00Z",
    ]
    if uri:
        head.append(f"WARC-Target-URI: {uri}")
    head += [f"Content-Type: {ctype}", f"Content-Length: {len(payload)}"]
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _words(seed: str, n: int) -> str:
    out = []
    i = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.extend(h[j:j + 5] for j in range(0, 30, 5))
        i += 1
    return " ".join(out[:n])


def build_archive() -> bytes:
    recs = [_record("warcinfo", "info0", None, b"robots: classic\r\n",
                    ctype="application/warc-fields")]
    for i in range(30):
        uri = f"http://site{i % 5}.com/p/{i}"
        status = 404 if i % 7 == 0 else 200
        body = (f"<html><body>{_words(f'page{i}', 20 + i % 11)}"
                f"</body></html>").encode()
        recs.append(_record(
            "response", f"resp{i}", uri,
            (f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n"
             ).encode() + body,
        ))
        if i % 6 == 0:
            recs.append(_record(
                "request", f"req{i}", uri,
                f"GET /p/{i} HTTP/1.1\r\nHost: site{i % 5}.com\r\n\r\n"
                .encode(),
                ctype="application/http; msgtype=request",
            ))
    ppm = b"P6\n2 2\n255\n" + bytes(range(12))
    recs.append(_record(
        "response", "img0", "http://site0.com/logo.ppm",
        b"HTTP/1.1 200 OK\r\nContent-Type: image/x-portable-pixmap\r\n\r\n"
        + ppm,
    ))
    wav = (b"RIFF\x28\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00"
           b"\x40\x1f\x00\x00\x80\x3e\x00\x00\x02\x00\x10\x00data"
           b"\x04\x00\x00\x00\x10\x00\xf0\xff")
    recs.append(_record(
        "response", "aud0", "http://site1.com/jingle.wav",
        b"HTTP/1.1 200 OK\r\nContent-Type: audio/wav\r\n\r\n" + wav,
    ))
    return b"".join(recs)


def main() -> None:
    import pandas as pd

    from hbase_packet_inspector_spark.sources.warc import parse_warc_bytes

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    raw = build_archive()
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    path = os.path.join(FIXTURE_DIR, "sample.warc.gz")
    with open(path, "wb") as f:
        f.write(buf.getvalue())

    rows = [
        {
            "record_id": r["record_id"],
            "warc_type": r["warc_type"],
            "target_uri": r["target_uri"],
            "content_length": r["content_length"],
            "http_status": r["http_status"],
            "n_text_chars": len(r["text"]) if r["text"] is not None else None,
        }
        for r in parse_warc_bytes(path, raw)
    ]
    df = pd.DataFrame(rows).sort_values("record_id").reset_index(drop=True)
    df.to_parquet(os.path.join(FIXTURE_DIR, "records.parquet"), index=False)

    # documents-bridge snapshot: the same engine pipeline the
    # warc_crawl_curation query runs (scan -> warc_to_documents), pinned
    # at the per-doc feature level so DuckDB can replay the rollup
    from pyspark.sql import functions as F

    from hbase_packet_inspector_spark.operators.text import (
        STOPWORDS, _tok,
    )
    from hbase_packet_inspector_spark.session import get_spark
    from hbase_packet_inspector_spark.sources import warc as W
    from hbase_packet_inspector_spark.sources.warc import warc_to_documents

    spark = get_spark("warc-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    W.register(spark)
    docs = warc_to_documents(
        spark.read.format("warc").load(path)
    ).select(
        "doc_id", "source", "n_chars",
        F.size(_tok("text")).alias("n_words"),
        F.size(F.filter(_tok("text"), lambda x: x.isin(*STOPWORDS)))
        .alias("n_stop"),
    )
    ddf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    ddf.to_parquet(os.path.join(FIXTURE_DIR, "documents.parquet"),
                   index=False)

    # media-bridge snapshot: envelope-stripped body sizes + identities
    from hbase_packet_inspector_spark.sources.warc import warc_to_media

    media = warc_to_media(
        spark.read.format("warc").load(path)
    ).select(
        "media_id", "kind", "format",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("body_md5"),
    )
    mdf = media.toPandas().sort_values("media_id").reset_index(drop=True)
    mdf.to_parquet(os.path.join(FIXTURE_DIR, "media.parquet"), index=False)
    print(f"wrote {path} ({len(buf.getvalue())} bytes) + records.parquet "
          f"({len(df)} rows) + documents.parquet ({len(ddf)} rows)")


if __name__ == "__main__":
    main()
