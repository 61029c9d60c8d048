"""WARC source via the Spark 4 Python DataSource API:
``spark.read.format("warc").load(glob)``.

WARC (ISO 28500) is the web-archive record format Common Crawl publishes —
THE canonical raw input of an LLM training-data pipeline. This source turns
archive files into rows a curation pipeline consumes directly: WARC headers
parsed into typed columns, and for ``application/http`` response records
the HTTP envelope split off (status + best-effort UTF-8 body text), so the
quality/dedup/language operators run on ``text`` without a second pass.

Format handling (pure stdlib, no external deps):
- plain ``.warc`` and gzip ``.warc.gz`` — both the whole-file-gzip and the
  per-record-member layout Common Crawl uses (GzipFile iterates
  concatenated members transparently);
- header block terminated by a blank line, ``Content-Length`` bytes of
  payload, CRLF or LF line endings;
- malformed tails degrade to fewer records, never an exception (the pcap
  garbage-never-raises discipline).

Scale shape — the pcap_datasource precedent: planning-time listing makes
one InputPartition per archive file (WARC framing is sequential; the file
is the split unit, exactly how distributed Common Crawl jobs shard), so a
100k-file crawl dump fans out across executors with per-file retry and
speculation; rows stream lazily out of the parser — the archive never
materializes whole.

Reference parity note: the reference engine reads packet captures, not web
archives (pcap.clj); WARC is part of this repo's LLM-data-pipeline surface.
"""

from __future__ import annotations

import datetime
import glob as _glob
import gzip
import io
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("record_id", StringType()),
    StructField("warc_type", StringType()),
    StructField("warc_date", TimestampType()),
    StructField("target_uri", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("http_status", IntegerType()),
    StructField("text", StringType()),
    StructField("payload", BinaryType()),
])


def _read_blob(path: str) -> bytes:
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        if head == b"\x1f\x8b":
            # GzipFile walks ALL concatenated members — this is what makes
            # Common Crawl's record-per-member layout read as one stream
            with gzip.GzipFile(fileobj=io.BytesIO(f.read())) as gz:
                return gz.read()
        return f.read()


def _parse_warc_date(s: str):
    try:
        return datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None


def _split_http(payload: bytes):
    """(status, body_text) for an HTTP response payload; (None, None) when
    the payload doesn't start with an HTTP status line."""
    if not payload.startswith(b"HTTP/"):
        return None, None
    sep = payload.find(b"\r\n\r\n")
    seplen = 4
    if sep < 0:
        sep = payload.find(b"\n\n")
        seplen = 2
    if sep < 0:
        return None, None
    head, body = payload[:sep], payload[sep + seplen:]
    try:
        status = int(head.split(None, 2)[1])
    except (IndexError, ValueError):
        status = None
    return status, body.decode("utf-8", errors="replace")


def parse_warc_bytes(path: str, blob: bytes):
    """Yield record dicts from a decompressed WARC byte stream. Tolerant:
    a truncated or malformed tail ends iteration instead of raising."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and blob[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not blob[pos:pos + 5] == b"WARC/":
            return
        hdr_end = blob.find(b"\r\n\r\n", pos)
        seplen = 4
        lf_end = blob.find(b"\n\n", pos)
        if hdr_end < 0 or (0 <= lf_end < hdr_end):
            hdr_end, seplen = lf_end, 2
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].decode(
                "utf-8", errors="replace").splitlines()[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + seplen
        if body_start + length > n:
            return  # truncated record: stop, don't guess
        payload = blob[body_start:body_start + length]
        status, text = _split_http(payload)
        yield {
            "path": path,
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "warc_date": _parse_warc_date(headers.get("warc-date", "")),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "http_status": status,
            "text": text,
            "payload": payload,
        }
        pos = body_start + length


def warc_to_documents(warc):
    """HTTP response records -> the documents-table shape every curation
    operator consumes (doc_id, text, n_chars, source): deterministic
    doc_id (xxhash64 of the WARC record id — stable across re-reads and
    engines that agree on xxhash64), body text as extracted by the
    source, and source = the target URI's host (the natural per-domain
    rollup key for quality/mixture/dedup reports). Pure column
    expressions — chains straight into quality_features, lang_id,
    dedup, DSIR without another Python pass."""
    from pyspark.sql import functions as F

    return (
        warc.where(
            (F.col("warc_type") == "response") & F.col("text").isNotNull()
        )
        .select(
            F.xxhash64("record_id").alias("doc_id"),
            "text",
            F.length("text").alias("n_chars"),
            F.coalesce(
                F.parse_url("target_uri", F.lit("HOST")), F.lit("")
            ).alias("source"),
        )
    )


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("warc source requires a path")

    def partitions(self):
        paths = sorted(_glob.glob(self._path)) if any(
            c in self._path for c in "*?[") else [self._path]
        if os.path.isdir(self._path):
            paths = sorted(
                os.path.join(self._path, f) for f in os.listdir(self._path)
            )
        if not paths:
            raise FileNotFoundError(self._path)
        return [WarcFilePartition(p) for p in paths]

    def read(self, partition: WarcFilePartition):
        blob = _read_blob(partition.path)
        for rec in parse_warc_bytes(partition.path, blob):
            yield _record_tuple(rec)


def _record_tuple(rec: dict):
    return (
        rec["path"], rec["record_id"], rec["warc_type"], rec["warc_date"],
        rec["target_uri"], rec["content_type"], rec["content_length"],
        rec["http_status"], rec["text"], rec["payload"],
    )


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Streaming half: ``spark.readStream.format("warc").load(dir)`` turns
    a crawl drop directory into a firehose — each micro-batch is the set
    of archive files that appeared since the last trigger, which is
    exactly the cadence crawls are delivered at (a dump lands, the gate
    runs). Compose with warc_to_documents + the streaming ingest gate for
    the end-to-end 'crawl in, curated docs out' loop.

    Offsets are the sorted list of file names already consumed, so
    readBetweenOffsets can replay any committed batch exactly (the
    checkpoint contract) and files may arrive in ANY order — no
    mtime/lexicographic assumptions. The simple-reader API reads on the
    driver; at crawl-dump rates (files per minute, parsed once) that is
    the right trade — a partition-parallel streamReader is the upgrade
    path if a batch must fan out, same parser either way."""

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("warc source requires a path")

    def _list(self) -> list[str]:
        p = self._path
        if os.path.isdir(p):
            return sorted(os.path.join(p, f) for f in os.listdir(p))
        if any(c in p for c in "*?["):
            return sorted(_glob.glob(p))
        return [p] if os.path.exists(p) else []

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start["seen"])
        new = [p for p in self._list() if p not in seen]
        end = {"seen": sorted(seen | set(new))}
        # a LIST iterator, not a generator: the runtime copy.copy()s the
        # prefetched iterator (replayable batches) and next()s it for the
        # empty-batch check — built-in list iterators support both,
        # generators neither
        return iter(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(
            sorted(set(end["seen"]) - set(start["seen"]))
        ))

    def _rows(self, paths: list[str]) -> list:
        return [
            _record_tuple(rec)
            for p in paths
            for rec in parse_warc_bytes(p, _read_blob(p))
        ]

    def commit(self, end: dict) -> None:
        pass  # files are immutable once landed; nothing to release


class WarcDataSource(DataSource):
    """``spark.dataSource.register(WarcDataSource)`` then
    ``spark.read.format("warc").load("crawl/*.warc.gz")`` or
    ``spark.readStream.format("warc").load("crawl/")``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcDataSourceReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return WarcStreamReader(self.options)


def register(spark) -> None:
    # Python workers re-import this module by name; ship the package so
    # registration works from any driver cwd (the pcap_datasource lesson)
    from ..session import _ship_package

    _ship_package(spark)
    spark.dataSource.register(WarcDataSource)
