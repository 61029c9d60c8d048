"""WARC source tests: synthesized archives (plain + per-record-member
gzip, the Common Crawl layout) read through the registered Spark 4 Python
DataSource, plus the documents-shape bridge into the curation operators."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from hbase_packet_inspector_spark.sources.warc import (
    parse_warc_bytes,
    warc_to_documents,
)


_BODY = "<html><body>hello crawl world</body></html>"
_HTTP = (
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _BODY
).encode()


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


def _archive() -> list[bytes]:
    return [
        _record("warcinfo", "aaa", None, b"robots: classic\r\n",
                ctype="application/warc-fields"),
        _record("response", "bbb", "http://example.com/page", _HTTP),
        _record("request", "ccc", "http://example.com/page",
                b"GET /page HTTP/1.1\r\nHost: example.com\r\n\r\n",
                ctype="application/http; msgtype=request"),
    ]


def test_parse_warc_bytes_records_and_http_split():
    blob = b"".join(_archive())
    recs = list(parse_warc_bytes("mem", blob))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "request"]
    resp = recs[1]
    assert resp["record_id"] == "<urn:uuid:bbb>"
    assert resp["target_uri"] == "http://example.com/page"
    assert resp["http_status"] == 200 and resp["text"] == _BODY
    assert resp["content_length"] == len(_HTTP)
    assert resp["warc_date"].year == 2017
    # non-HTTP payloads carry no status/text but keep the raw bytes
    assert recs[0]["http_status"] is None and recs[0]["text"] is None
    assert recs[0]["payload"] == b"robots: classic\r\n"


def test_parse_warc_truncated_tail_never_raises():
    blob = b"".join(_archive()) + b"WARC/1.0\r\nWARC-Type: response\r\n" \
        b"Content-Length: 99999\r\n\r\nshort"
    recs = list(parse_warc_bytes("mem", blob))
    assert len(recs) == 3  # the truncated tail is dropped, not guessed at


def test_warc_datasource_plain_and_gzip(spark, tmp_path):
    from hbase_packet_inspector_spark.sources import warc as W

    (tmp_path / "a.warc").write_bytes(b"".join(_archive()))
    # Common Crawl layout: one gzip MEMBER per record, concatenated
    (tmp_path / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _archive())
    )
    W.register(spark)
    df = spark.read.format("warc").load(str(tmp_path / "*.warc*"))
    rows = df.collect()
    assert len(rows) == 6  # 3 records x 2 files
    assert {r.path.rsplit("/", 1)[-1] for r in rows} == {"a.warc", "b.warc.gz"}
    resp = [r for r in rows if r.warc_type == "response"]
    assert len(resp) == 2
    assert all(r.http_status == 200 and r.text == _BODY for r in resp)
    # both layouts parse identically
    a = sorted((r.record_id, r.warc_type, r.content_length)
               for r in rows if r.path.endswith("a.warc"))
    b = sorted((r.record_id, r.warc_type, r.content_length)
               for r in rows if r.path.endswith("b.warc.gz"))
    assert a == b


def test_warc_stream_reader_incremental_files(spark, tmp_path):
    """readStream.format('warc'): run 1 drains the file present at start;
    a file landing afterwards is picked up — alone — by run 2 resuming
    from the same checkpoint; run 3 with nothing new emits nothing. The
    crawl-drop-directory cadence, checkpoint-exact."""
    from hbase_packet_inspector_spark.sources import warc as W

    W.register(spark)
    src = tmp_path / "drop"
    src.mkdir()
    ck = str(tmp_path / "ck")
    (src / "a.warc").write_bytes(b"".join(_archive()))

    def drain():
        out = []
        q = (
            spark.readStream.format("warc").load(str(src))
            .writeStream.foreachBatch(lambda b, _i: out.extend(b.collect()))
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination()
        return out

    first = drain()
    assert len(first) == 3
    assert {r.path.rsplit("/", 1)[-1] for r in first} == {"a.warc"}

    (src / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _archive())
    )
    second = drain()
    assert len(second) == 3
    assert {r.path.rsplit("/", 1)[-1] for r in second} == {"b.warc.gz"}
    # stream rows === batch rows for the same file, column for column
    batch = spark.read.format("warc").load(str(src / "b.warc.gz")).collect()
    key = lambda rows: sorted(tuple(str(x) for x in r) for r in rows)
    assert key(second) == key(batch)

    assert drain() == []  # checkpoint resume: nothing new, nothing emitted


class _CountingReader:
    """File wrapper that records how many bytes were pulled — the probe
    that proves the parser streams instead of slurping."""

    def __init__(self, fp):
        self._fp = fp
        self.bytes_read = 0

    def read(self, n=-1):
        b = self._fp.read(n)
        self.bytes_read += len(b)
        return b


def _big_archive(n_records=100, payload_size=80_000):
    import os as _os

    recs, payloads = [], []
    for i in range(n_records):
        p = _os.urandom(payload_size)  # incompressible: keeps gzip honest
        payloads.append(p)
        head = (
            f"WARC/1.0\r\nWARC-Type: resource\r\n"
            f"WARC-Record-ID: <urn:uuid:big{i}>\r\n"
            f"WARC-Date: 2017-03-01T12:00:00Z\r\n"
            f"Content-Type: application/octet-stream\r\n"
            f"Content-Length: {len(p)}\r\n\r\n"
        ).encode()
        recs.append(head + p + b"\r\n\r\n")
    return recs, payloads


def test_parse_warc_stream_bounded_memory_plain(tmp_path):
    """The parser yields records long before the file is fully read —
    peak buffered bytes are one record + one chunk, not the archive."""
    from hbase_packet_inspector_spark.sources.warc import parse_warc_stream

    recs, payloads = _big_archive()
    path = tmp_path / "big.warc"
    path.write_bytes(b"".join(recs))
    total = path.stat().st_size
    with open(path, "rb") as f:
        cr = _CountingReader(f)
        it = parse_warc_stream("big", cr)
        first = next(it)
        # one 1 MiB chunk (+ slack) pulled for the first record of an ~8 MB
        # archive — the whole-file slurp would show bytes_read == total here
        assert cr.bytes_read <= 2 * (1 << 20) < total / 2
        rest = list(it)
    assert cr.bytes_read == total  # drained exactly, no over-read loop
    out = [first] + rest
    assert len(out) == len(payloads)
    assert all(r["payload"] == p for r, p in zip(out, payloads))


def test_parse_warc_stream_bounded_memory_gzip(tmp_path):
    """Same proof through the gzip path: compressed bytes are pulled
    incrementally as the parser consumes plaintext (per-record members,
    the Common Crawl layout)."""
    import gzip as _gz

    from hbase_packet_inspector_spark.sources.warc import parse_warc_stream

    recs, payloads = _big_archive()
    path = tmp_path / "big.warc.gz"
    path.write_bytes(b"".join(_gz.compress(r) for r in recs))
    total = path.stat().st_size
    with open(path, "rb") as f:
        cr = _CountingReader(f)
        with _gz.GzipFile(fileobj=cr) as gz:
            it = parse_warc_stream("big", gz)
            next(it)
            assert cr.bytes_read < total / 2
            n = 1 + sum(1 for _ in it)
    assert n == len(payloads)


def test_parse_warc_stream_truncated_gzip_never_raises(tmp_path):
    """A gzip member chopped mid-payload ends iteration (EOFError is
    swallowed by the fill loop), it does not raise into the task."""
    import gzip as _gz

    from hbase_packet_inspector_spark.sources.warc import _iter_records

    recs, _ = _big_archive(n_records=3, payload_size=10_000)
    blob = b"".join(_gz.compress(r) for r in recs)
    path = tmp_path / "cut.warc.gz"
    path.write_bytes(blob[: len(blob) - 4000])  # chop inside the last member
    out = list(_iter_records(str(path)))
    assert 0 < len(out) < 3  # earlier members parse, the cut tail is dropped


def test_warc_listing_skips_temp_and_sidecars(spark, tmp_path):
    """Batch + stream listings honor the atomic-rename landing convention:
    dot/underscore names and subdirectories are invisible, so an archive
    being copied in is never half-parsed and pinned in the offset."""
    from hbase_packet_inspector_spark.sources import warc as W

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.warc").write_bytes(b"".join(_archive()))
    (d / "_tmp.b.warc").write_bytes(b"".join(_archive())[:40])  # in-flight
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".a.warc.crc").write_bytes(b"\0\0")
    (d / "sub").mkdir()  # would IsADirectoryError in open()

    W.register(spark)
    rows = spark.read.format("warc").load(str(d)).collect()
    assert {r.path.rsplit("/", 1)[-1] for r in rows} == {"a.warc"}

    ck = str(tmp_path / "ck")
    out = []
    q = (
        spark.readStream.format("warc").load(str(d))
        .writeStream.foreachBatch(lambda b, _i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()
    assert {r.path.rsplit("/", 1)[-1] for r in out} == {"a.warc"}

    # the atomic rename lands the file; the next run picks up ONLY it —
    # the temp name never entered the offset
    import os as _os

    _os.rename(d / "_tmp.b.warc", d / "b.warc")
    (d / "b.warc").write_bytes(b"".join(_archive()))
    out2 = []
    q = (
        spark.readStream.format("warc").load(str(d))
        .writeStream.foreachBatch(lambda b, _i: out2.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()
    assert {r.path.rsplit("/", 1)[-1] for r in out2} == {"b.warc"}
    assert len(out2) == 3  # the FULL file, not the 40-byte prefix


def test_warc_min_age_and_missing_path(tmp_path):
    """min_age_seconds defers fresh files (non-atomic writers); a literal
    path that does not exist fails at planning time, not mid-task."""
    import os as _os
    import time as _time

    import pytest

    from hbase_packet_inspector_spark.sources.warc import (
        WarcDataSourceReader, _list_archives,
    )

    d = tmp_path / "drop"
    d.mkdir()
    f = d / "fresh.warc"
    f.write_bytes(b"".join(_archive()))
    assert _list_archives(str(d), min_age=3600) == []  # too young
    old = _time.time() - 7200
    _os.utime(f, (old, old))
    assert _list_archives(str(d), min_age=3600) == [str(f)]

    with pytest.raises(FileNotFoundError):
        WarcDataSourceReader({"path": str(tmp_path / "nope.warc")}).partitions()


def test_warc_to_documents_feeds_curation(spark, tmp_path):
    from hbase_packet_inspector_spark.operators.text import quality_features
    from hbase_packet_inspector_spark.sources import warc as W

    (tmp_path / "c.warc").write_bytes(b"".join(_archive()))
    W.register(spark)
    warc = spark.read.format("warc").load(str(tmp_path / "c.warc"))
    docs = warc_to_documents(warc)
    rows = docs.collect()
    assert len(rows) == 1  # only the response record becomes a document
    assert rows[0].source == "example.com"
    assert rows[0].text == _BODY and rows[0].n_chars == len(_BODY)
    # chains straight into the quality gate (pure column exprs)
    q = quality_features(docs).collect()
    assert len(q) == 1 and q[0].n_words >= 1


def test_warc_to_documents_extract_html(spark, tmp_path):
    """extract_html=True runs html_to_text on the crawl body in place:
    the curation operators then see prose, not tag soup, and the
    markup_frac signal rides along."""
    from hbase_packet_inspector_spark.sources import warc as W

    (tmp_path / "c.warc").write_bytes(b"".join(_archive()))
    W.register(spark)
    warc = spark.read.format("warc").load(str(tmp_path / "c.warc"))
    rows = warc_to_documents(warc, extract_html=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.text == "hello crawl world"  # tags stripped in place
    assert r.n_chars == len("hello crawl world")  # length of the CLEAN text
    assert 0 < r.markup_frac < 1
    # default path is unchanged (hash-pinned consumers)
    raw = warc_to_documents(warc).collect()[0]
    assert raw.text == _BODY and "markup_frac" not in raw.asDict()


def test_warc_to_media_bridges_into_decode(spark, tmp_path):
    """WARC media records (HTTP Content-Type image/audio) land in the
    media-table shape with the HTTP envelope stripped, and the image
    payload decodes through the real PPM decoder — the crawl-to-
    multimodal pipeline end-to-end. Text/html responses and envelope-
    less payloads stay out (they belong to warc_to_documents)."""
    from hbase_packet_inspector_spark.operators.multimodal import (
        decode_ppm, decode_ppm_bytes,
    )
    from hbase_packet_inspector_spark.sources.warc import warc_to_media

    ppm = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    wav_body = b"RIFF\x00\x00\x00\x00WAVE"
    recs = [
        _record("response", "img1", "http://ex.com/a.ppm",
                b"HTTP/1.1 200 OK\r\nContent-Type: image/x-portable-pixmap"
                b"\r\n\r\n" + ppm),
        _record("response", "aud1", "http://ex.com/b.wav",
                b"HTTP/1.1 200 OK\r\nContent-Type: audio/wav\r\n\r\n"
                + wav_body),
        _record("response", "htm1", "http://ex.com/c.html",
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                b"<html>x</html>"),
        _record("resource", "res1", "http://ex.com/d", b"raw bytes",
                ctype="application/octet-stream"),
    ]
    p = tmp_path / "m.warc"
    p.write_bytes(b"".join(recs))
    warc = spark.read.format("warc").load(str(p))
    out = {r.kind: r for r in warc_to_media(warc).collect()}
    assert set(out) == {"image", "audio"}
    img = out["image"]
    assert img.format == "x-portable-pixmap"
    assert bytes(img.payload) == ppm  # envelope stripped exactly
    w, h, arr = decode_ppm_bytes(bytes(img.payload))
    assert (w, h) == (2, 1)
    assert bytes(out["audio"].payload) == wav_body
    # ids agree with the documents bridge for the same record
    from pyspark.sql import functions as F
    want = warc.where(F.col("target_uri") == "http://ex.com/a.ppm").select(
        F.xxhash64("record_id")).collect()[0][0]
    assert img.media_id == want
    # and the Spark-side decode stage consumes the bridged frame
    decoded = decode_ppm(
        warc_to_media(warc).where(F.col("kind") == "image")
        .select("media_id", "payload")
    ).collect()
    assert len(decoded) == 1 and decoded[0].width == 2


# ---------------------------------------------------------------------------
# End-to-end streamed crawl ingest (VERDICT_r6 item 5): WARC drop dir ->
# html_to_text -> persisted-index gate, as ONE streamed job.

# 25 distinct non-stopword words -> quality_score 2 (the gate's keep bar)
_W25 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega zero")
_W25B = ("uno dos tres cuatro cinco seis siete ocho nueve diez once doce "
         "trece catorce quince dieciseis diecisiete dieciocho diecinueve "
         "veinte veintiuno veintidos veintitres veinticuatro veinticinco")
_W25C = " ".join("k" + w for w in _W25.split())


def _page_record(rid: str, host: str, words: str) -> bytes:
    """A realistic page: script + style chrome that html_to_text must
    strip, prose that must survive."""
    body = (
        "<html><head><script>trackPixel('" + rid + "');var x={a:1};"
        "</script><style>nav{color:red}</style></head>"
        "<body><p>" + words + "</p></body></html>"
    )
    return _record(
        "response", rid, f"http://{host}/p/{rid}",
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
        .encode(),
    )


def test_warc_ingest_stream_end_to_end(spark, tmp_path):
    """The full crawl front door as one streamed job, across 3
    micro-batches with a late-landing archive and a compaction fold:

      drain 1 (batch 0): archive1 -> pages A (keep) + B (keep), index grows
      drain 2 (batch 1): archive2 -> C = near-dup of A (reject on the
        index grown in batch 0) + D low-quality (reject); archive3 is
        ALREADY on disk but too young under min_age_seconds -> deferred
      drain 3 (batch 2): archive3 aged -> page E (keep); compact_every=3
        folds the index at the end of this batch

    Then batch===stream parity: a one-shot batch read of the same three
    archives through warc_to_documents(extract_html=True) must reproduce
    the streamed decisions' doc set, the kept rows byte-for-byte, and
    the per-doc quality scores."""
    import os
    import time

    from hbase_packet_inspector_spark.operators import dedup as D
    from hbase_packet_inspector_spark.operators.text import quality_features
    from hbase_packet_inspector_spark.streaming.ingest import (
        run_warc_ingest_stream,
    )

    # persisted seed index (one unrelated standing doc)
    seed = spark.createDataFrame(
        [(0, " ".join("zz" + w for w in _W25.split()))],
        "doc_id long, text string",
    )
    D.save_lsh_index(seed, str(tmp_path / "widx"), table="t_warc_gate",
                     buckets=4)

    crawl, out = tmp_path / "crawl", str(tmp_path / "wout")
    crawl.mkdir()
    (crawl / "a1.warc").write_bytes(
        _page_record("pA", "site-a.com", _W25)
        + _page_record("pB", "site-b.com", _W25B)
    )

    kw = dict(table="t_warc_gate", min_est=0.3, min_jaccard=0.3,
              min_age_seconds=3600, compact_every=3)
    old = time.time() - 7200
    os.utime(crawl / "a1.warc", (old, old))
    run_warc_ingest_stream(spark, str(crawl), out, **kw)

    ids = {
        k: spark.sql(f"SELECT xxhash64('<urn:uuid:{k}>')").collect()[0][0]
        for k in ("pA", "pB", "pC", "pD", "pE")
    }
    dec1 = {r.doc_id: r for r in spark.read.parquet(out + "/decisions").collect()}
    assert set(dec1) == {ids["pA"], ids["pB"]}
    assert dec1[ids["pA"]].keep is True and dec1[ids["pB"]].keep is True

    # archive2 lands aged; archive3 lands FRESH (still copying, say)
    (crawl / "a2.warc").write_bytes(
        _page_record("pC", "site-c.com", _W25.replace("zero", "one"))
        + _page_record("pD", "site-d.com", "tiny page")
    )
    os.utime(crawl / "a2.warc", (old, old))
    (crawl / "a3.warc").write_bytes(
        _page_record("pE", "site-e.com", _W25C)
    )
    run_warc_ingest_stream(spark, str(crawl), out, **kw)
    dec2 = {r.doc_id: r for r in spark.read.parquet(out + "/decisions").collect()}
    # min_age deferred archive3: E has NO decision yet
    assert set(dec2) == {ids["pA"], ids["pB"], ids["pC"], ids["pD"]}
    # C rejected on near-dup evidence against the index grown in batch 0
    assert dec2[ids["pC"]].keep is False and dec2[ids["pC"]].n_matches > 0
    # D rejected on quality
    assert dec2[ids["pD"]].keep is False
    assert dec2[ids["pD"]].quality_score < 2
    assert dec2[ids["pD"]].n_matches == 0

    # archive3 finishes landing (ages past the grace interval)
    os.utime(crawl / "a3.warc", (old, old))
    run_warc_ingest_stream(spark, str(crawl), out, **kw)
    dec3 = {r.doc_id: r for r in spark.read.parquet(out + "/decisions").collect()}
    assert set(dec3) == set(ids.values())
    assert dec3[ids["pE"]].keep is True

    # the run ended COMPACTED (batch ids 0,1,2; fold after id 2): at most
    # one file per bucket despite three insertInto appends
    bands, sets = D.load_lsh_index(spark, "t_warc_gate")
    assert len(bands.inputFiles()) <= 4 and len(sets.inputFiles()) <= 4
    assert sorted(r.doc_id for r in sets.select("doc_id").collect()) == \
        sorted([0, ids["pA"], ids["pB"], ids["pE"]])

    # html_to_text REALLY ran inside the stream: kept text is prose only
    kept = {r.doc_id: r for r in spark.read.parquet(out + "/kept").collect()}
    assert kept[ids["pA"]].text == _W25
    assert "trackPixel" not in kept[ids["pA"]].text
    assert kept[ids["pA"]].source == "site-a.com"
    assert kept[ids["pA"]].markup_frac > 0

    # batch===stream parity: the one-shot batch composition over the same
    # archives reproduces the doc set, kept rows, and quality scores
    batch_docs = warc_to_documents(
        spark.read.format("warc").load(str(crawl) + "/*.warc"),
        extract_html=True,
    )
    brows = {r.doc_id: r for r in batch_docs.collect()}
    assert set(brows) == set(dec3)
    for i in (ids["pA"], ids["pB"], ids["pE"]):
        k = kept[i]
        b = brows[i]
        assert (k.text, k.n_chars, k.source, k.markup_frac) == \
            (b.text, b.n_chars, b.source, b.markup_frac)
    q = {r.doc_id: r.quality_score
         for r in quality_features(batch_docs).collect()}
    for i, r in dec3.items():
        assert q[i] == r.quality_score


def test_warc_to_robots_bridges_into_compliance_gate(spark, tmp_path):
    """Crawl archives carry robots.txt as ordinary response records;
    warc_to_robots -> parse_robots -> robots_gate closes the compliance
    loop from raw archives: selection by path, 404s and non-robots URLs
    ignored, duplicate fetches resolve deterministically (min record
    id), and the rules gate a frontier end to end."""
    from hbase_packet_inspector_spark.operators.web import (
        parse_robots,
        robots_gate,
    )
    from hbase_packet_inspector_spark.sources import warc as W
    from hbase_packet_inspector_spark.sources.warc import warc_to_robots

    W.register(spark)

    def resp(rid, uri, status, body):
        return _record(
            "response", rid, uri,
            (f"HTTP/1.1 {status} X\r\nContent-Type: text/plain\r\n\r\n"
             + body).encode(),
        )

    recs = [
        resp("rob1", "http://a.com/robots.txt", 200,
             "User-agent: *\nDisallow: /private\n"),
        # duplicate fetch with DIFFERENT rules: min record id (rob1) wins
        resp("rob2", "http://a.com/robots.txt", 200,
             "User-agent: *\nDisallow: /everything\n"),
        # 404 robots: host stays unrestricted
        resp("rob3", "http://b.com/robots.txt", 404, "not here"),
        # page response whose path merely CONTAINS robots.txt: not rules
        resp("pg1", "http://a.com/blog/robots.txt.html", 200, "article"),
        # ordinary page
        resp("pg2", "http://a.com/p/1", 200, "<html>hi</html>"),
    ]
    p = tmp_path / "r.warc"
    p.write_bytes(b"".join(recs))
    warc = spark.read.format("warc").load(str(p))

    robots = warc_to_robots(warc)
    got = {r.host: r.robots_txt for r in robots.collect()}
    assert set(got) == {"a.com"}
    assert "Disallow: /private" in got["a.com"]
    assert "/everything" not in got["a.com"]  # min-record-id kept

    frontier = spark.createDataFrame(
        [("http://a.com/private/x",), ("http://a.com/p/2",),
         ("http://b.com/private/y",)],
        "url string",
    )
    out = {r.url: r.blocked for r in
           robots_gate(frontier, parse_robots(robots)).collect()}
    assert out == {
        "http://a.com/private/x": True,
        "http://a.com/p/2": False,
        "http://b.com/private/y": False,  # 404 robots -> unrestricted
    }
