"""Multimodal plumbing tests: schemas, mapInPandas batch shape, deterministic
byte features, metadata-only frame sampling, stubbed codec gate."""

import pytest
from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = M.synthesize_media(spark, 30)
    df.cache().count()
    return df


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "meta",
    ]
    assert {r.kind for r in media.select("kind").distinct().collect()} == {
        "image", "audio", "video",
    }


def test_synthesis_deterministic(spark, media):
    again = {r.media_id: bytes(r.payload) for r in
             M.synthesize_media(spark, 30).collect()}
    first = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert first == again
    # payload = md5(id) hex decoded, repeated (id % 7 + 1) times
    assert len(first[0]) == 16 and len(first[6]) == 16 * 7


def test_extract_features(media):
    feats = {r.media_id: r for r in M.extract_features(media).collect()}
    assert len(feats) == 30
    f0 = feats[0]
    assert f0.n_bytes == 16
    assert 0 <= f0.mean_byte <= 255
    assert 0 < f0.byte_entropy <= 8.0
    # repeated payloads share byte stats but not length
    assert feats[6].n_bytes == 112
    assert abs(feats[6].byte_entropy) > 0


def test_frame_sampling_metadata_only(media):
    frames = M.sample_frames(media, fps=2.0)
    rows = frames.collect()
    vids = media.where(F.col("kind") == "video").collect()
    assert len(rows) > 0
    for v in vids:
        expect = max(int(v.meta.duration_ms / 1000 * 2.0), 1)
        got = [r for r in rows if r.media_id == v.media_id]
        assert len(got) == expect
        assert all(r.frame_ts_ms == r.frame_idx * 500 for r in got)
    # no payload column in the sampled plan (decode deferred)
    assert "payload" not in frames.columns


def test_resize_stub_contract(media):
    out = M.resize_stub(media, 64, 64)
    rows = {r.media_id: r for r in out.collect()}
    orig = {r.media_id: r for r in media.collect()}
    for mid, r in rows.items():
        assert r.meta.width == 64 and r.meta.height == 64
        assert 1 <= len(r.payload) <= len(orig[mid].payload)
        assert r.meta.format == orig[mid].meta.format


def test_codec_decode_is_gated():
    with pytest.raises(NotImplementedError):
        M.decode_image_batch(b"\x89PNG", "png")


def test_ppm_decode_hand_checked():
    # 2x1 image: pixels (1,2,3) and (5,6,7) -> means (3,4,5)
    raster = bytes([1, 2, 3, 5, 6, 7])
    w, h, arr = M.decode_ppm_bytes(b"P6\n2 1\n255\n" + raster)
    assert (w, h) == (2, 1)
    assert arr.reshape(-1, 3).mean(axis=0).tolist() == [3.0, 4.0, 5.0]


def test_ppm_decode_comment_and_whitespace_tolerant():
    # comments and arbitrary whitespace are legal anywhere in the header
    data = b"P6 # magic\n# a comment line\n  2\t1 # dims\n255\n" + bytes(6)
    w, h, arr = M.decode_ppm_bytes(data)
    assert (w, h) == (2, 1) and arr.sum() == 0


def test_ppm_decode_rejects_bad_payloads():
    with pytest.raises(ValueError):
        M.decode_ppm_bytes(b"P5\n2 1\n255\n" + bytes(2))  # PGM, not P6
    with pytest.raises(ValueError):
        M.decode_ppm_bytes(b"P6\n2 1\n65535\n" + bytes(12))  # 16-bit
    with pytest.raises(ValueError):
        M.decode_ppm_bytes(b"P6\n4 4\n255\n" + bytes(5))  # short raster


def test_ppm_decode_via_decode_image_batch():
    # uncompressed formats decode WITHOUT a codec library
    w, h, arr = M.decode_image_batch(b"P6\n1 1\n255\n\xff\x00\x80", "ppm")
    assert (w, h) == (1, 1) and arr[0, 0].tolist() == [255, 0, 128]


def test_ppm_resize_nearest_hand_checked():
    # 2x2 image, distinct pixels; downscale to 1x1 keeps pixel (0,0),
    # upscale to 4x2 replicates each source column twice (floor mapping)
    raster = bytes([10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42])
    payload = b"P6\n2 2\n255\n" + raster
    out, enc = M.resize_ppm_bytes(payload, 1, 1)
    assert out.shape == (1, 1, 3) and out[0, 0].tolist() == [10, 11, 12]
    assert enc.startswith(b"P6\n1 1\n255\n")
    out4, enc4 = M.resize_ppm_bytes(payload, 4, 2)
    assert out4.shape == (2, 4, 3)
    assert out4[0, 0].tolist() == out4[0, 1].tolist() == [10, 11, 12]
    assert out4[0, 2].tolist() == out4[0, 3].tolist() == [20, 21, 22]
    assert out4[1, 0].tolist() == [30, 31, 32]
    # the re-encoded payload round-trips through the decoder
    w, h, arr = M.decode_ppm_bytes(enc4)
    assert (w, h) == (4, 2) and (arr == out4).all()


def test_ppm_resize_operator_matches_python(spark):
    media = M.synthesize_ppm(spark, 12)
    out = {r.media_id: r for r in M.resize_ppm(media, 3, 2).collect()}
    for r in media.collect():
        want, payload = M.resize_ppm_bytes(bytes(r.payload), 3, 2)
        got = out[r.media_id]
        assert (got.width, got.height) == (3, 2)
        assert bytes(got.payload) == payload
        sums = want.reshape(-1, 3).sum(axis=0)
        assert got.mean_g == round(float(sums[1]) / 6, 6)


def test_wav_resample_decimates_and_roundtrips(spark):
    import numpy as np

    s = np.array([100, -200, 300, -400, 500], dtype="<i2")
    payload = M.encode_wav_bytes(s, 8000)
    sr, back = M.decode_wav_bytes(payload)
    assert sr == 8000 and (back == s).all()  # encoder inverts the decoder

    media = spark.createDataFrame(
        [(0, bytearray(payload))], "media_id long, payload binary"
    )
    row = M.resample_wav(media, 2).collect()[0]
    kept = s[::2]  # 100, 300, 500
    assert (row.sample_rate, row.n_samples) == (4000, 3)
    assert row.mean_amp == round(float(kept.mean()), 6)
    sr2, back2 = M.decode_wav_bytes(bytes(row.payload))
    assert sr2 == 4000 and (back2 == kept).all()


def test_ppm_corpus_decode_matches_python(spark):
    media = M.synthesize_ppm(spark, 12)
    out = {r.media_id: r for r in M.decode_ppm(media).collect()}
    for r in media.collect():
        w, h, arr = M.decode_ppm_bytes(bytes(r.payload))
        got = out[r.media_id]
        assert (got.width, got.height) == (w, h)
        sums = arr.reshape(-1, 3).sum(axis=0)
        assert got.mean_r == round(float(sums[0]) / (w * h), 6)
        assert got.mean_b == round(float(sums[2]) / (w * h), 6)


def test_wav_decode_hand_checked():
    import struct

    samples = [0, 100, -100, 32767, -32768]
    data = struct.pack("<" + "h" * len(samples), *samples)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    sr, s = M.decode_wav_bytes(hdr + data)
    assert sr == 8000 and s.tolist() == samples


def test_wav_decode_skips_unknown_chunks():
    import struct

    data = struct.pack("<h", 42)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"  # ignored chunk
    hdr = (b"RIFF" + struct.pack("<I", 48) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16))
    sr, s = M.decode_wav_bytes(
        hdr + extra + b"data" + struct.pack("<I", 2) + data)
    assert sr == 8000 and s.tolist() == [42]


def test_wav_decode_rejects_bad_payloads():
    import struct

    with pytest.raises(ValueError):
        M.decode_wav_bytes(b"OggS" + bytes(40))  # not RIFF
    stereo = (b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
              + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
              + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        M.decode_wav_bytes(stereo)


def test_wav_corpus_decode_matches_python(spark):
    out = {r.media_id: r for r in
           M.decode_wav(M.synthesize_wav(spark, 8)).collect()}
    for r in M.synthesize_wav(spark, 8).collect():
        sr, s = M.decode_wav_bytes(bytes(r.payload))
        got = out[r.media_id]
        assert got.sample_rate == 8000 == sr
        assert got.n_samples == len(s) == r.media_id % 50 + 10
        assert got.mean_amp == round(float(s.sum()) / len(s), 6)


def test_video_sampled_frame_means(spark):
    import numpy as np

    video = M.synthesize_raw_video(spark, 6)
    out = M.sampled_frame_means(video, every_k=2).collect()
    raw = {r.media_id: r for r in video.collect()}
    # only even frame indices sampled; means match the sliced raster
    for r in out:
        v = raw[r.media_id]
        assert r.frame_idx % 2 == 0 and r.frame_idx < v.n_frames
        flen = v.width * v.height * 3
        arr = np.frombuffer(
            bytes(v.payload)[r.frame_idx * flen:(r.frame_idx + 1) * flen],
            dtype=np.uint8,
        ).reshape(-1, 3)
        npx = v.width * v.height
        assert r.mean_r == round(float(arr[:, 0].sum()) / npx, 6)
        assert r.mean_b == round(float(arr[:, 2].sum()) / npx, 6)
    # every video contributes ceil(n_frames / 2) sampled frames
    per = {}
    for r in out:
        per[r.media_id] = per.get(r.media_id, 0) + 1
    for mid, v in raw.items():
        assert per[mid] == (v.n_frames + 1) // 2


def test_ahash_matches_python_and_is_brightness_stable(spark):
    import numpy as np

    media = M.synthesize_ppm(spark, 24)
    got = {r.media_id: r.ahash for r in M.ahash_ppm(media, grid=4).collect()}
    for r in media.collect():
        assert got[r.media_id] == M.ahash_ppm_bytes(bytes(r.payload), 4)
    # aHash thresholds against the image's own mean, so a global
    # brightness shift (the perceptual-hash motivation) keeps the hash
    w, h, arr = M.decode_ppm_bytes(bytes(media.collect()[3].payload))
    dim = np.clip(arr.astype("int64") - 40, 0, 255).astype("uint8")
    pay = (b"P6\n%d %d\n255\n" % (w, h)) + dim.tobytes()
    base = M.ahash_ppm_bytes(bytes(media.collect()[3].payload), 4)
    # uniform shifts move every cell AND the mean; most bits survive
    assert bin(base ^ M.ahash_ppm_bytes(pay, 4)).count("1") <= 3


def test_ahash_pairs_find_planted_variants(spark):
    n = 24
    media = M.synthesize_ppm_variants(spark, n)
    # the variant half differs from its base by one pixel's R channel
    base = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert len(base) == 2 * n
    for i in range(n):
        b, v = base[i], base[i + n]
        assert b[:20] != v or b != v  # headers equal, raster perturbed
        assert len(b) == len(v)
    out, sigs = M.ahash_pairs(media, max_hamming=3,
                              return_persisted=True)
    pairs = {(r.d1, r.d2): r.hamming for r in out.collect()}
    sigs.unpersist()
    hashes = {r.media_id: M.ahash_ppm_bytes(base[r.media_id], 4)
              for r in media.collect()}
    # recall 1 at the banding radius: every (i, i+n) plant within
    # hamming 3 MUST surface (pigeonhole over 4 bands)
    for i in range(n):
        ham = bin(hashes[i] ^ hashes[i + n]).count("1")
        if ham <= 3:
            assert pairs[(i, i + n)] == ham
    # and nothing beyond the radius is reported
    assert all(v <= 3 for v in pairs.values())
    for (d1, d2), ham in pairs.items():
        assert d1 < d2
        assert bin(hashes[d1] ^ hashes[d2]).count("1") == ham


def test_video_frame_dedup_planted_pairs(spark):
    n = 12
    video = M.synthesize_video_variants(spark, n)
    pairs = {(r.d1, r.d2): r for r in M.video_dup_pairs(video).collect()}
    raw = {r.media_id: r for r in video.collect()}
    # each planted copy differs from its base only in frame 0
    for i in range(n):
        b, v = raw[i], raw[i + n]
        assert bytes(b.payload)[1:] == bytes(v.payload)[1:]
        assert bytes(b.payload)[0] != 0xFF or bytes(v.payload)[0] == 0xFF
    # frame fingerprints: one row per frame, slice matches the payload
    fr = M.frame_fingerprints(video.where(F.col("media_id") == 0)).collect()
    v0 = raw[0]
    flen = v0.width * v0.height * 3
    assert len(fr) == v0.n_frames
    for r in fr:
        sl = bytes(v0.payload)[r.frame_idx * flen:(r.frame_idx + 1) * flen]
        assert r.fhash == sl.hex()
    # every planted pair shares all-but-the-first frame; n_shared counts
    # DISTINCT fingerprints (the periodic synthetic stream repeats frames
    # within a video), so compare against the true distinct tail count
    for i in range(n):
        r = pairs[(i, i + n)]
        assert r.share >= 0.5
        b = raw[i]
        fl = b.width * b.height * 3
        tail = {bytes(b.payload)[k * fl:(k + 1) * fl]
                for k in range(1, b.n_frames)}
        assert r.n_shared >= len(tail)
    # share is computed over DISTINCT fingerprints and never exceeds 1
    assert all(r.share <= 1.0 for r in pairs.values())


def test_trim_silence_boundaries_and_roundtrip(spark):
    import numpy as np

    media = M.synthesize_wav_padded(spark, 16)
    out = {r.media_id: r for r in M.trim_silence(media).collect()}
    for r in media.collect():
        sr, s = M.decode_wav_bytes(bytes(r.payload))
        got = out[r.media_id]
        ph, pt = r.media_id % 4 + 1, r.media_id % 3 + 2
        # planted zero pads: trim removes AT LEAST them (md5 boundary
        # samples may also fall under the threshold)
        assert got.trim_head >= ph and got.trim_tail >= pt
        assert got.n_samples == len(s)
        assert got.n_kept == len(s) - got.trim_head - got.trim_tail
        # the re-encoded payload decodes to exactly the kept span
        sr2, s2 = M.decode_wav_bytes(bytes(got.payload))
        assert sr2 == sr
        kept = s[got.trim_head:len(s) - got.trim_tail]
        assert np.array_equal(s2, kept)
        if got.n_kept:
            assert abs(s[got.trim_head]) >= 256
            assert abs(kept[-1]) >= 256
            assert got.mean_amp == round(
                float(kept.astype(np.int64).sum()) / len(kept), 6)


def test_trim_silence_all_silent_clip(spark):
    import numpy as np

    payload = M.encode_wav_bytes(np.zeros(7, dtype="<i2"), 8000)
    df = spark.createDataFrame([(0, bytearray(payload))],
                               "media_id long, payload binary")
    r = M.trim_silence(df).collect()[0]
    assert r.n_kept == 0 and r.trim_head == 7 and r.trim_tail == 0
    assert r.mean_amp is None
    sr, s = M.decode_wav_bytes(bytes(r.payload))
    assert sr == 8000 and len(s) == 0


def test_image_dedup_keep_best_drops_variants(spark):
    from hbase_packet_inspector_spark.operators import dedup as D

    n = 16
    media = M.synthesize_ppm_variants(spark, n)
    pairs = M.ahash_pairs(media).select("d1", "d2")
    clusters = D.dedup_clusters(pairs, iterations=4)
    decoded = M.decode_ppm(media).select(
        F.col("media_id").alias("doc_id"),
        (F.col("width") * F.col("height")).cast("int").alias("n_pixels"),
    )
    out = {r.doc_id: r for r in
           D.keep_best(decoded, clusters, quality_col="n_pixels").collect()}
    assert len(out) == 2 * n  # every image verdicted, none silently lost
    # exactly one keeper per cluster
    keep_per_cluster = {}
    for r in out.values():
        keep_per_cluster.setdefault(r.cluster, 0)
        keep_per_cluster[r.cluster] += bool(r.keep)
    assert all(v == 1 for v in keep_per_cluster.values())
    # the keeper is the argmax: max pixel count, tie-break lowest id
    # (a variant never beats its base — same size, higher id — though a
    # LARGER accidental cluster-mate may beat both)
    members = {}
    for r in out.values():
        members.setdefault(r.cluster, []).append(r)
    for rows in members.values():
        best = min(rows, key=lambda r: (-r.n_pixels, r.doc_id))
        assert best.keep and all(not r.keep for r in rows if r is not best)
    for i in range(n):
        if out[i + n].cluster == out[i].cluster:
            assert not (out[i + n].keep and not out[i].keep)


def test_ahash_index_roundtrip_probe_and_append(spark, tmp_path):
    """save_ahash_index -> probe: every (batch, corpus) pair within the
    banding radius surfaces with its exact Hamming distance; the probe
    plans with NO corpus-side Exchange (bucketed index layout is the
    hash layout — only the broadcast batch moves); append folds new
    images in and the next probe sees them."""
    corpus = M.synthesize_ppm(spark, 12)
    batch = M.synthesize_ppm_variants(spark, 12).where(
        F.col("media_id") >= 12
    )  # the planted variants of the corpus images, ids 12..23
    M.save_ahash_index(corpus, str(tmp_path / "aidx"), table="t_ahash",
                       buckets=4)
    idx = M.load_ahash_index(spark, "t_ahash")
    assert idx.count() == 12 * 4

    got, sigs = M.probe_ahash_index(idx, batch, return_persisted=True)
    plan = got._jdf.queryExecution().executedPlan().toString()
    rows = {(r.d_new, r.d_old): r.hamming for r in got.collect()}
    sigs.unpersist()
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning(bkey" not in plan, plan

    # brute-force truth over the decoded hashes
    ch = {r.media_id: M.ahash_ppm_bytes(bytes(r.payload))
          for r in corpus.collect()}
    bh = {r.media_id: M.ahash_ppm_bytes(bytes(r.payload))
          for r in batch.collect()}
    for bid, bhash in bh.items():
        for cid, chash in ch.items():
            ham = bin(bhash ^ chash).count("1")
            if ham <= 3:
                assert rows[(bid, cid)] == ham
    assert all(v <= 3 for v in rows.values())
    # every planted variant finds its base (hamming small by design
    # for most; assert at least half surface to catch wiring bugs)
    found = sum(1 for i in range(12) if (i + 12, i) in rows)
    assert found >= 6

    # append the batch; a re-probe of the SAME batch now also matches
    # the newly indexed copies (self-match excluded by id guard)
    M.append_ahash_index(batch, table="t_ahash")
    got2, sigs2 = M.probe_ahash_index(idx, batch, return_persisted=True)
    rows2 = {(r.d_new, r.d_old) for r in got2.collect()}
    sigs2.unpersist()
    assert set(rows) <= rows2
    assert idx.count() == 24 * 4
    spark.sql("DROP TABLE IF EXISTS t_ahash")


def test_incremental_ahash_cross_side_only_and_gate(spark):
    media = M.synthesize_ppm_variants(spark, 10)
    batch = media.where(F.col("media_id") >= 10)
    corpus = media.where(F.col("media_id") < 10)
    pairs, sigs = M.incremental_ahash_pairs(batch, corpus,
                                            return_persisted=True)
    rows = pairs.collect()
    sigs.unpersist()
    # pairs cross sides only, oriented new -> old
    assert all(r.d_new >= 10 and r.d_old < 10 for r in rows)
    hashes = {r.media_id: M.ahash_ppm_bytes(bytes(r.payload))
              for r in media.collect()}
    for r in rows:
        assert bin(hashes[r.d_new] ^ hashes[r.d_old]).count("1") == r.hamming
    verdicts = {r.media_id: r for r in
                M.media_gate_decisions(batch, pairs).collect()}
    assert len(verdicts) == 10  # every arrival verdicted
    matched = {r.d_new for r in rows}
    for mid, v in verdicts.items():
        if mid in matched:
            assert not v.keep and v.n_matches >= 1
            assert v.min_hamming == min(
                r.hamming for r in rows if r.d_new == mid)
        else:
            assert v.keep and v.n_matches == 0 and v.min_hamming is None


def test_media_corpus_card_hand_checked(spark, media):
    import math

    card = {r.kind: r for r in M.media_corpus_card(media).collect()}
    raw = media.collect()
    assert set(card) == {"image", "audio", "video"}
    for kind, row in card.items():
        mine = [r for r in raw if r.kind == kind]
        assert row.n_assets == len(mine)
        sizes = [len(bytes(r.payload)) for r in mine]
        assert row.total_bytes == sum(sizes)
        assert row.avg_bytes == round(sum(sizes) / len(sizes), 6)
        assert row.n_formats == 1  # kind and format co-derive from id%3
        ents = []
        for r in mine:
            data = bytes(r.payload)
            counts = {}
            for by in data:
                counts[by] = counts.get(by, 0) + 1
            e = -sum((c / len(data)) * math.log2(c / len(data))
                     for c in counts.values())
            ents.append(round(e, 4))
        assert row.avg_entropy == round(sum(ents) / len(ents), 6)
