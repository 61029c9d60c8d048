"""Unit tests for the round-2 curation operators: PII scrubbing, sequence
packing, decontamination, the fixpoint cluster closure, and the bucketed
time-range join — each checked against an independently-computed expectation
(naive pair enumeration, hand-packed chunks, known graph shapes)."""

import datetime

import pytest
from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators import dedup as D
from hbase_packet_inspector_spark.operators import sampling as SA
from hbase_packet_inspector_spark.operators import text as X
from hbase_packet_inspector_spark.operators.ranged import range_join


def test_scrub_pii_counts_and_tokens(spark):
    rows = [
        (0, "mail me at bob@x.io or alice@y.co.uk thanks"),
        (1, "see https://a.example.org/path and http://b.io/q call 555-1234"),
        (2, "no pii here at all"),
        (3, "dial 555-0000 then 555-9999 twice"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in X.scrub_pii(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_url"], out[0]["n_phone"]) == (2, 0, 0)
    assert (out[1]["n_email"], out[1]["n_url"], out[1]["n_phone"]) == (0, 2, 1)
    assert (out[2]["n_email"], out[2]["n_url"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["n_phone"] == 2
    assert out[0]["clean_text"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[1]["clean_text"] == "see <URL> and <URL> call <PHONE>"
    assert out[2]["clean_text"] == "no pii here at all"
    # an email inside a URL query string is consumed by the URL token
    one = spark.createDataFrame(
        [(9, "https://t.example/q%40z@e.com x")], "doc_id long, text string"
    )
    r = X.scrub_pii(one).collect()[0]
    assert "<URL>" in r["clean_text"] and "@" not in r["clean_text"]


def test_pack_sequences_chunks_and_conservation(spark):
    # one source, shards=1 -> fully sequential packing in doc_id order
    rows = [(i, " ".join(["w"] * t), "s") for i, t in enumerate([5, 5, 5, 5, 5])]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = SA.pack_sequences(docs, budget=10, shards=1).orderBy("chunk_id").collect()
    # cum_before: 0,5,10,15,20 -> chunks 0,0,1,1,2
    assert [(r["chunk_id"], r["n_docs"], r["chunk_tokens"]) for r in out] == [
        (0, 2, 10),
        (1, 2, 10),
        (2, 1, 5),
    ]
    assert out[0]["fill_ratio"] == 1.0 and out[2]["fill_ratio"] == 0.5
    assert (out[0]["first_doc"], out[0]["last_doc"]) == (0, 1)
    # conservation across arbitrary sharding: every doc in exactly one chunk
    big = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7)), f"src{i % 3}") for i in range(200)],
        "doc_id long, text string, source string",
    )
    packed = SA.pack_sequences(big, budget=16, shards=4)
    agg = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("chunk_tokens").alias("toks")
    ).collect()[0]
    want = big.agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert agg["docs"] == 200 and agg["toks"] == want
    # no chunk except possibly a shard's last can sit under half-full:
    # a chunk only closes because the running total crossed the budget
    assert packed.where("chunk_tokens > 16 + 7").count() == 0


def test_decontaminate_flags_overlap(spark):
    tr = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),  # shares 'alpha beta gamma' with eval 100
            (1, "nothing in common here"),
            (2, "zz alpha beta gamma"),  # same gram, same eval doc
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma epsilon"), (101, "alpha beta gamma zeta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.decontaminate(tr, ev, n=3).collect()}
    assert out[0]["contaminated"] and out[2]["contaminated"]
    assert not out[1]["contaminated"] and out[1]["n_shared_grams"] == 0
    # doc 0 shares 'alpha beta gamma' with BOTH eval docs -> pair-counted 2
    assert out[0]["n_shared_grams"] == 2 and out[0]["n_eval_docs"] == 2


def test_decontaminate_gram_df_cap_prunes_stop_phrase(spark):
    # 'per our terms of' is boilerplate in EVERY doc (df = 6 > cap 4);
    # only doc 0 shares a RARE gram ('alpha beta gamma') with the eval set
    stop = "per our terms of"
    tr = spark.createDataFrame(
        [
            (0, f"{stop} alpha beta gamma"),
            (1, f"{stop} nothing shared here"),
            (2, f"{stop} also clean text"),
            (3, f"{stop} more clean words"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"{stop} alpha beta gamma"), (101, f"{stop} unrelated eval doc")],
        "doc_id long, text string",
    )
    capped = {
        r["doc_id"]: r
        for r in D.decontaminate(tr, ev, n=4, max_gram_df=4).collect()
    }
    # the stop gram is pruned: docs 1-3 come out clean, doc 0 is flagged
    # only through its rare gram hit against eval doc 100
    assert capped[0]["contaminated"] and capped[0]["n_eval_docs"] == 1
    assert all(not capped[i]["contaminated"] for i in (1, 2, 3))
    # uncapped, the boilerplate gram "contaminates" every train doc
    uncapped = {
        r["doc_id"]: r for r in D.decontaminate(tr, ev, n=4).collect()
    }
    assert all(uncapped[i]["contaminated"] for i in (0, 1, 2, 3))


def test_fixpoint_closes_long_chains(spark):
    # path graph 0-1-2-...-9: diameter 9 > the bounded form's 4 rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "d1 long, d2 long"
    )
    out = D.dedup_clusters_fixpoint(pairs).collect()
    assert {r["cluster"] for r in out} == {0}
    assert sorted(r["doc_id"] for r in out) == list(range(10))
    assert [r["doc_id"] for r in out if r["keep"]] == [0]
    # the bounded 4-round form provably does NOT close this chain
    bounded = D.dedup_clusters(pairs, iterations=4).collect()
    assert {r["cluster"] for r in bounded} != {0}


def test_range_join_matches_naive(spark):
    base = datetime.datetime(2024, 1, 1)
    lrows = [
        (i, base + datetime.timedelta(seconds=37 * i + (i % 5))) for i in range(40)
    ]
    rrows = [
        (100 + i, base + datetime.timedelta(seconds=11 * i + (i % 7)))
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, "event_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, ts timestamp")
    got = {
        (r["event_id"], r["rid_r"])
        for r in range_join(
            left, right, on="ts", window_s=30, value_cols=["rid"]
        ).collect()
    }
    want = {
        (lid, rid)
        for lid, lts in lrows
        for rid, rts in rrows
        if abs((lts - rts).total_seconds()) <= 30
    }
    assert got == want and len(want) > 50
    # window boundary is inclusive on exact millisecond equality
    l1 = spark.createDataFrame([(1, base)], "event_id long, ts timestamp")
    r1 = spark.createDataFrame(
        [(7, base + datetime.timedelta(seconds=30)),
         (8, base + datetime.timedelta(seconds=30, milliseconds=1))],
        "rid long, ts timestamp",
    )
    hits = range_join(l1, r1, on="ts", window_s=30, value_cols=["rid"]).collect()
    assert [h["rid_r"] for h in hits] == [7]


def test_range_join_with_by_keys(spark):
    base = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "a", base), (2, "b", base)], "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", base + datetime.timedelta(seconds=5), 10),
         ("b", base + datetime.timedelta(seconds=500), 20)],
        "k string, ts timestamp, payload long",
    )
    got = range_join(
        left, right, on="ts", window_s=60, by=["k"], value_cols=["payload"]
    ).collect()
    assert len(got) == 1
    assert got[0]["event_id"] == 1 and got[0]["payload_r"] == 10


def test_logreg_matches_numpy_and_learns(spark):
    import numpy as np
    from hbase_packet_inspector_spark.operators import learn as L

    rng = [(float(i % 13) / 3.0, float((i * 7) % 5) / 5.0) for i in range(300)]
    rows = [
        (x1, x2, 1 if (1.5 * x1 - 2.0 * x2 - 2.0) > 0 else 0) for x1, x2 in rng
    ]
    feats = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    w, metrics = L.logreg_fit(feats, ["x1", "x2"], "y", lr=0.5, rounds=3)

    # numpy replica of the exact schedule (clamp, lr, per-round rounding)
    X = np.array([(1.0, r[0], r[1]) for r in rows])
    y = np.array([r[2] for r in rows], dtype=float)
    wn = np.zeros(3)
    for _ in range(3):
        z = np.clip(X @ wn, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        g = ((p - y)[:, None] * X).mean(axis=0)
        wn = np.round(wn - 0.5 * g, 6)
    assert w == [round(v, 6) for v in wn]

    m = metrics.collect()[0]
    z = np.clip(X @ np.array(w), -30.0, 30.0)
    p = 1.0 / (1.0 + np.exp(-z))
    want_loss = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    assert abs(m["logloss"] - round(want_loss, 6)) <= 1e-6
    assert m["n_correct"] == int(((p >= 0.5) == (y == 1.0)).sum())
    # training actually moved the needle vs the w=0 coin-flip loss ln(2)
    assert m["logloss"] < 0.6931


def test_scrub_pii_differential_random_docs(spark):
    # differential vs Python re on one batch of seeded random PII-ish text
    # (single Spark job); patterns live in the Java/RE2/Python common subset
    import random
    import re
    from hbase_packet_inspector_spark.operators.text import PII_PATTERNS

    rng = random.Random(7)
    frags = [
        "plain", "words", "x@y.io", "a.b@mail.example.org", "@", "http://",
        "https://h5.example/p_q", "http://x.io/%7e", "555-1234", "555-12",
        "1555-99999", "a@b", "u_1%2@ex.co", ".com", "a@-", "://x",
    ]
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 12))))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from hbase_packet_inspector_spark.operators.text import scrub_pii

    out = {r.doc_id: r for r in scrub_pii(docs).collect()}
    for i, text in rows:
        clean = text
        for _, pat, token in PII_PATTERNS:
            clean = re.sub(pat, token, clean)
        r = out[i]
        assert r.clean_text == clean, (text, r.clean_text, clean)
        for name, pat, _ in PII_PATTERNS:
            assert r[f"n_{name}"] == len(re.findall(pat, text)), (name, text)


def test_pack_sequences_differential(spark):
    # differential vs a pure-Python replica of the shard+pack schedule
    import hashlib
    import random

    rng = random.Random(11)
    rows = [
        (i, " ".join("w" for _ in range(rng.randint(1, 40))), f"s{i % 2}")
        for i in range(150)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from hbase_packet_inspector_spark.operators.sampling import pack_sequences

    got = {
        (r.source, r.shard, r.chunk_id): (r.n_docs, r.chunk_tokens, r.first_doc,
                                          r.last_doc)
        for r in pack_sequences(docs, budget=32, shards=4).collect()
    }

    def shard_of(doc_id):
        return int(hashlib.md5(f"pack:{doc_id}".encode()).hexdigest()[:6], 16) % 4

    streams: dict = {}
    for i, text, src in rows:
        streams.setdefault((src, shard_of(i)), []).append((i, len(text.split(" "))))
    want = {}
    for (src, sh), docs_in in streams.items():
        cum = 0
        for doc_id, toks in sorted(docs_in):
            chunk = cum // 32
            key = (src, sh, chunk)
            n, t, first, last = want.get(key, (0, 0, doc_id, doc_id))
            want[key] = (n + 1, t + toks, min(first, doc_id), max(last, doc_id))
            cum += toks
    assert got == want


def test_pq_codes_and_adc_match_numpy(spark):
    import numpy as np
    from hbase_packet_inspector_spark.operators import similarity as S

    rng = np.random.RandomState(3)
    vecs = rng.rand(40, 8).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m, sub_d, n_codes = 2, 4, 4

    cb = S.pq_codebook(emb, m=m, sub_dim=sub_d, n_codes=n_codes)
    codes = S.pq_codes(emb, cb, m=m, sub_dim=sub_d)
    got = {(r.vec_id, r.j): r.code for r in codes.collect()}

    V = vecs.astype("float64")
    want = {}
    for i in range(40):
        for j in range(m):
            sub = V[i, j * sub_d:(j + 1) * sub_d]
            d2 = [
                round(float(((sub - V[c, j * sub_d:(j + 1) * sub_d]) ** 2).sum()), 6)
                for c in range(n_codes)
            ]
            want[(i, j)] = int(np.lexsort((np.arange(n_codes), d2))[0])
    assert got == want

    qs = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = S.pq_adc_topk(codes, cb, qs, m=m, sub_dim=sub_d, k=2).collect()
    # ADC distance must equal the sum of per-subspace table entries
    for r in out:
        table = 0.0
        for j in range(m):
            qsub = V[r.q_id, j * sub_d:(j + 1) * sub_d]
            c = want[(r.neighbor_id, j)]
            table += round(float(((qsub - V[c, j * sub_d:(j + 1) * sub_d]) ** 2).sum()), 6)
        assert abs(r.adist - round(table, 6)) <= 1e-9
    # every query got exactly k ranked neighbors, best-first
    per_q = {}
    for r in out:
        per_q.setdefault(r.q_id, []).append((r.rnk, r.adist))
    for q, lst in per_q.items():
        lst.sort()
        assert [rk for rk, _ in lst] == [1, 2]
        assert lst[0][1] <= lst[1][1]


def test_ivfpq_prunes_to_cell(spark):
    from hbase_packet_inspector_spark.operators import similarity as S

    import numpy as np
    rng = np.random.RandomState(5)
    # two well-separated blobs so the coarse quantizer has real structure
    blob = np.vstack([rng.rand(30, 8), rng.rand(30, 8) + 5.0]).astype("float32")
    rows = [(i, [float(x) for x in blob[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = emb.where(F.col("vec_id").isin(0, 30)).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    cells = S.assign_cells(emb, cents)
    cb = S.pq_codebook(emb, m=2, sub_dim=4, n_codes=4)
    codes = S.pq_codes(emb, cb, m=2, sub_dim=4)
    qs = emb.where(F.col("vec_id").isin(5, 35)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    qcells = cells.select(F.col("vec_id").alias("q_id"), "cell").join(
        qs.select("q_id"), "q_id"
    )
    pruned = S.pq_adc_topk(codes, cb, qs, m=2, sub_dim=4, k=60,
                           base_cells=cells, query_cells=qcells).collect()
    full = S.pq_adc_topk(codes, cb, qs, m=2, sub_dim=4, k=60).collect()
    # pruning must restrict the candidate set to the query's blob
    assert 0 < len(pruned) < len(full)
    cell_of = {r.vec_id: r.cell for r in cells.collect()}
    for r in pruned:
        assert cell_of[r.neighbor_id] == cell_of[r.q_id]


def test_pq_recall_improves_with_codebook_size(spark):
    import numpy as np
    from hbase_packet_inspector_spark.operators import similarity as S

    rng = np.random.RandomState(9)
    # clustered data: 8 tight blobs in 8-dim space
    centers = rng.rand(8, 8) * 10
    pts = np.vstack([c + 0.1 * rng.rand(10, 8) for c in centers]).astype("float32")
    rows = [(i, [float(x) for x in pts[i]]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where(F.col("vec_id") % 16 == 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    def mean_recall(n_codes):
        out = S.pq_recall(emb, qs, k=3, m=2, sub_dim=4, n_codes=n_codes).collect()
        return sum(r.recall for r in out) / len(out)

    # more codes per subspace => finer quantization => recall must not drop
    lo, hi = mean_recall(2), mean_recall(16)
    assert hi >= lo
    assert hi > 0.3  # 16 codes on 8 tight blobs resolves most neighbors


def test_quality_gates_batch_stream_parity(spark, tmp_path):
    # the per-doc curation gates are pure narrow column exprs, so the SAME
    # operator code must run unchanged on a stream — micro-batch output
    # rows == batch output rows
    from hbase_packet_inspector_spark.operators import text as XX

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    batch = {tuple(r) for r in XX.quality_features(spark.read.parquet(src)).collect()}
    out: list = []
    q = (
        XX.quality_features(spark.readStream.schema(docs.schema).parquet(src))
        .writeStream.foreachBatch(lambda b, _i: out.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", src + "/_ck")
        .start()
    )
    q.awaitTermination()
    assert {tuple(r) for r in out} == batch and len(batch) > 0


def test_chunk_text_coverage_and_overlap(spark):
    from hbase_packet_inspector_spark.operators.text import chunk_text

    rows = [
        (0, " ".join(f"t{i}" for i in range(100))),  # multi-chunk
        (1, "one two three"),                        # shorter than a chunk
        (2, " ".join(f"u{i}" for i in range(64))),   # exactly one chunk
        (3, " ".join(f"v{i}" for i in range(65))),   # one token of tail
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_text(docs, chunk_tokens=64, stride=48).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.chunk_idx)

    assert [r.n_chunk_tokens for r in by_doc[0]] == [64, 52]
    assert [r.chunk_start for r in by_doc[0]] == [1, 49]
    # overlap: chunk 1 re-covers tokens 49..64 of chunk 0
    assert by_doc[0][1].chunk_text.split(" ")[0] == "t48"
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "one two three"
    assert [r.n_chunk_tokens for r in by_doc[2]] == [64]
    assert [r.n_chunk_tokens for r in by_doc[3]] == [64, 17]
    # reconstruction: stripping the overlap from every later chunk and
    # concatenating must reproduce the original token stream exactly
    for i, text in rows:
        toks = []
        for r in by_doc[i]:
            parts = r.chunk_text.split(" ")
            toks.extend(parts if r.chunk_idx == 0 else parts[64 - 48:])
        assert " ".join(toks) == text


def test_pairwise_jaccard_differential_random_docs(spark):
    # the shingle-join jaccard underpins 5 oracle queries — guard it with
    # a randomized differential against plain Python set math (one job)
    import random

    rng = random.Random(23)
    vocab = ["ab", "cd", "ef", "gh", "ij", "kl"]
    rows = [
        (i, "".join(rng.choice(vocab) for _ in range(rng.randint(2, 12))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumns(
        {"lang": F.lit("en"), "source": F.lit("s"), "n_chars": F.length("text")}
    )
    sh = D.char_shingles(docs, n=4)
    got = {
        (r.d1, r.d2): r.jaccard
        for r in D.pairwise_jaccard(sh, min_jaccard=0.3).collect()
    }

    def shingles(t):
        return {t[i:i + 4] for i in range(len(t) - 3)} if len(t) >= 4 else set()

    want = {}
    for i, ti in rows:
        for j, tj in rows:
            if i < j:
                a, b = shingles(ti), shingles(tj)
                if a and b:
                    jac = len(a & b) / len(a | b)
                    if jac >= 0.3:
                        want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


def test_asof_join_differential_pandas(spark):
    import pandas as pd
    from hbase_packet_inspector_spark.operators.asof import asof_join
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    lrows = [("k%d" % (i % 3), base + dt.timedelta(seconds=17 * i), i)
             for i in range(50)]
    rrows = [("k%d" % (i % 3), base + dt.timedelta(seconds=11 * i), 100 + i)
             for i in range(70)]
    left = spark.createDataFrame(lrows, "k string, ts timestamp, lv long")
    right = spark.createDataFrame(rrows, "k string, ts timestamp, rv long")
    out = asof_join(left, right, on="ts", by=["k"], value_cols=["rv"]).collect()
    got = {(r.k, r.lv): r.rv_right for r in out}

    lp = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rv"]).sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    want = {
        (r.k, r.lv): (None if pd.isna(r.rv) else int(r.rv))
        for r in m.itertuples()
    }
    assert got == want and any(v is not None for v in want.values())


def test_fixpoint_raises_when_rounds_exhausted(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(6)], "d1 long, d2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters_fixpoint(pairs, max_rounds=2)


def test_pq_cell_pruning_requires_both_sides(spark):
    from hbase_packet_inspector_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    cb = S.pq_codebook(emb, m=1, sub_dim=4, n_codes=4)
    codes = S.pq_codes(emb, cb, m=1, sub_dim=4)
    qs = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    cells = codes.select("vec_id", F.lit(0).alias("cell")).distinct()
    with pytest.raises(ValueError, match="BOTH"):
        S.pq_adc_topk(codes, cb, qs, m=1, sub_dim=4, base_cells=cells)


def test_chunk_text_randomized_reconstruction(spark):
    # randomized guard over parameter combinations: every doc's token
    # stream must be exactly reconstructable from its chunks
    import random

    rng = random.Random(31)
    for chunk_tokens, stride in [(8, 8), (8, 5), (16, 12), (5, 1)]:
        from hbase_packet_inspector_spark.operators.text import chunk_text

        rows = [
            (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(1, 40))))
            for i in range(60)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_text(docs, chunk_tokens=chunk_tokens, stride=stride).collect()
        by_doc: dict = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        overlap = chunk_tokens - stride
        for i, text in rows:
            rs = sorted(by_doc[i], key=lambda r: r.chunk_idx)
            toks = []
            for r in rs:
                parts = r.chunk_text.split(" ")
                toks.extend(parts if r.chunk_idx == 0 else parts[overlap:])
            assert " ".join(toks) == text, (chunk_tokens, stride, i)
            # starts advance by exactly stride; sizes are full except the tail
            assert [r.chunk_start for r in rs] == [
                k * stride + 1 for k in range(len(rs))
            ]
            assert all(r.n_chunk_tokens == chunk_tokens for r in rs[:-1])


def test_winnowing_guarantee_and_density(spark):
    from hbase_packet_inspector_spark.operators.text import winnow_fingerprints

    k, w = 5, 4
    shared = "thequickbrownfoxjumps"  # len 21 >= w + k - 1 = 8
    rows = [
        (0, "aaa" + shared + "zzz"),
        (1, "mmmm" + shared + "qq"),
        (2, "completely unrelated content here"),
        (3, "abc"),   # shorter than k -> no grams, no rows
        (4, "abcde"), # exactly one gram -> one fingerprint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(docs, k=k, window=w).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # the winnowing guarantee: docs sharing a substring of length >= w+k-1
    # share at least one fingerprint VALUE
    assert by_doc[0] & by_doc[1]
    assert not (by_doc[2] & by_doc[0])
    assert 3 not in by_doc
    assert len(by_doc[4]) == 1
    # density: fingerprints ≪ grams (sampling, not the full gram set)
    n_grams0 = len(rows[0][1]) - k + 1
    assert len(by_doc[0]) < n_grams0
    # positions are valid gram starts
    for r in out:
        assert 1 <= r.pos <= len(rows[r.doc_id][1]) - k + 1


def test_keep_best_picks_highest_quality_per_cluster(spark):
    scored = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 30), (3, 5), (9, 7)],
        "doc_id long, quality int",
    )
    clusters = spark.createDataFrame(
        # docs 0,1,2 one cluster; 3 its own via the frame; 9 absent
        [(0, 0), (1, 0), (2, 0), (3, 3)],
        "doc_id long, cluster long",
    )
    out = {r["doc_id"]: r for r in D.keep_best(scored, clusters).collect()}
    # quality tie 1-vs-2 at 30 -> lowest doc_id wins
    assert out[1]["keep"] and not out[2]["keep"] and not out[0]["keep"]
    # cluster-of-one and unclustered singleton both survive
    assert out[3]["keep"] and out[9]["keep"] and out[9]["cluster"] == 9
    assert sum(r["keep"] for r in out.values()) == 3


def test_keep_best_all_null_quality_cluster_not_dropped(spark):
    # a cluster whose members ALL have NULL quality must still appear in
    # the output (no-silent-drop contract): min doc_id survives
    scored = spark.createDataFrame(
        [(0, None), (1, None), (2, 4), (3, None)],
        "doc_id long, quality int",
    )
    clusters = spark.createDataFrame(
        # 0,1 all-NULL cluster; 2,3 mixed cluster
        [(0, 0), (1, 0), (2, 2), (3, 2)],
        "doc_id long, cluster long",
    )
    out = {r["doc_id"]: r for r in D.keep_best(scored, clusters).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["keep"] and not out[1]["keep"]
    # mixed cluster: non-NULL quality wins; NULL member kept=false, present
    assert out[2]["keep"] and not out[3]["keep"]


def test_cdc_chunks_partition_and_resync(spark):
    import hashlib

    base = "the quick brown fox jumps over the lazy dog " * 12
    edited = "XY" + base  # prefix insertion
    docs = spark.createDataFrame(
        [(0, base), (1, edited), (2, "tiny")], "doc_id long, text string"
    )
    out = X.cdc_chunks(docs).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        text = {0: base, 1: edited, 2: "tiny"}[d]
        # chunks tile the document exactly: starts at 1, contiguous, full
        assert rows[0].chunk_start == 1
        for a, b in zip(rows, rows[1:]):
            assert a.chunk_start + a.chunk_len == b.chunk_start
        assert sum(r.chunk_len for r in rows) == len(text)
        # chunk_md5 is the md5 of the chunk bytes
        first = rows[0]
        want = hashlib.md5(
            text[first.chunk_start - 1:first.chunk_start - 1 + first.chunk_len]
            .encode()
        ).hexdigest()
        assert first.chunk_md5 == want
    # a doc shorter than the window is one whole-doc chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_len == 4
    # CONTENT-DEFINED resync: after a prefix edit, all but the first
    # chunk(s) re-align — the edited doc shares most chunk hashes
    h0 = {r.chunk_md5 for r in by_doc[0]}
    h1 = {r.chunk_md5 for r in by_doc[1]}
    assert len(h0 & h1) >= len(h0) - 2
    assert len(h0) >= 3  # the repeated text actually produced boundaries


def test_bm25_matches_reference_formula(spark):
    import math

    corpus = {
        0: "scan scan filter table row",
        1: "merge merge merge scan",
        2: "table row key value batch",
        3: "filter",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    terms = ("scan", "filter", "merge")
    out = {r["doc_id"]: r for r in X.bm25_topk(docs, terms, k=4).collect()}

    # independent python BM25
    toks = {d: t.split(" ") for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(w) for w in toks.values()) / n
    k1, b = 1.2, 0.75

    def bm25(d):
        s = 0.0
        for t in terms:
            tf = toks[d].count(t)
            df = sum(1 for w in toks.values() if t in w)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl)
            )
        return round(s, 6)

    for d in corpus:
        assert out[d]["bm25"] == pytest.approx(bm25(d), abs=2e-6)
    # ranking: doc 1 (3x merge, rare term) must beat doc 2 (no query terms)
    assert out[1]["bm25"] > out[2]["bm25"] == 0.0


def test_unigram_surprise_orders_rare_above_common(spark):
    import math

    docs = spark.createDataFrame(
        [
            (0, "a a a a"),          # the most common token only -> low
            (1, "a a a rare"),       # one rare token -> higher
            (2, "xx yy zz qq"),      # all singletons -> highest
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in X.unigram_surprise(docs).collect()}
    assert out[0]["mean_surprise"] < out[1]["mean_surprise"] < out[2]["mean_surprise"]
    # exact value for doc 0: every token has p = 7/12
    want = round(-math.log(7 / 12.0), 6)
    assert out[0]["mean_surprise"] == pytest.approx(want, abs=2e-6)
    assert out[0]["n_tokens"] == 4


def test_cdc_dedup_flags_duplicated_passages(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again " * 6
    docs = spark.createDataFrame(
        [
            (0, shared + "unique tail zero zebra"),
            (1, shared + "other ending entirely different words"),
            (2, "completely unrelated text with no repeats at all here"),
        ],
        "doc_id long, text string",
    )
    from hbase_packet_inspector_spark.plans.dataprep_queries import (  # noqa
        cdc_dedup as _q,
    )
    ch = X.cdc_chunks(docs)
    g = ch.groupBy("chunk_md5").agg(F.count("*").alias("cnt"))
    dupc = F.when(F.col("cnt") > 1, F.col("chunk_len")).otherwise(F.lit(0))
    per = {
        r["doc_id"]: r
        for r in ch.join(g, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.sum(dupc).alias("dup_chars"),
            F.sum("chunk_len").alias("chars"),
        )
        .collect()
    }
    # docs 0 and 1 share the long prefix -> most of their bytes duplicated
    assert per[0]["dup_chars"] > per[0]["chars"] * 0.5
    assert per[1]["dup_chars"] > per[1]["chars"] * 0.5
    assert per[2]["dup_chars"] == 0


def test_cdc_chunks_matches_python_reference(spark):
    """Differential: the Spark CDC cut rule equals an independent Python
    implementation on seeded random strings (incl. boundary lengths
    around the window size and texts with no boundaries at all)."""
    import hashlib
    import random

    def ref_chunks(text, window=8, divisor=64):
        n = len(text)
        if n < 1:
            return []
        starts = {1}
        if n >= window:
            for i in range(1, n - window + 2):
                h = int(
                    hashlib.md5(text[i - 1:i - 1 + window].encode())
                    .hexdigest()[:8], 16,
                )
                if h % divisor == 0 and i + window <= n:
                    starts.add(i + window)
        ss = sorted(starts)
        out = []
        for idx, s in enumerate(ss):
            e = ss[idx + 1] if idx + 1 < len(ss) else n + 1
            chunk = text[s - 1:e - 1]
            out.append((idx, s, e - s,
                        hashlib.md5(chunk.encode()).hexdigest()))
        return out

    rng = random.Random(77)
    alpha = "abcdefgh XYZ.,!01"
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.choice(
            [1, 3, 7, 8, 9, 15, 40, 120, 200])))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict = {}
    for r in X.cdc_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_start, r.chunk_len, r.chunk_md5)
        )
    for d, text in enumerate(texts):
        assert sorted(got.get(d, [])) == ref_chunks(text), f"doc {d}: {text!r}"


def test_winnow_positions_false_equals_distinct_of_positions(spark):
    """The in-row (zero-shuffle) positions=False path emits exactly the
    distinct (doc_id, fp) pairs of the positions=True output."""
    import random

    rng = random.Random(13)
    alpha = "abcde fg"
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.choice([4, 5, 6, 30, 90])))
        for _ in range(25)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    from hbase_packet_inspector_spark.operators.text import winnow_fingerprints
    with_pos = {
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(docs, k=5, window=4).collect()
    }
    flat = [
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(
            docs, k=5, window=4, positions=False
        ).collect()
    ]
    assert len(flat) == len(set(flat))  # in-row distinct IS globally distinct
    assert set(flat) == with_pos


def test_keep_best_works_with_string_ids(spark):
    scored = spark.createDataFrame(
        [("a", 10), ("b", 30), ("c", 30), ("z", 7)],
        "doc_id string, quality int",
    )
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "doc_id string, cluster string"
    )
    out = {r["doc_id"]: r for r in D.keep_best(scored, clusters).collect()}
    # quality tie b-vs-c at 30 -> lexicographically lowest id wins
    assert out["b"]["keep"] and not out["c"]["keep"] and not out["a"]["keep"]
    assert out["z"]["keep"] and out["z"]["cluster"] == "z"


def test_semdedup_keeps_vectors_absent_from_cells(spark):
    from hbase_packet_inspector_spark.operators.similarity import semdedup_keep

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.99, 0.05]), (7, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cells = spark.createDataFrame(  # vec 7 never assigned
        [(0, 0), (1, 0)], "vec_id long, cell long"
    )
    out = {r["vec_id"]: r for r in
           semdedup_keep(emb, cells, min_cos=0.95).collect()}
    assert len(out) == 3  # nothing silently vanishes
    assert out[0]["keep"] and not out[1]["keep"]
    assert out[7]["keep"] and out[7]["cell"] is None
