"""Unit tests for the training-data operators on hand-built corpora with
known duplicate structure."""

import pytest
from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators import dedup as D
from hbase_packet_inspector_spark.operators import similarity as S
from hbase_packet_inspector_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 43),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "en", "s", 43),  # near dup of 0
        (3, "completely different text with nothing shared here", "en", "s", 50),
        (4, "short one", "en", "s", 9),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup(docs):
    out = {r.doc_id: r for r in D.exact_dup_groups(docs).collect()}
    assert out[0].is_dup and out[1].is_dup
    assert out[0].keep_doc_id == 0 and out[1].keep_doc_id == 0
    assert not out[2].is_dup and not out[3].is_dup


def test_pairwise_jaccard_finds_near_dup(docs):
    sh = D.char_shingles(docs)
    pairs = {(r.d1, r.d2): r.jaccard for r in D.pairwise_jaccard(sh, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert 0.7 < pairs[(0, 2)] < 1.0  # near dup (one word differs)
    assert (0, 3) not in pairs


def test_minhash_lsh_recalls_dups(docs):
    out = {(r.d1, r.d2): r.jaccard for r in
           D.minhash_lsh_dedup(docs, min_jaccard=0.5).collect()}
    # identical docs always collide in every band; near-dup at j~0.8 is
    # recalled with 4x4 bands with overwhelming probability
    assert (0, 1) in out and out[(0, 1)] == 1.0
    assert (0, 2) in out
    assert (0, 3) not in out and (1, 3) not in out


def test_simhash_properties(docs):
    out = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    assert out[0] == out[1]  # identical text -> identical signature
    assert len(out[0]) == 16 and set(out[0]) <= {"0", "1"}
    ham02 = sum(a != b for a, b in zip(out[0], out[2]))
    ham03 = sum(a != b for a, b in zip(out[0], out[3]))
    assert ham02 <= ham03  # near-dup at least as close as unrelated


def test_quality_and_tokens(docs):
    q = {r.doc_id: r for r in X.quality_features(docs).collect()}
    assert q[0].n_words == 9
    assert abs(q[0].stop_ratio - 2 / 9) < 1e-12
    t = {r.doc_id: r for r in X.token_counts(docs).collect()}
    assert t[0].ws_tokens == 9 and t[0].distinct_tokens == 8  # 'the' twice
    assert t[4].ws_tokens == 2


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "ab"), (1, "ba"), (2, "ab")], "doc_id long, text string"
    )
    out = {r.doc_id: r.rhash for r in X.rolling_hash(df).collect()}
    assert out[0] == out[2] and out[0] != out[1]


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 0),
        (2, [0.0, 1.0], 1),
        (3, [-1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = [r.neighbor_id for r in
           S.cosine_topk(emb, qs, k=3).orderBy("rnk").collect()]
    assert out == [1, 2, 3]  # descending cosine: ~0.995, 0, -1


def test_cosine_topk_spreads_base_before_scoring(spark):
    # r12 guide-§2.5 fix: a byte-small embeddings scan plans ONE input
    # partition, so without the explicit hash repartition the whole
    # n_base x n_query dot-product stage runs on a single core. Pin the
    # REPARTITION_BY_NUM exchange on the corpus side of the broadcast
    # scoring join (results themselves are partitioning-insensitive:
    # per-row rounds + rank windows — covered by the oracle parity).
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    plan = (
        S.cosine_topk(emb, qs, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "REPARTITION_BY_NUM" in plan


def test_hard_negatives_cross_label_only(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.05], 0),   # nearest overall but SAME label: excluded
        (2, [1.0, 0.2], 1),    # the hard negative: near-miss, other label
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    out = S.hard_negatives(emb, qs, k=2).orderBy("rnk").collect()
    assert [r.neighbor_id for r in out] == [2, 3]
    assert all(r.neighbor_label != r.q_label for r in out)
    assert out[0].cos > out[1].cos


def test_ivf_prunes_to_cell(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 1),  # closest overall but other cell
        (2, [0.5, 0.5], 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    out = [r.neighbor_id for r in
           S.cosine_topk(emb, qs, k=3, same_cell_col="label").collect()]
    assert out == [2]  # vec 1 pruned away despite higher cosine


def test_repetition_features(spark):
    rows = [(0, "a a a a", "en", "s", 7), (1, "w x y z", "en", "s", 7)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r for r in X.repetition_features(df).collect()}
    # "a a a a": 3 bigrams all "a a" -> 2/3 duplicated; top word = 4/4
    assert abs(out[0].dup_2gram_frac - 2 / 3) < 1e-12
    assert out[0].top_word_frac == 1.0
    assert out[1].dup_2gram_frac == 0.0 and out[1].top_word_frac == 0.25


def test_term_and_tfidf(docs):
    terms = X.term_stats(docs, top=3).collect()
    assert [t.rnk for t in terms] == [1, 2, 3]
    assert terms[0].word == "the" and terms[0].cnt == 6 and terms[0].df == 3
    tfidf = X.tfidf_top_terms(docs, k=2)
    # rare words outrank corpus-wide ones; 'the' (df=3 of 5) never tops a doc
    top1 = {r.doc_id: r.word for r in tfidf.collect() if r.rnk == 1}
    assert top1[3] != "the" and top1[4] != "the"


def test_containment_vs_jaccard(spark):
    # short doc fully inside a long one: containment 1.0, jaccard diluted
    rows = [(0, "p q r s t", "x", "s", 9),
            (1, "p q r s t u v w x y z a b c d e f g h i", "x", "s", 39)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sh = D.word_shingles(df, n=3)
    cont = D.pairwise_containment(sh, min_containment=0.9).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0
    assert not D.pairwise_jaccard(sh, min_jaccard=0.9).collect()


def test_stratified_sample_deterministic(docs, spark):
    from hbase_packet_inspector_spark.operators import sampling as SA

    rates = spark.createDataFrame([("s", 50)], "source string, rate_pct int")
    a = sorted(r.doc_id for r in SA.stratified_sample(docs, rates).collect())
    b = sorted(r.doc_id for r in SA.stratified_sample(docs, rates).collect())
    assert a == b  # same rows every run
    full = SA.train_test_split(docs).collect()
    assert {r.split for r in full} <= {"train", "test"}
    assert len(full) == 5  # split labels, never drops rows


def test_execute_mixture_rates_and_python_mirror(spark):
    import hashlib

    from hbase_packet_inspector_spark.operators import sampling as SA

    # 'big' wants more than one epoch at this budget -> fully kept;
    # 'small' gets a fractional rate the md5 rule must reproduce.
    rows = [(i, "big", "w " * 4) for i in range(20)]
    rows += [(100 + i, "small", "w " * 99) for i in range(30)]
    docs = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id long, source string, text string",
    )
    weights = SA.source_mixture_weights(docs, temperature=2.0,
                                        token_budget=1000)
    out = {r.source: r
           for r in SA.execute_mixture(docs, weights,
                                       token_budget=1000).collect()}
    assert out["big"].rate_ppm == 1_000_000  # >1 epoch caps at keep-all
    assert out["big"].kept_docs == 20
    assert 0 < out["small"].rate_ppm < 1_000_000

    def ppm_bucket(doc_id):
        h = hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()
        return int(h[:6], 16) % 1_000_000

    exp = [i for i in range(100, 130)
           if ppm_bucket(i) < out["small"].rate_ppm]
    assert out["small"].kept_docs == len(exp)
    assert out["small"].kept_tokens == 99 * len(exp)


def test_leakage_safe_split_quarantines_only_cross_split_dups(spark):
    import hashlib

    from hbase_packet_inspector_spark.operators import sampling as SA

    def split_of(i):
        h = hashlib.md5(f"split:{i}".encode()).hexdigest()
        return "test" if int(h[:6], 16) % 100 < 10 else "train"

    ids = list(range(200))
    tests = [i for i in ids if split_of(i) == "test"]
    trains = [i for i in ids if split_of(i) == "train"]
    assert len(tests) >= 3 and len(trains) >= 2
    # plant: (test, train) near-dup -> quarantine the TEST side only;
    # (test, test) near-dup -> NOT leakage, both stay in test
    dup_a = "the quick brown fox jumps over the lazy dog again and again"
    dup_b = "pack my box with five dozen liquor jugs every single day now"
    docs = spark.createDataFrame(
        [(tests[0], dup_a), (trains[0], dup_a),
         (tests[1], dup_b), (tests[2], dup_b)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(min(tests[0], trains[0]), max(tests[0], trains[0])),
         (tests[1], tests[2]) if tests[1] < tests[2]
         else (tests[2], tests[1])],
        "d1 long, d2 long",
    )
    out = {r.doc_id: r for r in
           SA.leakage_safe_split(docs, pairs).collect()}
    assert out[tests[0]].split_safe == "quarantine"
    assert out[trains[0]].split_safe == "train"  # train side untouched
    assert out[tests[1]].split_safe == "test"    # test<->test is fine
    assert out[tests[2]].split_safe == "test"
    assert all(r.split_raw in ("test", "train") for r in out.values())


def test_curriculum_order_bins_monotone_and_shard_local(spark):
    from hbase_packet_inspector_spark.operators import sampling as SA

    rows = [(i, float(10 + i)) for i in range(40)]  # scores 10..49
    docs = spark.createDataFrame(rows, "doc_id long, s double")
    out = SA.curriculum_order(docs, score_col="s", bins=4, shards=2).collect()
    assert len(out) == 40
    # equal-width bins over [10, 49]: bin is monotone in score and the
    # max score lands in the top bin (the least() clamp)
    by_score = sorted(out, key=lambda r: r.score)
    bins_seq = [r.bin for r in by_score]
    assert bins_seq == sorted(bins_seq)
    assert by_score[-1].bin == 3 and by_score[0].bin == 0
    # pos is dense 1..n within each (bin, shard): shard-local, no gaps
    from collections import defaultdict
    groups = defaultdict(list)
    for r in out:
        groups[(r.bin, r.shard)].append(r.pos)
    for ps in groups.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # constant score: everything degenerates to bin 0, no div-by-zero
    const = spark.createDataFrame([(i, 5.0) for i in range(4)],
                                  "doc_id long, s double")
    cbins = {r.bin for r in
             SA.curriculum_order(const, score_col="s").collect()}
    assert cbins == {0}


def test_ann_recall_bounds(spark):
    import math
    rows = [(i, [math.cos(i * 0.7), math.sin(i * 0.7), 0.5], i % 2)
            for i in range(12)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    qs = emb.where(F.col("vec_id") % 6 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    out = {r.q_id: r.recall for r in S.ann_recall(emb, qs, k=3, cell_col="label").collect()}
    assert set(out) == {0, 6} and all(0.0 <= v <= 1.0 for v in out.values())


def test_repetition_short_docs_no_crash(spark):
    # sequence(1, 0) is DESCENDING [1,0]: without the length guard the
    # n-gram transform calls slice(ws, 0, n) and throws at runtime
    rows = [(0, "one", "en", "s", 3), (1, "two words", "en", "s", 9)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r for r in X.repetition_features(df).collect()}
    assert out[0].dup_2gram_frac is None and out[0].top_word_frac == 1.0
    assert out[1].dup_2gram_frac == 0.0 and out[1].dup_3gram_frac is None


def test_repetition_differential_random_docs(spark):
    # differential test vs a naive Python implementation on one batch of
    # seeded random docs (single Spark job — no per-example round trips)
    import random
    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "dd", "e", "ff", "g"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))),
         "en", "s", 0)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r for r in X.repetition_features(df).collect()}

    def naive(text):
        ws = text.split(" ")
        def frac(n):
            g = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            return (len(g) - len(set(g))) / len(g) if g else None
        top = max(ws.count(w) for w in set(ws)) / len(ws)
        return len(ws), frac(2), frac(3), top

    for i, text, *_ in rows:
        n, f2, f3, top = naive(text)
        r = out[i]
        assert r.n_words == n
        assert r.dup_2gram_frac == f2 and r.dup_3gram_frac == f3
        assert r.top_word_frac == top, (text, r.top_word_frac, top)


def test_hash_bucket_differential(spark):
    # hash_bucket must equal the Python md5 computation exactly
    import hashlib
    from hbase_packet_inspector_spark.operators.sampling import hash_bucket

    df = spark.range(500).select(F.col("id").alias("k"))
    out = {r.k: r.b for r in df.select(
        "k", hash_bucket(F.col("k"), salt="sample:").alias("b")).collect()}
    for k in range(500):
        expect = int(hashlib.md5(f"sample:{k}".encode()).hexdigest()[:6], 16) % 100
        assert out[k] == expect
    assert 0 <= min(out.values()) and max(out.values()) <= 99


def test_semdedup_drops_near_identical_within_cell(spark):
    from hbase_packet_inspector_spark.operators.similarity import semdedup_keep

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),   # near-dup of 0, same cell
            (2, [0.0, 1.0, 0.0]),      # different cell
            (3, [0.0, 0.98, 0.1]),     # near-dup of 2, same cell
            (4, [0.7, 0.7, 0.0]),      # mid-angle: in a cell but below thr
        ],
        "vec_id long, embedding array<float>",
    )
    cells = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 0)], "vec_id long, cell long"
    )
    out = {r["vec_id"]: r for r in
           semdedup_keep(emb, cells, min_cos=0.95).collect()}
    # lower-id representative survives, near-dups drop
    assert out[0]["keep"] and not out[1]["keep"]
    assert out[2]["keep"] and not out[3]["keep"]
    # below-threshold cell-mate keeps (cos(0,4) ~ 0.707 < 0.95)
    assert out[4]["keep"]
    # cross-cell similarity NEVER drops: same vectors, separate cells
    cells_apart = spark.createDataFrame(
        [(0, 0), (1, 9), (2, 1), (3, 8), (4, 0)], "vec_id long, cell long"
    )
    out2 = {r["vec_id"]: r for r in
            semdedup_keep(emb, cells_apart, min_cos=0.95).collect()}
    assert all(out2[i]["keep"] for i in range(5))


def test_pca_top_component_matches_numpy_schedule(spark):
    """Differential: the declarative covariance + 3-round power iteration
    equals a NumPy replica of the identical schedule (same v0, same
    per-round half-away rounding), and the direction aligns with the true
    top eigenvector on an anisotropic cloud."""
    import numpy as np
    from hbase_packet_inspector_spark.operators.similarity import (
        _round6_half_away, pca_top_component,
    )

    rng = np.random.RandomState(5)
    # strongly anisotropic: dominant variance along a known direction
    d = 8
    axis = np.zeros(d); axis[2] = 1.0
    X = rng.randn(200, d) * 0.1 + np.outer(rng.randn(200), axis) * 3.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    out = pca_top_component(emb, iterations=3).collect()
    got = np.zeros(d)
    for r in out:
        got[r["i"]] = r["component"]
    lam = out[0]["eigenvalue"]

    # numpy replica of the same schedule (float32 ingestion like the table)
    Xf = X.astype(np.float32).astype(np.float64)
    C = np.cov(Xf, rowvar=False, bias=True)
    v = np.full(d, _round6_half_away(1.0 / np.sqrt(d)))
    for _ in range(3):
        w = C @ v
        nrm = float(np.sqrt((w * w).sum()))
        v = np.array([_round6_half_away(float(x) / nrm) for x in w])
        want_lam = _round6_half_away(nrm)
    assert np.allclose(got, v, atol=2e-6)
    assert abs(lam - want_lam) <= 2e-6
    # the dominant axis is found (sign-agnostic)
    assert abs(got[2]) > 0.99


def test_ann_index_roundtrip_and_bucketed_search(spark, tmp_path):
    """save_ann_index -> load_ann_index -> search: results equal the
    in-memory cell-pruned search, and the persisted-index join plans with
    NO Exchange on the corpus side (bucket layout = the IVF inverted
    lists; only the query batch shuffles)."""
    import numpy as np
    from hbase_packet_inspector_spark.operators.similarity import (
        assign_cells, cosine_topk, load_ann_index, save_ann_index,
        search_ann_index,
    )
    from pyspark.sql import functions as F

    rng = np.random.RandomState(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(8)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    save_ann_index(emb, str(tmp_path / "idx"), table="t_ann",
                   n_cells=5, iterations=1, buckets=4)
    vectors, centroids = load_ann_index(spark, "t_ann")
    assert vectors.count() == 200 and centroids.count() == 5

    queries = emb.where(F.col("vec_id") % 40 == 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = search_ann_index(vectors, centroids, queries, k=3)
        plan = got._jdf.queryExecution().executedPlan().toString()
        rows = got.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # corpus side pre-partitioned by the bucket layout: the cell equi-join
    # must contribute exactly ONE Exchange hashpartitioning(cell...) — the
    # query batch's. A second one would mean the bucketed scan is being
    # reshuffled and the index layout is wasted.
    assert "Bucketed: true" in plan, plan
    import re as _re

    cell_exchanges = _re.findall(r"Exchange hashpartitioning\(cell", plan)
    assert len(cell_exchanges) == 1, plan

    # results match the in-memory pruned search on the same assignment
    cells = vectors.select("vec_id", "cell")
    base = emb.join(cells, "vec_id")
    qs = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    ).join(
        assign_cells(queries, centroids)
        .select(F.col("vec_id").alias("q_id"), F.col("cell").alias("q_cell")),
        "q_id",
    )
    want = cosine_topk(base, qs, k=3, same_cell_col="cell").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))


def test_pca_outer_covariance_matches_inrow(spark):
    """The high-dim mapInPandas outer-product covariance path produces the
    same components as the in-row explode path, across multiple partitions
    (partial X^T X accumulation + groupBy finalize must commute with the
    per-row product mean)."""
    import numpy as np
    from hbase_packet_inspector_spark.operators.similarity import (
        pca_top_component,
    )

    rng = np.random.RandomState(11)
    d = 6
    X = rng.randn(150, d) * np.array([3.0, 0.2, 0.2, 1.5, 0.2, 0.2])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    ).repartition(7)
    a = {r["i"]: r for r in
         pca_top_component(emb, iterations=2, covariance="inrow").collect()}
    b = {r["i"]: r for r in
         pca_top_component(emb, iterations=2, covariance="outer").collect()}
    assert set(a) == set(b) == set(range(d))
    for i in range(d):
        assert abs(a[i]["component"] - b[i]["component"]) <= 2e-6
    assert abs(a[0]["eigenvalue"] - b[0]["eigenvalue"]) <= 2e-6
    # auto threshold routes small dims to inrow, wide dims to outer
    c = pca_top_component(
        emb, iterations=1, covariance="auto", wide_dim_threshold=4
    ).collect()
    assert len(c) == d


def test_srp_topk_bucket_pruning(spark):
    # 8-dim vectors, bits=8, n_bands=2 (4 bits/band). Query q shares band
    # 0 with v1 (same signs on dims 1-4) and NO band with v3 (all signs
    # flipped) -> v3 is never a candidate even though |cos| ranks exist;
    # v2 shares band 1.
    rows = [
        (0, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),      # query
        (1, [0.9, 0.8, 1.0, 0.7, -1.0, -1.0, -1.0, -1.0]),  # band 0 only
        (2, [-1.0, -1.0, -1.0, -1.0, 0.5, 0.9, 1.0, 0.8]),  # band 1 only
        (3, [-1.0] * 8),                                     # no band
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = S.srp_topk(emb, qs, k=5, bits=8, n_bands=2).collect()
    got = {r.neighbor_id for r in out}
    assert got == {1, 2}  # 3 pruned by LSH despite being a valid vector
    # exact cosine on survivors matches the brute-force scorer
    brute = {r.neighbor_id: r.cos
             for r in S.cosine_topk(emb, qs, k=5).collect()}
    for r in out:
        assert r.cos == brute[r.neighbor_id]


def test_srp_topk_identical_vector_found(spark):
    # an exact duplicate shares EVERY band -> always a candidate, rank 1
    rows = [(i, [float(i % 3 - 1) or 0.5] * 16) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = S.srp_topk(emb, qs, k=2, bits=16, n_bands=4).collect()
    top = min(out, key=lambda r: (r.rnk, r.neighbor_id))
    assert top.cos == 1.0 and top.neighbor_id == 3  # same direction as 0


def test_mine_triplets_hardest_and_nulls(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.05], 0),   # hardest positive for 0
        (2, [0.7, 0.3], 0),    # easier positive (not collinear)
        (3, [1.0, 0.2], 1),    # hardest negative for 0
        (4, [0.0, 1.0], 1),
        (5, [0.0, -1.0], 2),   # label 2 singleton: no positive exists
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    qs = emb.where(F.col("vec_id").isin(0, 5)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    out = {r.q_id: r for r in S.mine_triplets(emb, qs).collect()}
    t0 = out[0]
    assert t0.pos_id == 1 and t0.neg_id == 3
    assert t0.margin == round(t0.pos_cos - t0.neg_cos, 6)
    assert t0.margin > 0
    # singleton-label anchor: row kept, pos side null, negative present
    t5 = out[5]
    assert t5.pos_id is None and t5.pos_cos is None
    assert t5.neg_id is not None and t5.margin is None


def test_ann_ndcg_hand_rolled(spark):
    import math

    # SRP sign-bits read the first `bits` components -> dim >= bits
    def v(a, b):
        return [a, b, a - b, a + b, a * 0.5, b - 0.25, a - 0.75, b + 0.1]

    rows = [
        (0, v(1.0, 0.0), 0),     # anchor
        (1, v(1.0, 0.02), 0),
        (2, v(1.0, 0.3), 1),
        (3, v(0.5, 0.5), 1),
        (4, v(-1.0, 0.1), 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    exact = S.cosine_topk(emb, qs, k=3).select("q_id", "neighbor_id")
    system = S.srp_topk(emb, qs, k=3, bits=8, n_bands=2).select(
        "q_id", "neighbor_id", "rnk"
    )
    ex = {r.neighbor_id for r in exact.collect()}
    sy = [(r.neighbor_id, r.rnk) for r in system.collect()]
    want_dcg = sum(
        (1.0 if nid in ex else 0.0) / math.log2(rnk + 1) for nid, rnk in sy
    )
    idcg = sum(1.0 / math.log2(p + 1) for p in range(1, 4))
    rel = system.join(
        exact.withColumn("_rel", F.lit(1.0)), ["q_id", "neighbor_id"],
        "left",
    )
    got = rel.groupBy("q_id").agg(
        F.round(F.sum(
            F.coalesce(F.col("_rel"), F.lit(0.0))
            / F.log2(F.col("rnk").cast("double") + 1)
        ), 6).alias("dcg")
    ).collect()[0]
    assert got.dcg == round(want_dcg, 6)
    assert 0 <= got.dcg / idcg <= 1


def test_binned_twin_invariants(spark):
    """The histogram-cutpoint scale twins (r11) are oracle-pinned for
    cross-engine EQUALITY; these invariants guard against both engines
    being consistently wrong: full coverage (every row lands in exactly
    one bucket), bucket ids in range, cumulative gain reaching 1, and
    value-monotonic bucket boundaries."""
    from hbase_packet_inspector_spark.plans.tpch_queries import (
        acctbal_deciles_binned,
        rfm_segments_binned,
    )
    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        score_lift_binned,
    )
    from hbase_packet_inspector_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"

    lift = sorted(score_lift_binned(spark, sf).collect(),
                  key=lambda r: r.decile)
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n_docs for r in lift) == n_docs       # full coverage
    assert all(1 <= r.decile <= 10 for r in lift)
    assert abs(lift[-1].cum_gain - 1.0) < 1e-12        # all positives seen
    # (no assertion on lift ORDER: whether the top decile is richer in
    # positives is a property of the trained model, not of the binning,
    # and the 2-round logreg on 150 docs doesn't rank reliably)

    dec = sorted(acctbal_deciles_binned(spark, sf).collect(),
                 key=lambda r: r.decile)
    n_cust = load_table(spark, sf, "customer").count()
    assert sum(r.n_customers for r in dec) == n_cust
    for lo, hi in zip(dec, dec[1:]):                   # strict value order
        assert hi.min_bal > lo.max_bal

    rfm = rfm_segments_binned(spark, sf).collect()
    n_buyers = (load_table(spark, sf, "orders")
                .select("o_custkey").distinct().count())
    assert sum(r.n_customers for r in rfm) == n_buyers
    assert all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5
               and 1 <= r.m_score <= 5 for r in rfm)


def test_empty_table_scalar_guard(spark, tmp_path):
    """An empty source table yields an empty result with the declared
    schema — not a TypeError from None scalar arithmetic (the
    max(doc_id)+1 / max(o_orderdate)-interval collects). Mirrors the
    score_lift_binned guard so the binned/scalar family is consistent
    on this edge."""
    import pandas as pd

    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        vocab_growth_binned,
    )
    from hbase_packet_inspector_spark.plans.tpch_queries import (
        q22_idle_customers,
    )

    sf = str(tmp_path)
    pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype="string"),
        "lang": pd.Series([], dtype="string"),
        "source": pd.Series([], dtype="string"),
        "n_chars": pd.Series([], dtype="int64"),
    }).to_parquet(f"{sf}/documents.parquet")
    pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "o_orderstatus": pd.Series([], dtype="string"),
        "o_totalprice": pd.Series([], dtype="float64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_orderpriority": pd.Series([], dtype="string"),
    }).to_parquet(f"{sf}/orders.parquet")
    pd.DataFrame({
        "c_custkey": pd.Series([], dtype="int64"),
        "c_name": pd.Series([], dtype="string"),
        "c_nationkey": pd.Series([], dtype="int32"),
        "c_acctbal": pd.Series([], dtype="float64"),
        "c_mktsegment": pd.Series([], dtype="string"),
    }).to_parquet(f"{sf}/customer.parquet")
    pd.DataFrame({
        "n_nationkey": pd.Series([], dtype="int32"),
        "n_name": pd.Series([], dtype="string"),
        "n_regionkey": pd.Series([], dtype="int32"),
    }).to_parquet(f"{sf}/nation.parquet")

    vg = vocab_growth_binned(spark, sf)
    assert vg.columns == ["bucket", "cum_tokens", "cum_vocab",
                          "heaps_beta"]
    assert vg.count() == 0

    q22 = q22_idle_customers(spark, sf)
    assert q22.columns == ["n_name", "n_customers", "total_acctbal"]
    assert q22.count() == 0


def test_pareto_frontier_hand_checked(spark, tmp_path):
    """5-order hand case pinning the dominance rules against REALITY
    (parity alone can't catch a bug both engines share): strict-one-dim
    dominance, duplicate points both staying, and the binned prefilter
    never pruning a frontier row."""
    import datetime as dt

    import pandas as pd

    from hbase_packet_inspector_spark.plans.tpch_queries import (
        pareto_frontier,
    )

    def d(day):
        return dt.datetime(2024, 1, day)

    # (key, price, date): 1 cheap-old, 2 mid-recent, 3 dominated by 2
    # (same price, older), 4 expensive-recent, 5 duplicate of 4
    pd.DataFrame({
        "o_orderkey": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
        "o_custkey": pd.Series([1] * 5, dtype="int64"),
        "o_orderstatus": pd.Series(["F"] * 5, dtype="string"),
        "o_totalprice": pd.Series([10.0, 50.0, 50.0, 90.0, 90.0],
                                  dtype="float64"),
        "o_orderdate": pd.Series([d(1), d(10), d(5), d(20), d(20)],
                                 dtype="datetime64[us]"),
        "o_orderpriority": pd.Series(["1"] * 5, dtype="string"),
    }).to_parquet(f"{tmp_path}/orders.parquet")

    out = {r.o_orderkey: r for r in
           pareto_frontier(spark, str(tmp_path)).collect()}
    # 3 dominated by 2 (equal price, strictly older); everything else
    # is on the frontier — including BOTH duplicates 4 and 5
    assert set(out) == {1, 2, 4, 5}
    assert out[1].price == 10.0 and out[4].price == 90.0


def test_session_concurrency_hand_checked(spark, tmp_path):
    """Two users with overlapping sessions: user A 00:00-00:02, user B
    00:01-00:03 (same hour) -> peak 2 at minute 1; user A returns after
    a >30-min gap in hour 1 alone -> peak 1. Pins the minute-grid
    overlap count and the earliest-minute tie rule."""
    import datetime as dt

    import pandas as pd

    from hbase_packet_inspector_spark.plans.events_queries import (
        session_concurrency,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minute, user):
        return (i, t0 + dt.timedelta(minutes=minute), user, "view", 1.0,
                "{}")

    rows = [ev(1, 0, 1), ev(2, 2, 1),          # A session 1: min 0-2
            ev(3, 1, 2), ev(4, 3, 2),          # B session:   min 1-3
            ev(5, 62, 1)]                      # A session 2: min 62
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                "event_type", "value", "props"]).astype(
        {"event_id": "int64", "user_id": "int64", "value": "float64",
         "props": "string", "event_type": "string"}
    ).to_parquet(f"{tmp_path}/events.parquet")

    base_min = int(t0.timestamp()) // 60
    out = {r.epoch_hour: r for r in
           session_concurrency(spark, str(tmp_path)).collect()}
    assert len(out) == 2
    h0 = out[base_min // 60]
    # minutes 1 and 2 both have 2 concurrent sessions -> earliest wins
    assert h0.peak_concurrent == 2
    assert h0.peak_minute == base_min + 1
    h1 = out[base_min // 60 + 1]
    assert h1.peak_concurrent == 1 and h1.peak_minute == base_min + 62


def test_supplier_ship_intervals_hand_checked(spark, tmp_path):
    """3 shipments for one supplier: [d1,d3] and [d2,d5] overlap into
    one island (5 covered days), [d10,d11] starts a second (2 days).
    Pins island formation, touch/overlap merging, and exact day math."""
    import datetime as dt

    import pandas as pd

    from hbase_packet_inspector_spark.plans.tpch_queries import (
        supplier_ship_intervals,
    )

    def d(day):
        return dt.datetime(2024, 1, day)

    pd.DataFrame({
        "o_orderkey": pd.Series([101, 102, 103], dtype="int64"),
        "o_orderdate": pd.Series([d(1), d(2), d(10)],
                                 dtype="datetime64[us]"),
    }).to_parquet(f"{tmp_path}/orders.parquet")
    pd.DataFrame({
        "l_orderkey": pd.Series([101, 102, 103], dtype="int64"),
        "l_suppkey": pd.Series([7, 7, 7], dtype="int64"),
        "l_shipdate": pd.Series([d(3), d(5), d(11)],
                                dtype="datetime64[us]"),
    }).to_parquet(f"{tmp_path}/lineitem.parquet")

    rows = supplier_ship_intervals(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.l_suppkey == 7
    assert r.n_islands == 2
    assert r.covered_days == 5 + 2
    assert r.max_island_days == 5
    assert r.n_shipments == 3


def test_bootstrap_price_ci_invariants(spark):
    """Order-statistic CI sanity on real data: lo <= median <= hi per
    priority, the point estimate inside (or at worst near) the 95%
    band, one row per distinct priority."""
    from hbase_packet_inspector_spark.plans.tpch_queries import (
        bootstrap_price_ci,
    )

    sf = "/root/testdata/sf0.001"
    rows = bootstrap_price_ci(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.boot_lo <= r.boot_median <= r.boot_hi
        # the replicate spread straddles the full-sample mean
        assert r.boot_lo <= r.mean_price <= r.boot_hi


def test_weighted_sample_aes_is_deterministic_topk(spark):
    """A-ES selection is a pure function of the corpus: two runs agree
    exactly, scores are <= 0 (ln u <= 0, w > 0), doc_ids unique, and
    every selected score beats every rejected one (true top-k cut)."""
    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        weighted_sample_tokens,
    )

    sf = "/root/testdata/sf0.001"
    a = weighted_sample_tokens(spark, sf).collect()
    b = weighted_sample_tokens(spark, sf).collect()
    assert len(a) == 200
    assert {r.doc_id for r in a} == {r.doc_id for r in b}
    assert len({r.doc_id for r in a}) == 200
    assert all(r.aes_score <= 0 for r in a)
    assert all(r.weight > 0 for r in a)


def test_dp_noisy_counts_matches_closed_form(spark, tmp_path):
    """Recomputes the operator's deterministic Laplace noise in pure
    Python (md5 -> uniform -> inverse CDF) and checks the released
    values EXACTLY, plus suppression of the sub-threshold group."""
    import hashlib
    import math

    import pandas as pd

    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        dp_noisy_counts_q,
    )

    # source A: 40 docs of length 100 (bucket 0); source B: 2 docs
    # (released only if its noise clears 10 - 2 = +8, P ~ 3e-4)
    rows = [("srcA", "x" * 100)] * 40 + [("srcB", "y" * 100)] * 2
    pd.DataFrame({
        "doc_id": pd.Series(range(len(rows)), dtype="int64"),
        "source": pd.Series([r[0] for r in rows], dtype="string"),
        "text": pd.Series([r[1] for r in rows], dtype="string"),
    }).to_parquet(f"{tmp_path}/documents.parquet")

    def expected_noisy(source, bucket, true_count, eps=1.0):
        key = f"dp:{source}\x1f{bucket}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:6], 16)
        u = (h + 1.0) / float(1 << 24)
        v = u - 0.5
        noise = -(1.0 / eps) * math.copysign(1.0, v) * math.log(
            1.0 - 2.0 * abs(v))
        return round(true_count + noise, 6)

    out = {(r.source, r.len_bucket): r
           for r in dp_noisy_counts_q(spark, str(tmp_path)).collect()}
    exp_a = expected_noisy("srcA", 0, 40)
    assert ("srcA", 0) in out
    assert abs(out[("srcA", 0)].noisy_count - exp_a) < 1e-9
    # srcB's noisy count is 2 + noise; released only when >= 10
    exp_b = expected_noisy("srcB", 0, 2)
    assert (("srcB", 0) in out) == (exp_b >= 10.0)
    for r in out.values():
        assert r.noisy_count >= 10.0
        assert r.epsilon == 1.0 and r.suppress_below == 10.0


def test_quantile_normalize_binned_monotone_map(spark):
    """The transfer map is a valid quantile alignment: per source, the
    mapped bin is nondecreasing in the source bin, cumulative shares
    end at exactly 1.0, and mapped scores stay inside the pooled score
    range."""
    from collections import defaultdict

    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        quantile_normalize_binned,
    )

    sf = "/root/testdata/sf0.001"
    rows = quantile_normalize_binned(spark, sf).collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        per[r.source].append(r)
        assert 0.0 < r.src_cum_share <= 1.0
        assert 0 <= r.mapped_bin <= 99
    for src, rs in per.items():
        rs.sort(key=lambda r: r.bin)
        assert abs(rs[-1].src_cum_share - 1.0) < 1e-9
        for a, b in zip(rs, rs[1:]):
            assert a.mapped_bin <= b.mapped_bin


def test_rbo_overlap_identical_rankers_hits_truncated_max(spark):
    """RBO@5(p=0.9) of a ranking against itself is exactly
    1 - p^5 = 0.40951 for every query — pins the fold's weights and
    the (1-p) normalization."""
    from hbase_packet_inspector_spark.operators.similarity import (
        rbo_overlap,
    )

    rows = [(q, 100 + n, n) for q in (1, 2) for n in range(1, 6)]
    rk = spark.createDataFrame(rows, ["q_id", "neighbor_id", "rnk"])
    out = {r.q_id: r for r in
           rbo_overlap(rk, rk, k=5, p=0.9).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r.n_overlap == 5
        assert abs(r.rbo - 0.40951) < 1e-6


def test_rbo_overlap_disjoint_rankers_is_zero(spark):
    from hbase_packet_inspector_spark.operators.similarity import (
        rbo_overlap,
    )

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], ["q_id", "neighbor_id", "rnk"])
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 2), (2, 30, 1)],
        ["q_id", "neighbor_id", "rnk"])
    out = {r.q_id: r for r in rbo_overlap(a, b, k=5, p=0.9).collect()}
    assert out[1].n_overlap == 0 and out[1].rbo == 0.0
    assert out[2].n_overlap == 0 and out[2].rbo == 0.0


def test_isotonic_calibration_pools_adjacent_violators(spark):
    """Hand case for the PAV minimax: bin rates [0.0, 1.0, 0.5] with
    equal weights must pool bins 1 and 2 to 0.75 while leaving bin 0
    alone — the canonical adjacent-violator merge."""
    from hbase_packet_inspector_spark.operators.learn import (
        isotonic_calibration,
    )

    rows = (
        [(0.05, 0)] * 4            # bin 0: rate 0.0
        + [(0.15, 1)] * 4          # bin 1: rate 1.0 (violator)
        + [(0.25, 1)] * 2 + [(0.25, 0)] * 2   # bin 2: rate 0.5
    )
    scored = spark.createDataFrame(rows, ["score", "y"])
    out = {r.bin: r for r in
           isotonic_calibration(scored, n_bins=10).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].iso_rate == 0.0
    assert abs(out[1].iso_rate - 0.75) < 1e-9
    assert abs(out[2].iso_rate - 0.75) < 1e-9
    # raw diagram still reports the violating rates
    assert out[1].frac_pos == 1.0 and out[2].frac_pos == 0.5


def test_isotonic_calibration_binned_is_monotone(spark):
    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        isotonic_calibration_binned,
    )

    rows = sorted(
        isotonic_calibration_binned(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.bin,
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate <= b.iso_rate + 1e-9
    for r in rows:
        assert 0.0 <= r.iso_rate <= 1.0


def test_cuped_preserves_pooled_mean(spark):
    """CUPED's defining identity: the user-weighted average of the
    adjusted variant means equals that of the raw means (the
    adjustment is a zero-sum reallocation of covariate imbalance)."""
    from hbase_packet_inspector_spark.plans.events_queries import (
        cuped_adjusted_lift,
    )

    rows = cuped_adjusted_lift(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 2
    n = sum(r.n_users for r in rows)
    raw = sum(r.raw_mean * r.n_users for r in rows) / n
    adj = sum(r.cuped_mean * r.n_users for r in rows) / n
    assert abs(raw - adj) < 1e-4
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0


def test_psi_drift_zero_on_identical_cohorts(spark, tmp_path):
    """Interleaved halves with identical length distributions must
    yield exactly zero PSI in every bin (p == q after smoothing)."""
    import pandas as pd

    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        psi_drift_binned,
    )

    pd.DataFrame({
        "doc_id": pd.Series(range(100), dtype="int64"),
        "source": pd.Series(["s"] * 100, dtype="string"),
        "text": pd.Series(["w " * 10] * 100, dtype="string"),
    }).to_parquet(f"{tmp_path}/documents.parquet")
    rows = psi_drift_binned(spark, str(tmp_path)).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.psi_contrib == 0.0
        assert r.p_ref == r.p_cur


def test_psi_drift_contributions_nonnegative(spark):
    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        psi_drift_binned,
    )

    rows = psi_drift_binned(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    assert abs(sum(r.p_ref for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.p_cur for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.psi_contrib >= 0.0


def test_km_survival_hand_checked(spark, tmp_path):
    """4 customers, corpus ending day 15: C's 1-day gap (wk 0, with
    D's same-day censor) drops S to 5/6; A's 7-day gap (wk 1, with 2
    censored exits the same week) drops S to 5/6 * 3/4; B's lone
    censored observation at wk 2 leaves S flat — pins at-risk
    bookkeeping, censoring, and the product form."""
    import datetime as dt

    import pandas as pd

    from hbase_packet_inspector_spark.plans.tpch_queries import (
        km_repurchase_survival,
    )

    def d(day):
        return dt.datetime(2024, 1, day)

    rows = [
        (1, 100, d(1)), (2, 100, d(8)),     # A: gap 7d -> wk 1 event
        (3, 200, d(1)),                     # B: censored 14d -> wk 2
        (4, 300, d(1)), (5, 300, d(2)),     # C: gap 1d -> wk 0 event
        (6, 400, d(15)),                    # closes corpus at day 15
    ]
    pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                "o_orderdate"]).astype(
        {"o_orderkey": "int64", "o_custkey": "int64",
         "o_orderdate": "datetime64[us]"}
    ).to_parquet(f"{tmp_path}/orders.parquet")

    out = {r.wk: r for r in
           km_repurchase_survival(spark, str(tmp_path)).collect()}
    # wk 0: D's same-day censor (d15->d15) joins C's event: n=6
    assert out[0].n_risk == 6
    assert out[0].d_repurchase == 1 and out[0].c_censored == 1
    assert abs(out[0].km_survival - (1 - 1 / 6)) < 1e-6
    assert out[1].n_risk == 4
    assert out[1].d_repurchase == 1 and out[1].c_censored == 2
    assert abs(out[1].km_survival - (1 - 1 / 6) * (1 - 1 / 4)) < 1e-6
    assert out[2].n_risk == 1 and out[2].d_repurchase == 0
    assert abs(out[2].km_survival - out[1].km_survival) < 1e-6


def test_km_survival_monotone_on_real_data(spark):
    from hbase_packet_inspector_spark.plans.tpch_queries import (
        km_repurchase_survival,
    )

    rows = sorted(
        km_repurchase_survival(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.wk,
    )
    assert rows
    assert all(0.0 <= r.km_survival <= 1.0 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.km_survival <= a.km_survival + 1e-9
    # at-risk counts strictly decrease over weeks
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk < a.n_risk


def test_rank_sum_separated_and_identical_cohorts(spark, tmp_path):
    """Fully separated cohorts give U = 0 and a large negative z;
    identical per-cohort distributions give U exactly na*nb/2 and
    z = 0 — the two ends of the test's range, hand-derivable."""
    import pandas as pd

    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        rank_sum_test,
    )

    # separated: cohort 0 (ids 0-24, 50-74) len 2, cohort 1 len 10
    n = 100
    txt = ["w" if (i // 25) % 2 == 0 else "w " * 10 for i in range(n)]
    pd.DataFrame({
        "doc_id": pd.Series(range(n), dtype="int64"),
        "source": pd.Series(["s"] * n, dtype="string"),
        "text": pd.Series(txt, dtype="string"),
    }).to_parquet(f"{tmp_path}/documents.parquet")
    r = rank_sum_test(spark, str(tmp_path)).collect()[0]
    assert r.n_a == 50 and r.n_b == 50
    assert r.u_stat == 0.0
    assert r.z_score < -5

    # identical: length keyed on (doc_id % 25) % 2, same in each block
    txt2 = ["w" if (i % 25) % 2 == 0 else "w " * 10 for i in range(n)]
    pd.DataFrame({
        "doc_id": pd.Series(range(n), dtype="int64"),
        "source": pd.Series(["s"] * n, dtype="string"),
        "text": pd.Series(txt2, dtype="string"),
    }).to_parquet(f"{tmp_path}/documents.parquet")
    r2 = rank_sum_test(spark, str(tmp_path)).collect()[0]
    assert abs(r2.u_stat - 50 * 50 / 2) < 1e-9
    assert r2.z_score == 0.0


def test_theil_decomposition_identity(spark):
    """Theil's defining property: sum(share-weighted within) +
    sum(between terms) equals the corpus Theil computed directly from
    per-customer spend."""
    import math

    from hbase_packet_inspector_spark.plans.tpch_queries import (
        theil_decomposition,
    )
    from hbase_packet_inspector_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = theil_decomposition(spark, sf).collect()
    assert rows
    decomposed = sum(r.theil_within for r in rows) + sum(
        r.between_term for r in rows)

    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    per = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .alias("x"))
        .collect()
    )
    xs = [r.x for r in per if r.x > 0]
    mu = sum(xs) / len(xs)
    direct = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    assert abs(decomposed - direct) < 1e-3


def test_benford_digit_audit_structure(spark):
    from hbase_packet_inspector_spark.plans.tpch_queries import (
        benford_digit_audit,
    )

    rows = benford_digit_audit(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 9
    assert {r.digit for r in rows} == set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.chi2_contrib >= 0.0
        assert r.expected > 0.0


def test_median_of_means_resists_outlier(spark, tmp_path):
    """One 10^6 outlier among 3200 unit values drags the raw mean
    >100x but lands in a single hash bucket, leaving the median of
    32 bucket means at ~1 — the estimator's defining robustness."""
    import datetime as dt

    import pandas as pd

    from hbase_packet_inspector_spark.plans.events_queries import (
        median_of_means,
    )

    n = 3200
    vals = [1.0] * n + [1_000_000.0]
    t0 = dt.datetime(2024, 1, 1)
    pd.DataFrame({
        "event_id": pd.Series(range(n + 1), dtype="int64"),
        "ts": pd.Series([t0] * (n + 1), dtype="datetime64[us]"),
        "user_id": pd.Series([1] * (n + 1), dtype="int64"),
        "event_type": pd.Series(["view"] * (n + 1), dtype="string"),
        "value": pd.Series(vals, dtype="float64"),
        "props": pd.Series(["{}"] * (n + 1), dtype="string"),
    }).to_parquet(f"{tmp_path}/events.parquet")

    r = median_of_means(spark, str(tmp_path)).collect()[0]
    assert r.n_events == n + 1
    assert r.raw_mean > 100
    assert r.mom_mean < 2.0


def test_chisq_independence_zero_when_independent(spark, tmp_path):
    """A perfectly independent 2x2 contingency (equal counts in every
    cell) must yield exactly zero chi2 in every cell."""
    import pandas as pd

    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        chisq_independence,
    )

    rows = []
    for i in range(100):
        src = "a" if i % 2 == 0 else "b"
        text = "x" * 100 if i % 4 < 2 else "x" * 600
        rows.append((i, src, text))
    pd.DataFrame(rows, columns=["doc_id", "source", "text"]).astype(
        {"doc_id": "int64", "source": "string", "text": "string"}
    ).to_parquet(f"{tmp_path}/documents.parquet")

    out = chisq_independence(spark, str(tmp_path)).collect()
    assert len(out) == 4
    for r in out:
        assert r.obs == 25
        assert r.expected == 25.0
        assert r.chi2_contrib == 0.0
