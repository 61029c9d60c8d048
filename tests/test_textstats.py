"""readability_scores / k_anonymity / hits_scores: hand-computed cases
on tiny frames (the oracle-parity gate covers the corpus-scale runs)."""

import pytest
from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators import profile as PR
from hbase_packet_inspector_spark.operators import text as X
from hbase_packet_inspector_spark.operators import web as WB


def _score(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return X.readability_scores(df).collect()[0]


def test_readability_counts(spark):
    # 6 words, 2 sentences (one terminated, one trailing), syllables:
    # "the cat sat. a dog ran" -> vowel runs: e,a,a,a,o,a = 6
    r = _score(spark, "the cat sat. a dog ran")
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19; fk = 0.39*3+11.8*1-15.59
    assert r["flesch"] == pytest.approx(119.19, abs=1e-9)
    assert r["fk_grade"] == pytest.approx(-2.62, abs=1e-9)
    assert r["band"] == "easy"


def test_readability_terminated_tail_and_empty(spark):
    r = _score(spark, "one two three!")  # ends in terminator: 1 sentence
    assert r["n_sentences"] == 1
    r2 = _score(spark, "a! b? c.")
    assert r2["n_sentences"] == 3
    r0 = _score(spark, "")
    assert (r0["n_words"], r0["n_sentences"]) == (0, 1)
    assert r0["flesch"] == pytest.approx(206.835, abs=1e-9)


def test_readability_multichar_terminator_run(spark):
    # "!?" and "..." are ONE run each
    r = _score(spark, "what?! no... maybe")
    assert r["n_sentences"] == 3


def test_k_anonymity_groups(spark):
    rows = [("a", 1)] * 7 + [("a", 2)] * 3 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "q1 string, q2 int")
    out = {(r["q1"], r["q2"]): r
           for r in PR.k_anonymity(df, ["q1", "q2"], k=5).collect()}
    assert out[("a", 1)]["group_n"] == 7
    assert not out[("a", 1)]["violates_k"]
    assert out[("a", 2)]["violates_k"]
    assert out[("b", 1)]["reident_risk"] == 1.0
    assert out[("a", 2)]["reident_risk"] == pytest.approx(0.333333)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src_host string, dst_host string")


def test_hits_star_graph(spark):
    # hub h links to authorities a1..a3; nothing links to h
    out = {r["host"]: r for r in WB.hits_scores(
        _edges(spark, [("h", "a1"), ("h", "a2"), ("h", "a3")]),
        iters=3).collect()}
    assert out["h"]["hub"] == 1.0 and out["h"]["authority"] == 0.0
    for a in ("a1", "a2", "a3"):
        assert out[a]["authority"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[a]["hub"] == 0.0


def test_hits_mutual_reinforcement(spark):
    # two hubs; h2 also links to a weak page nobody else endorses.
    # the shared authority 'a' outranks the solo 'weak'
    out = {r["host"]: r for r in WB.hits_scores(
        _edges(spark, [("h1", "a"), ("h2", "a"), ("h2", "weak")]),
        iters=5).collect()}
    assert out["a"]["authority"] > out["weak"]["authority"] > 0
    assert out["h2"]["hub"] > out["h1"]["hub"] > 0  # h2 has 2 outlinks
    assert sum(r["authority"] for r in out.values()) == pytest.approx(
        1.0, abs=1e-5)
    assert sum(r["hub"] for r in out.values()) == pytest.approx(
        1.0, abs=1e-5)


def test_hits_empty_and_zero_iters(spark):
    empty = _edges(spark, [])
    assert WB.hits_scores(empty, iters=3).count() == 0
    out = WB.hits_scores(_edges(spark, [("x", "y")]), iters=0).collect()
    assert {r["host"] for r in out} == {"x", "y"}


def test_triangle_count_known_graph(spark):
    # K3 (a,b,c) + pendant d: triangle vertices count 1, pendant 0.
    # direction/duplicates/self-loops must not matter
    e = _edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("b", "a"),           # reverse duplicate
        ("c", "c"),           # self loop
        ("c", "d"),           # pendant
    ])
    from hbase_packet_inspector_spark.operators.web import triangle_count
    out = {r["host"]: r["n_triangles"]
           for r in triangle_count(e).collect()}
    assert out == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_triangle_count_k4(spark):
    # K4: 4 triangles total, each vertex in exactly 3
    vs = ["a", "b", "c", "d"]
    e = _edges(spark, [(u, v) for u in vs for v in vs if u < v])
    from hbase_packet_inspector_spark.operators.web import triangle_count
    out = {r["host"]: r["n_triangles"]
           for r in triangle_count(e).collect()}
    assert out == {v: 3 for v in vs}


def test_scd2_build_runs_and_intervals(spark):
    from hbase_packet_inspector_spark.operators.asof import scd2_build
    rows = [
        # user 1: A A B A  -> versions A[10,30) B[30,40) A[40,None)
        (1, 10, "A", 100), (1, 20, "A", 101), (1, 30, "B", 102),
        (1, 40, "A", 103),
        # user 2: single event -> one current version
        (2, 15, "X", 200),
        # user 3: ts tie broken by seq: B then A at same ts
        (3, 50, "B", 300), (3, 50, "A", 301),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, attr string, event_id long")
    out = scd2_build(df, key_col="user_id", attr_col="attr",
                     ts_col="ts", seq_col="event_id").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["version"])
    assert [(r["attr"], r["valid_from_epoch"], r["valid_to_epoch"],
             r["is_current"]) for r in u1] == [
        ("A", 10, 30, False), ("B", 30, 40, False), ("A", 40, None, True)]
    assert len(by_user[2]) == 1 and by_user[2][0]["is_current"]
    u3 = sorted(by_user[3], key=lambda r: r["version"])
    assert [r["attr"] for r in u3] == ["B", "A"]
    assert u3[0]["valid_to_epoch"] == 50  # zero-length interval, closed


def test_scd2_build_null_attr_transitions(spark):
    # A -> NULL -> A must yield THREE versions (the NULL run is a real
    # version, and the second A is a genuine transition), and a history
    # that STARTS with NULL opens a version.  The pre-fix filter used a
    # null-rejecting `_prev != attr`, which dropped A->NULL and then
    # opened a duplicate consecutive-A version.
    from hbase_packet_inspector_spark.operators.asof import scd2_build
    rows = [
        (1, 10, "A", 100), (1, 20, None, 101), (1, 30, "A", 102),
        # user 2: starts NULL, NULL run extends, then transitions
        (2, 10, None, 200), (2, 20, None, 201), (2, 30, "B", 202),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, attr string, event_id long")
    out = scd2_build(df, key_col="user_id", attr_col="attr",
                     ts_col="ts", seq_col="event_id").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["version"])
    assert [(r["attr"], r["valid_from_epoch"], r["valid_to_epoch"])
            for r in u1] == [
        ("A", 10, 20), (None, 20, 30), ("A", 30, None)]
    u2 = sorted(by_user[2], key=lambda r: r["version"])
    assert [(r["attr"], r["valid_from_epoch"], r["valid_to_epoch"])
            for r in u2] == [(None, 10, 30), ("B", 30, None)]


SF = "/root/testdata/sf0.001"


def test_rate_zscore_invariants(spark):
    from hbase_packet_inspector_spark import plans
    rows = plans.QUERIES["rate_zscore"].fn(spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["z"])
    for t, zs in by_type.items():
        # numerators sum to N*S1 - N*S1 = 0 exactly, so z sums to ~0
        assert abs(sum(zs)) < 1e-9, t


def test_retrieval_mrr_invariants(spark):
    from hbase_packet_inspector_spark import plans
    rows = plans.QUERIES["retrieval_mrr"].fn(spark, SF).collect()
    assert rows, "query set empty"
    for r in rows:
        assert 0 <= r["first_rel_rank"] <= 5
        if r["first_rel_rank"] == 0:
            assert r["rr"] == 0.0
        else:
            assert r["rr"] == pytest.approx(1 / r["first_rel_rank"])


def test_scd2_interval_events_conserves_events(spark):
    from hbase_packet_inspector_spark import plans
    from hbase_packet_inspector_spark.sources.tables import load_table
    rows = plans.QUERIES["scd2_interval_events"].fn(spark, SF).collect()
    total = load_table(spark, SF, "events").count()
    # every event lands in exactly one half-open version interval
    assert sum(r["n_events"] for r in rows) == total
    assert all(r["n_events"] >= 0 for r in rows)


def test_l_diversity_homogeneous_class_flagged(spark):
    from hbase_packet_inspector_spark.operators import profile as PR
    rows = ([("a", 1, "s1")] * 6                 # large but homogeneous
            + [("b", 1, "s1"), ("b", 1, "s2"), ("b", 1, "s3")])
    df = spark.createDataFrame(rows, "q1 string, q2 int, sens string")
    out = {(r["q1"], r["q2"]): r for r in PR.l_diversity(
        df, ["q1", "q2"], "sens", l=3).collect()}
    assert out[("a", 1)]["violates_l"] and out[("a", 1)]["group_n"] == 6
    assert not out[("b", 1)]["violates_l"]
    assert out[("b", 1)]["n_sensitive"] == 3


def test_hash_features_sparse_counts(spark):
    from hbase_packet_inspector_spark.operators.text import hash_features
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b b c"), (2, "")],
        "doc_id long, text string")
    out = hash_features(df, dims=1 << 20).collect()  # collision-free
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["val"])
    assert sorted(per_doc[0]) == [1, 2]   # a:2, b:1
    assert sorted(per_doc[1]) == [1, 2]   # b:2, c:1
    assert 2 not in per_doc               # empty doc -> no features
    # same token -> same bucket across docs
    b = [r["feat_idx"] for r in out if r["val"] == 2]
    assert len(set(b)) == 2  # 'a' bucket and 'b' bucket differ


def test_host_components_rings_and_bridge(spark):
    from hbase_packet_inspector_spark.operators.web import host_components
    # two disjoint triangles; then a bridge merges them
    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    out = {r["host"]: r for r in host_components(
        _edges(spark, tri1 + tri2), iters=3).collect()}
    assert {out[h]["component"] for h in "abc"} == {"a"}
    assert {out[h]["component"] for h in "xyz"} == {"x"}
    assert all(out[h]["component_size"] == 3 for h in "abcxyz")
    merged = {r["host"]: r for r in host_components(
        _edges(spark, tri1 + tri2 + [("c", "x")]), iters=4).collect()}
    assert {r["component"] for r in merged.values()} == {"a"}
    assert all(r["component_size"] == 6 for r in merged.values())


def test_attribution_linear_shares(spark):
    from hbase_packet_inspector_spark import plans
    rows = plans.QUERIES["attribution_linear"].fn(spark, SF).collect()
    assert rows, "no attributed conversions at sf0.001"
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, chans in by_conv.items():
        # shares over a conversion's channels sum to 1 (k/k exactly)
        assert sum(c["credit_share"] for c in chans) == pytest.approx(1.0)
        assert all(0 < c["credit_share"] <= 1.0 for c in chans)
        assert len({c["channel"] for c in chans}) == len(chans)


def test_ewma_smooth_exactness_and_bounds(spark):
    from hbase_packet_inspector_spark import plans
    rows = plans.QUERIES["ewma_smooth"].fn(spark, SF).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["minute_epoch"])
        # first bucket: only lag-0 exists -> ewma == own count exactly
        assert rs[0]["ewma"] == float(rs[0]["n_events"])
        ns = [r["n_events"] for r in rs]
        for i, r in enumerate(rs):
            w = ns[max(0, i - 11):i + 1]
            assert min(w) <= r["ewma"] <= max(w)  # convex combination


def test_mad_outliers_robustness(spark):
    from hbase_packet_inspector_spark import plans
    rows = plans.QUERIES["mad_outliers"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["mad_cents"] >= 0
        assert 0 <= r["n_outliers"] < r["n"]  # the median itself never flags
        # dyadic exactness: med on halves, mad on quarters
        assert (r["med_cents"] * 2) == int(r["med_cents"] * 2)
        assert (r["mad_cents"] * 4) == int(r["mad_cents"] * 4)


def test_link_reciprocity_invariants(spark):
    from hbase_packet_inspector_spark import plans
    rows = plans.QUERIES["link_reciprocity"].fn(spark, SF).collect()
    assert rows
    by_host = {r["host"]: r for r in rows}
    assert "sink.example.com" not in by_host  # dangling: no out-edges
    for r in rows:
        assert 0 <= r["reciprocated"] <= r["out_edges"]
        assert r["reciprocity"] == pytest.approx(
            r["reciprocated"] / r["out_edges"])


def test_scd2_randomized_conservation(spark):
    """Seeded random event stream: SCD2 versions partition each key's
    timeline — intervals are adjacent (valid_to == next valid_from),
    attrs alternate at boundaries, exactly one current version per key."""
    import random
    from hbase_packet_inspector_spark.operators.asof import scd2_build
    rng = random.Random(909)
    rows = []
    for seq in range(300):
        rows.append((rng.randrange(8), rng.randrange(100),
                     rng.choice("ABC"), seq))
    df = spark.createDataFrame(
        rows, "user_id long, ts long, attr string, event_id long")
    out = scd2_build(df, key_col="user_id", attr_col="attr",
                     ts_col="ts", seq_col="event_id").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r["is_current"] for r in vs) == 1
        assert vs[-1]["is_current"]
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to_epoch"] == b["valid_from_epoch"]
            assert a["attr"] != b["attr"]  # only transitions open versions


def test_prefix_jaccard_no_false_negatives(spark):
    """Prefix filtering must find EVERY pair at/above threshold — pin
    against brute-force all-pairs word-set Jaccard on a small frame."""
    from itertools import combinations
    from hbase_packet_inspector_spark.operators.dedup import (
        prefix_jaccard_pairs)
    texts = [
        "a b c d e", "a b c d f", "a b c d e",   # near/exact dups
        "x y z w v", "x y z w u", "p q r s t",   # another family
        "a x p m n", "m n o",                     # low-overlap
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r["d1"], r["d2"]) for r in prefix_jaccard_pairs(
        df, threshold_num=3, threshold_den=5).collect()}
    sets = {i: set(t.split()) for i, t in enumerate(texts)}
    want = set()
    for i, j in combinations(range(len(texts)), 2):
        inter = len(sets[i] & sets[j])
        if inter * 5 >= len(sets[i] | sets[j]) * 3:
            want.add((i, j))
    assert got == want and (0, 2) in got  # exact dup pair present


def test_prefix_jaccard_bigram_no_false_negatives(spark):
    """gram=2 (the registered query's configuration): brute-force pin
    on word-BIGRAM sets, including a doc pair identical except for a
    middle edit (bigram jaccard drops sharply — both sides must agree)."""
    from itertools import combinations
    from hbase_packet_inspector_spark.operators.dedup import (
        prefix_jaccard_pairs)
    texts = [
        "a b c d e f g h",
        "a b c d e f g h",       # exact dup
        "a b c X e f g h",       # one middle edit
        "a b c d e f g z",       # tail edit
        "p q r s t u v w",       # unrelated
        "b a d c f e h g",       # same words, different bigrams
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r["d1"], r["d2"]): r["jaccard"] for r in prefix_jaccard_pairs(
        df, threshold_num=1, threshold_den=2, gram=2).collect()}
    def bg(t):
        ws = t.split()
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}
    sets = {i: bg(t) for i, t in enumerate(texts)}
    want = {}
    for i, j in combinations(range(len(texts)), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if inter * 2 >= union:
            want[(i, j)] = inter / union
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)
    assert got[(0, 1)] == 1.0          # exact dup
    assert (0, 5) not in got           # same words, disjoint bigrams
