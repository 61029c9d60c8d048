"""Unit tests for the round-4 curation operators: column profiling,
temperature mixing, deterministic global shuffle, LSH recall calibration,
and embedding-space decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators import dedup as D
from hbase_packet_inspector_spark.operators import profile as PR
from hbase_packet_inspector_spark.operators import sampling as SA
from hbase_packet_inspector_spark.operators import similarity as S


def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "b", None), (2, "a", 5), (3, "a", 7), (4, None, 7)],
        "id long, s string, v int",
    )
    out = {r["column"]: r for r in PR.profile(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["s"]["n_null"] == 1 and out["v"]["n_null"] == 1
    assert out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["s"]["n_distinct"] == 2  # nulls not counted
    assert out["v"]["n_distinct"] == 2
    # min/max typed BEFORE the string cast: ints compare numerically
    assert out["v"]["min_value"] == "5" and out["v"]["max_value"] == "7"
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
    # the approx variant runs and keeps the same schema
    approx = PR.profile(df, ["id"], exact_distinct=False).collect()
    assert approx[0]["n_rows"] == 4 and approx[0]["n_distinct"] >= 3


def test_source_mixture_weights_temperature(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (200 if i < 8 else 10), "big" if i < 8 else "small")
         for i in range(10)],
        "doc_id long, text string, source string",
    ).select("doc_id", F.expr("trim(text)").alias("text"), "source")
    t1 = {r["source"]: r for r in
          SA.source_mixture_weights(docs, temperature=1.0).collect()}
    t4 = {r["source"]: r for r in
          SA.source_mixture_weights(docs, temperature=4.0).collect()}
    for t in (t1, t4):
        assert abs(sum(r["weight"] for r in t.values()) - 1.0) < 1e-5
    # T=1 reproduces natural shares; higher T pulls toward uniform
    assert abs(t1["big"]["weight"] - t1["big"]["token_share"]) < 1e-5
    assert t4["small"]["weight"] > t1["small"]["weight"]
    assert t4["big"]["weight"] < t1["big"]["weight"]
    # oversampling audit: epochs = budget * weight / tokens
    r = t1["small"]
    assert abs(r["expected_epochs"]
               - round(1_000_000 * r["weight"] / r["tokens"], 6)) < 1e-5


def test_global_shuffle_contiguous_deterministic(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    out = SA.global_shuffle(docs, shards=4).collect()
    assert len(out) == 300 and len({r["doc_id"] for r in out}) == 300
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        # contiguous 1..n within each shard
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic across runs
    again = SA.global_shuffle(docs, shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed produces a different order (decorrelated)
    other = SA.global_shuffle(docs, shards=4, seed="v2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
    # the shuffled order decorrelates from doc_id order: within a shard,
    # pos must not be monotone in doc_id
    ids_by_pos = sorted(
        [(r["pos"], r["doc_id"]) for r in out if r["shard"] == 0]
    )
    seq = [d for _, d in ids_by_pos]
    assert seq != sorted(seq)


def test_lsh_recall_perfect_on_exact_dups(spark):
    # identical docs agree on every minhash -> collide in every band ->
    # recall 1.0 against the exact truth
    docs = spark.createDataFrame(
        # pair p shares one exact text; vocabularies are disjoint across
        # pairs so the only >=0.9-Jaccard pairs are the exact duplicates
        [(i, " ".join(f"tok{i // 2}word{j}end" for j in range(12)))
         for i in range(20)],
        "doc_id long, text string",
    )
    row = D.lsh_recall(docs, min_est=0.5, min_jaccard=0.9).collect()[0]
    assert row["n_truth"] == 10  # one pair per duplicated text
    assert row["n_hit"] == row["n_lsh"] == 10
    assert row["recall"] == 1.0


def test_lsh_recall_bounds(spark):
    docs = spark.createDataFrame(
        [(i, f"totally unique text {i} with words {i * 7} and {i * 13}")
         for i in range(30)],
        "doc_id long, text string",
    )
    row = D.lsh_recall(docs, min_jaccard=0.9).collect()[0]
    assert row["n_hit"] <= min(row["n_truth"], row["n_lsh"])
    # no true near-dup pairs -> recall is null, not a crash or div-by-zero
    if row["n_truth"] == 0:
        assert row["recall"] is None


def test_bigram_surprise_flags_word_salad(spark):
    from hbase_packet_inspector_spark.operators.text import bigram_surprise

    # 8 docs repeat the same natural word ORDER; the salad doc uses the
    # SAME words (identical unigram profile) in adjacencies never seen
    # elsewhere — only a bigram LM separates them
    natural = "the cat sat on the mat and then the dog sat on the rug"
    salad = "mat the on dog sat rug the and cat the then on sat the"
    docs = spark.createDataFrame(
        [(i, natural) for i in range(8)] + [(8, salad)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_surprise(docs).collect()}
    assert set(out) == set(range(9))
    assert all(out[i]["n_bigrams"] == 13 for i in range(9))
    nat = out[0]["mean_surprise"]
    assert out[8]["mean_surprise"] > nat + 0.5
    # a doc with fewer than 2 tokens contributes no row (no bigrams)
    one = spark.createDataFrame([(0, "word")], "doc_id long, text string")
    assert bigram_surprise(one).count() == 0


def test_key_skew_report(spark):
    from hbase_packet_inspector_spark.operators.skew import key_skew_report

    # 50 rows on key 0, 5 each on keys 1..4: mean = 70/5 = 14
    rows = [(0,)] * 50 + [(k,) for k in range(1, 5) for _ in range(5)]
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_report(df, ["k"], top=3).collect()
    assert [r["k"] for r in out] == [0, 1, 2]  # count desc, key asc ties
    hot = out[0]
    assert hot["n"] == 50
    assert abs(hot["share"] - round(50 / 70, 6)) < 1e-9
    assert abs(hot["x_avg"] - round(50 * 5 / 70, 6)) < 1e-9


def test_decontaminate_embeddings(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),   # train: identical to eval 100
            (1, [0.0, 1.0, 0.0]),   # train: orthogonal to eval
            (2, [0.5, 0.5, 0.0]),   # train: cos 0.7071 to eval — below bar
            (100, [1.0, 0.0, 0.0]),  # eval
        ],
        "vec_id long, embedding array<float>",
    )
    train = emb.where(F.col("vec_id") < 100)
    ev = emb.where(F.col("vec_id") >= 100)
    out = {r["vec_id"]: r for r in
           S.decontaminate_embeddings(train, ev, min_cos=0.95).collect()}
    assert set(out) == {0, 1, 2}  # every train row survives
    assert out[0]["contaminated"] and out[0]["max_eval_cos"] == 1.0
    assert not out[1]["contaminated"] and out[1]["max_eval_cos"] == 0.0
    assert not out[2]["contaminated"] and out[2]["max_eval_cos"] < 0.95
    # empty eval set: nothing contaminated, rows still present, null cos
    empty = ev.where(F.lit(False))
    out2 = {r["vec_id"]: r for r in
            S.decontaminate_embeddings(train, empty).collect()}
    assert set(out2) == {0, 1, 2}
    assert all(not r["contaminated"] and r["max_eval_cos"] is None
               for r in out2.values())
