"""operators/sketch.py: Count-Min and Bloom guarantees on hand-built
frames — the one-sided error contracts (CMS never undercounts, Bloom
never false-negatives) plus the no-collision exactness limits."""

import pytest
from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators import sketch as K


def _skewed(spark, n_keys=20, mult=7):
    # key i appears (i+1)*mult times: heavily skewed, exact counts known
    rows = [(i,) for i in range(n_keys) for _ in range((i + 1) * mult)]
    return spark.createDataFrame(rows, "k long")


def test_cms_never_underestimates(spark):
    df = _skewed(spark)
    sk = K.cms_build(df, "k", width=8, depth=3)  # tiny: force collisions
    est = {
        r["k"]: r["cms_n"]
        for r in K.cms_estimate(sk, df, "k", width=8, depth=3).collect()
    }
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, f"CMS undercounted key {k}: {est[k]} < {n}"


def test_cms_exact_when_wide(spark):
    # width >> keys and depth 3: overwhelmingly likely collision-free,
    # and deterministic for this fixed data — estimate == exact
    df = _skewed(spark, n_keys=10)
    sk = K.cms_build(df, "k", width=65536, depth=3)
    out = K.heavy_hitters_cms(df, "k", width=65536, depth=3, k=10)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["overestimate"] == 0 for r in rows)
    assert all(r["cms_n"] == r["exact_n"] for r in rows)
    # sketch never exceeds depth*width rows and total mass per seed
    # equals the input row count
    per_seed = {r["seed"]: r["tot"] for r in sk.groupBy("seed").agg(
        F.sum("n").alias("tot")).collect()}
    assert set(per_seed) == {0, 1, 2}
    assert all(v == df.count() for v in per_seed.values())


def test_heavy_hitters_order_and_bound(spark):
    df = _skewed(spark)
    out = K.heavy_hitters_cms(df, "k", width=8, depth=3, k=5).collect()
    assert [r["k"] for r in out] == [19, 18, 17, 16, 15]  # exact top-5
    assert all(r["overestimate"] >= 0 for r in out)


def test_bloom_no_false_negatives(spark):
    build = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bl = K.bloom_build(build, "k", bits=64, hashes=3)  # saturated filter
    probed = K.bloom_probe(build, "k", bl, bits=64, hashes=3).collect()
    assert all(r["bloom_pass"] for r in probed), "false negative"


def test_bloom_prune_invariants(spark):
    probe = spark.createDataFrame(
        [(i, "seg%d" % (i % 3)) for i in range(200)], "k long, seg string")
    build = spark.createDataFrame(
        [(i,) for i in range(0, 200, 4)], "k long")  # members: k % 4 == 0
    out = K.bloom_join_prune(
        probe, "k", build, "k", bits=256, hashes=3).collect()
    assert len(out) == 200
    for r in out:
        member = r["k"] % 4 == 0
        assert r["is_member"] == member
        if member:
            assert r["bloom_pass"], "false negative on a member"
        assert r["false_pos"] == (r["bloom_pass"] and not member)


def test_bloom_exact_when_wide(spark):
    # bits >> 3*n: overwhelmingly likely FP-free for this fixed data
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    build = spark.createDataFrame([(i,) for i in range(0, 100, 10)],
                                  "k long")
    out = K.bloom_join_prune(
        probe, "k", build, "k", bits=1 << 20, hashes=3)
    assert out.filter("false_pos").count() == 0
    assert out.filter("bloom_pass").count() == 10
