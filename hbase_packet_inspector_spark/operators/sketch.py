"""Frequency and membership sketches: Count-Min heavy-hitter estimation
and Bloom-filter semi-join pruning.

Both are the fixed-size summaries a 100 TB pipeline ships around INSTEAD
of exact key sets: a Count-Min sketch answers "how hot is this key?"
within +epsilon*N using depth*width counters regardless of key
cardinality, and a Bloom filter answers "can this key possibly match the
other side of a join?" with zero false negatives so the big side can be
pruned before the shuffle (the hand-rolled form of the runtime filters
AQE injects, exposed here as first-class operators so the pruning is
explicit, testable, and usable on any key expression).

Hashing discipline: every hash is the first 8 hex chars of
``md5(seed || ':' || key)`` decoded as an integer — uniform mod any
modulus and bit-for-bit portable to the DuckDB oracle (the same idiom
as operators/text.py::cdc_chunks; a polynomial char hash is neither).

Reference parity note: the reference engine (kakao/hbase-packet-inspector)
has no sketch surface; this module is part of the repo's
training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h(key: Column, seed: int, mod: int) -> Column:
    """Seeded portable hash bucket: md5-first-8-hex of '<seed>:<key>'
    as a bigint, mod ``mod``. Non-negative (md5 hex8 < 2^32)."""
    tagged = F.concat(F.lit(f"{seed}:"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10)
        .cast("long") % mod
    )


def cms_build(df: DataFrame, key_col: str, *, width: int = 1024,
              depth: int = 3) -> DataFrame:
    """Build a Count-Min sketch over ``key_col``: ``depth`` seeded hash
    rows of ``width`` counters each; counter = #input rows hashing there.

    Scale shape: one narrow posexplode to (seed, bucket) pairs, then a
    single groupBy(seed, bucket) count. Partial (map-side) aggregation
    caps the shuffle at partitions * depth * width rows no matter how
    many input rows or distinct keys there are — that bound, not the
    data size, is what makes the sketch shippable (e.g. broadcastable
    as a runtime frequency table) at 100 TB.

    Output: (seed, bucket, n) — at most depth*width rows; buckets that
    no key hashes to are absent (an absent counter reads as 0).

    STREAMS AS WRITTEN: the sketch is a pure commutative count
    aggregation, so Structured Streaming maintains it incrementally
    (state = the counter table, <= depth*width rows regardless of
    stream length — the sketch's fixed-size property IS its streaming
    state bound); complete-mode emission is the whole sketch each
    micro-batch, equal to the batch build over the same prefix
    (pinned in tests/test_streaming.py).
    """
    k = F.col(key_col)
    pairs = df.select(
        F.posexplode(
            F.array(*[_h(k, s, width) for s in range(depth)])
        ).alias("seed", "bucket")
    )
    return pairs.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("n"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str, *,
                 width: int = 1024, depth: int = 3) -> DataFrame:
    """Point-query a Count-Min sketch for every row of ``keys``:
    estimate = min over the ``depth`` seeded counters the key hashes to
    (each counter >= the key's true count, so the min is an upper bound
    — the classic one-sided CMS guarantee: never an undercount).

    The sketch side is at most depth*width rows, so the lookup join is
    broadcast (no shuffle of the key frame beyond the final per-key
    min, which partial-aggregates map-side).

    Output: ``keys``' distinct ``key_col`` values + (cms_n).
    """
    k = F.col(key_col)
    probes = keys.select(key_col).distinct().select(
        key_col,
        F.posexplode(
            F.array(*[_h(k, s, width) for s in range(depth)])
        ).alias("seed", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        # a missing counter means nothing hashed there: count 0
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("n").alias("cms_n"))
    )


def heavy_hitters_cms(df: DataFrame, key_col: str, *, width: int = 1024,
                      depth: int = 3, k: int = 25) -> DataFrame:
    """Heavy hitters with a Count-Min audit: the exact top-``k`` keys by
    frequency, each carrying its CMS estimate and the overestimate the
    sketch incurred (``cms_n - exact_n``, >= 0 by construction — a
    negative value would falsify the sketch implementation, which is
    exactly what the oracle pins).

    At 100 TB the exact side of this frame is the expensive path (full
    groupBy on the key); the operator exists to measure how close the
    fixed-size sketch gets so the exact pass can be dropped where the
    estimate suffices. Deterministic top-k: ties break on the key.

    Output: (key, exact_n, cms_n, overestimate), k rows.
    """
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_n"))
    top = (
        exact.orderBy(F.desc("exact_n"), F.asc(key_col)).limit(k)
    )
    sk = cms_build(df, key_col, width=width, depth=depth)
    est = cms_estimate(sk, top, key_col, width=width, depth=depth)
    return (
        top.join(est, key_col)
        .select(
            key_col, "exact_n", "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
        )
    )


def bloom_build(df: DataFrame, key_col: str, *, bits: int = 4096,
                hashes: int = 3) -> DataFrame:
    """Build a Bloom filter from ``key_col``: the DISTINCT set of bit
    positions ``md5(seed:key) % bits`` for seed in [0, hashes).

    Scale shape: narrow posexplode + one distinct whose map-side
    combine caps the shuffle at partitions * bits rows; the result is
    at most ``bits`` rows — broadcastable regardless of build-side
    cardinality, which is the whole point: the filter rides to the
    probe side for free where the exact key set could not.

    Output: (pos) — the set bit positions.
    """
    k = F.col(key_col)
    return (
        df.select(
            F.explode(
                F.array(*[_h(k, s, bits) for s in range(hashes)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(df: DataFrame, key_col: str, bloom: DataFrame, *,
                bits: int = 4096, hashes: int = 3) -> DataFrame:
    """Probe a Bloom filter: a key "may match" iff ALL ``hashes`` of its
    bit positions are set. No false negatives ever (every build-side
    key set all its bits), false positives at the documented
    ``(1 - e^(-hashes*n/bits))^hashes`` rate — so filtering the big side
    of a join on ``bloom_pass`` before the shuffle is safe (semi-join
    reduction), and the residual FPs are removed by the join itself.

    The filter is at most ``bits`` rows and joins broadcast; the per-key
    all-bits-set test is a map-side-combining groupBy on the probe key.

    Output: ``df`` + (bloom_pass boolean).
    """
    k = F.col(key_col)
    verdict = (
        df.select(key_col).distinct()
        .select(
            key_col,
            F.explode(
                F.array(*[_h(k, s, bits) for s in range(hashes)])
            ).alias("pos"),
        )
        .join(F.broadcast(bloom.select("pos", F.lit(1).alias("_set"))),
              "pos", "left")
        .groupBy(key_col)
        .agg((F.count("_set") == hashes).alias("bloom_pass"))
    )
    return df.join(verdict, key_col, "left")


def bloom_join_prune(probe: DataFrame, probe_key: str, build: DataFrame,
                     build_key: str, *, bits: int = 4096,
                     hashes: int = 3) -> DataFrame:
    """Semi-join reduction audit: Bloom-filter ``probe`` against
    ``build``'s key set and report, per probe row, both the Bloom
    verdict and the exact membership — the frame that quantifies how
    much of the probe side the filter would prune before the real join
    and what false-positive residue the join still has to drop.

    Output: ``probe`` + (bloom_pass, is_member, false_pos).
    """
    bl = bloom_build(build, build_key, bits=bits, hashes=hashes)
    probed = bloom_probe(probe, probe_key, bl, bits=bits, hashes=hashes)
    members = build.select(
        F.col(build_key).alias(probe_key)).distinct().select(
        probe_key, F.lit(True).alias("is_member"))
    return (
        probed.join(members, probe_key, "left")
        .withColumn("is_member",
                    F.coalesce(F.col("is_member"), F.lit(False)))
        .withColumn("false_pos",
                    F.col("bloom_pass") & ~F.col("is_member"))
    )
