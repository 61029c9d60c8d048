"""Z-order layout tests: Morton-key bit math and the range-clustered
write layout's contiguity contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators import layout as LY


def test_zorder_key_hand_checked_bits(spark):
    rows = [(3, 0), (0, 3), (1, 1), (5, 5), (0, 0), (255, 255)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = {(r.a, r.b): r.z
           for r in df.select("a", "b",
                              LY.zorder_key("a", "b", 8).alias("z")).collect()}
    # a's bit i -> position 2i, b's bit i -> position 2i+1
    assert out[(3, 0)] == 0b0101          # 5
    assert out[(0, 3)] == 0b1010          # 10
    assert out[(1, 1)] == 0b11            # 3
    assert out[(5, 5)] == 51              # (1+16) | (2+32)
    assert out[(0, 0)] == 0
    assert out[(255, 255)] == 2 ** 16 - 1  # all 16 result bits set


def test_cluster_by_zorder_ranges_are_contiguous(spark):
    """repartitionByRange on the Morton key: every partition owns one
    contiguous Z-range (partition i's max key < partition i+1's min key)
    and within a partition keys are sorted — the property that turns
    per-file min/max stats into two-dimensional pruning."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "a int, b int"
    )
    parts = (
        LY.cluster_by_zorder(grid, "a", "b", bits=4, n_files=4)
        .withColumn("pid", F.spark_partition_id())
        .collect()
    )
    by_pid: dict = {}
    for r in parts:
        by_pid.setdefault(r.pid, []).append(r._zkey)
    assert len(by_pid) == 4 and sum(len(v) for v in by_pid.values()) == 256
    for keys in by_pid.values():
        assert keys == sorted(keys)  # sortWithinPartitions held
    spans = sorted((min(v), max(v)) for v in by_pid.values())
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint contiguous ranges


def test_layout_skip_rates_grid(spark):
    """16x16 grid, 4 coarse buckets per layout (both sides cap at
    2^bucket_bits 'files' — apples to apples): Z-order skips half the
    buckets for a predicate on EITHER dimension; the sort-by-a layout
    skips half for a-predicates and nothing for b-predicates."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "a int, b int"
    )
    out = {(r.layout, r.predicate): r
           for r in LY.layout_skip_rates(grid, "a", "b", bits=4,
                                         bucket_bits=2, cut=8).collect()}
    z_a, z_b = out[("zorder", "a<8")], out[("zorder", "b<8")]
    assert (z_a.n_buckets, z_a.touched, z_a.skip_rate) == (4, 2, 0.5)
    assert (z_b.touched, z_b.skip_rate) == (2, 0.5)
    l_a = out[("sorted_by_a", "a<8")]
    l_b = out[("sorted_by_a", "b<8")]
    assert (l_a.n_buckets, l_a.touched, l_a.skip_rate) == (4, 2, 0.5)
    assert (l_b.touched, l_b.skip_rate) == (4, 0.0)


def test_layout_skip_rates_bounds_high_cardinality_a(spark):
    """A raw high-cardinality sort column must NOT produce one envelope
    row per distinct value — the sorted side buckets into at most
    2^bucket_bits ranges, like the z-side (the diagnostic stays
    collect-safe on raw keys)."""
    df = spark.createDataFrame(
        [(i * 7 % 100_003, i % 256) for i in range(5000)], "a int, b int"
    )
    out = LY.layout_skip_rates(df, "a", "b", bits=8, bucket_bits=4,
                               cut=50_000).collect()
    for r in out:
        assert r.n_buckets <= 16, r  # 2^4 cap held on ~5000 distinct a


def test_layout_skip_rates_and_gate_cutoffs_empty_inputs(spark):
    """Unattended calibration/diagnostic utilities return empty report
    tables on empty frames instead of TypeError / ZeroDivisionError."""
    from hbase_packet_inspector_spark.operators.text import (
        gate_cutoffs, gate_cutoffs_binned,
    )

    empty2 = spark.createDataFrame([], "a int, b int")
    assert LY.layout_skip_rates(empty2, "a", "b").collect() == []
    edocs = spark.createDataFrame([], "doc_id long, text string")
    assert gate_cutoffs_binned(edocs).collect() == []
    assert gate_cutoffs(edocs).collect() == []


def test_zorder_stats_envelopes_quadrants(spark):
    """On the full 16x16 grid with 2-bit coarse buckets, the 4 Z-ranges
    are EXACTLY the four 8x8 quadrants — the tight-envelope evidence."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "a int, b int"
    )
    out = {r.zbucket: r
           for r in LY.zorder_stats(grid, "a", "b",
                                    bits=4, bucket_bits=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    for r in out.values():
        assert r.n_rows == 64
        assert r.a_max - r.a_min == 7 and r.b_max - r.b_min == 7
    assert (out[0].a_min, out[0].b_min) == (0, 0)
    assert (out[3].a_max, out[3].b_max) == (15, 15)


def test_zorder_prunes_real_parquet_files(spark, tmp_path):
    """The end-to-end layout claim on REAL files: write the same 64x64
    grid (a) Z-order-clustered and (b) sorted by a, read the parquet
    FOOTERS back, and count which files a stats-aware scan touches.
    Z-order must skip files for predicates on BOTH dimensions; the
    single-sort layout skips only on a — and the pruned read returns
    exactly the rows of the full filtered scan."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "a int, b int"
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    LY.cluster_by_zorder(grid, "a", "b", bits=6, n_files=16) \
        .drop("_zkey").write.parquet(zdir)
    grid.repartitionByRange(16, "a").sortWithinPartitions("a") \
        .write.parquet(sdir)

    zenv = LY.footer_envelopes(spark, zdir, ["a", "b"]).persist()
    senv = LY.footer_envelopes(spark, sdir, ["a", "b"]).persist()
    zn, sn = zenv.count(), senv.count()
    assert zn >= 8 and sn >= 8  # the writes really did fan out

    z_a = LY.prune_files(zenv, "a", hi=7)
    z_b = LY.prune_files(zenv, "b", hi=7)
    s_a = LY.prune_files(senv, "a", hi=7)
    s_b = LY.prune_files(senv, "b", hi=7)
    # Z-order: real file skipping on BOTH dimensions
    assert len(z_a) <= zn // 2, (len(z_a), zn)
    assert len(z_b) <= zn // 2, (len(z_b), zn)
    # single sort: a prunes hard, b touches every file
    assert len(s_a) <= sn // 4, (len(s_a), sn)
    assert len(s_b) == sn
    zenv.unpersist()
    senv.unpersist()

    # the pruned scan is CORRECT: reading only surviving files under the
    # same predicate returns exactly the full scan's rows
    want = sorted((r.a, r.b) for r in
                  spark.read.parquet(zdir).where("b < 8").collect())
    got = sorted((r.a, r.b) for r in
                 spark.read.parquet(*z_b).where("b < 8").collect())
    assert got == want and len(want) == 8 * 64


def test_footer_envelopes_missing_column_yields_nulls(spark, tmp_path):
    """A column absent from a file's schema produces a NULL envelope
    (same as missing statistics) — never an executor-side error — and
    prune_files keeps the file, so schema drift across files can only
    cost speed, not correctness."""
    d = str(tmp_path / "p")
    spark.createDataFrame([(1, 2)], "a int, b int").write.parquet(d)
    env = LY.footer_envelopes(spark, d, ["a", "nope"]).collect()
    assert all(r.nope_min is None and r.nope_max is None for r in env)
    assert any(r.a_min == 1.0 and r.a_max == 1.0 for r in env)
    # null envelopes survive pruning on the missing column
    kept = LY.prune_files(
        LY.footer_envelopes(spark, d, ["nope"]), "nope", lo=0, hi=1
    )
    assert len(kept) == len(env)
