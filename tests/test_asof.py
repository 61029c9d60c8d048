"""Edge-semantics tests for the generic as-of join (operators.asof):
equal-timestamp inclusivity, backward-only matching, tolerance expiry,
no-match nulls, and per-key isolation — the same contracts the B6
correlation depends on."""

import datetime as dt

from pyspark.sql import functions as F

from hbase_packet_inspector_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def ts(s):
    return T0 + dt.timedelta(seconds=s)


def frames(spark):
    left = spark.createDataFrame(
        [(1, "a", ts(10)), (2, "a", ts(20)), (3, "b", ts(15)), (4, "c", ts(5))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", ts(10), 100), ("a", ts(18), 200), ("b", ts(16), 300)],
        "k string, ts timestamp, v int",
    )
    return left, right


def test_backward_match_and_equal_ts_inclusive(spark):
    left, right = frames(spark)
    out = {r.id: (r.v_right, r.ts_right) for r in
           asof_join(left, right, on="ts", by=["k"]).collect()}
    assert out[1] == (100, ts(10))   # equal ts matches (<=)
    assert out[2] == (200, ts(18))   # latest prior wins, not the first
    assert out[3] == (None, None)    # right row at ts 16 is in the FUTURE
    assert out[4] == (None, None)    # key never seen


def test_tolerance_expires_old_matches(spark):
    left, right = frames(spark)
    out = {r.id: r.v_right for r in
           asof_join(left, right, on="ts", by=["k"],
                     tolerance_ms=1500).collect()}
    assert out[1] == 100             # 0 ms old
    assert out[2] is None            # 2000 ms old > 1500 ms tolerance


# --- salted join (operators.skew) ------------------------------------------

def test_salted_join_matches_plain_join(spark):
    from hbase_packet_inspector_spark.operators.skew import salted_join

    # heavy skew: one key owns 90% of the fact side
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)], "id int, k string"
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i * 10}", f"v{i}") for i in range(100)],
        "k string, v string",
    )
    plain = big.join(dim, "k", "left")
    salted = salted_join(big, dim, ["k"], salt=8, how="left")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    # the physical join key must include the salt column
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
