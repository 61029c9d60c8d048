"""Time-range join: pair rows whose timestamps fall within a window of each
other, with NO equality key linking the two sides.

Spark plans a bare inequality join as BroadcastNestedLoopJoin — O(|L|x|R|)
and a driver-memory broadcast, a non-starter at scale. The distributed shape
is bucket-and-filter:

1. bucket both sides by ``floor(epoch_ms / window_ms)``;
2. explode ONE side (pick the smaller/filtered one) to its bucket and both
   neighbors — any pair within the window differs by at most one bucket;
3. equi-join on the bucket (plus optional ``by`` keys) — a plain shuffled
   hash join Catalyst/AQE can optimize like any other;
4. filter the exact |Δts| <= window predicate.

Cost: 3x duplication of the exploded side, then a hash join whose key
cardinality grows with the time span — skew only if events pile into one
window, which is exactly when the output itself explodes. Each qualifying
pair is emitted exactly once (a row lives in ONE bucket; the explosion is
on the probe side only).

The same pattern generalizes to any metric range join (numeric distance,
geohash); the as-of join (operators/asof.py) is the directional/nearest
variant of the same problem.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    window_s: float = 3600.0,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join every left row to the right rows with
    ``|right.on - left.on| <= window_s`` (and equal ``by`` keys).

    Output: all left columns + ``<on><suffix>`` (the matched right
    timestamp) + the right ``value_cols`` (suffixed). The LEFT side is the
    exploded probe — pass the smaller side as ``left``.
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    value_cols = list(value_cols)
    wms = int(round(window_s * 1000))

    lb = F.floor(F.unix_millis(F.col(on)) / wms)
    probe = left.withColumn("_bucket", F.explode(F.array(lb - 1, lb, lb + 1)))
    build = right.select(
        *by,
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("_bucket", F.floor(F.unix_millis(F.col(f"{on}{suffix}")) / wms))

    joined = probe.join(build, ["_bucket", *by])
    exact = (
        F.abs(F.unix_millis(F.col(on)) - F.unix_millis(F.col(f"{on}{suffix}")))
        <= wms
    )
    return joined.where(exact).select(
        *left.columns,
        f"{on}{suffix}",
        *[f"{c}{suffix}" for c in value_cols],
    )
