"""Generic as-of (backward) join — the reusable form of the HPI
request↔response correlation primitive (SURVEY.md §2 B6): for every left
row, attach the latest right row whose timestamp is <= the left row's,
within optional equality keys.

Spark has no built-in as-of join; the idiomatic distributed shape is the
union-and-window trick:

1. tag both inputs and union them (schema-aligned, right's payload columns
   nulled on left rows and vice versa);
2. one window over (by-keys) ordered by (ts, tag) with
   ``last(payload, ignorenulls=True)`` over the preceding frame — the
   running "most recent right row" state;
3. keep the left rows.

One shuffle total (the window partition), no join node at all — versus the
naive approach (equi join on keys + per-pair filter + dedup) which shuffles
twice and explodes on duplicate timestamps. The same plan shape at 100 TB:
state per by-key group is one row, the window never materializes a pair
blowup. DuckDB validates via its native ASOF JOIN.

``tolerance_ms`` mirrors the reference's state TTL (B10): matches older
than the tolerance are discarded (NULL payload), exactly the dangling-state
expiry of core.clj:285-296.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    tolerance_ms: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right[on] <= left[on]`` and equal ``by`` keys (backward as-of).

    ``value_cols`` are the right columns to attach (default: all non-key,
    non-ts columns). Output = left columns + value_cols (suffixed) +
    ``<on><suffix>`` (the matched right timestamp, NULL when no match).
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    value_cols = list(value_cols)

    lhs = left.select(
        *left.columns,
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by and c != on else F.col(c)
          for c in left.columns],
        F.lit(0).alias("_is_left"),
        F.col(on).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = lhs.unionByName(rhs)

    # right rows (tag 0) sort before left rows at an equal timestamp, so a
    # right row with ts == left ts IS eligible (<=, pandas merge_asof and
    # DuckDB ASOF JOIN semantics)
    w = (
        Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    ).orderBy(F.col(on).asc(), F.col("_is_left").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    state = F.last(
        F.when(
            F.col("_is_left") == 0,
            F.struct(F.col("_r_ts"), *[F.col(f"_r_{c}") for c in value_cols]),
        ),
        ignorenulls=True,
    ).over(w)

    out = u.withColumn("_state", state).where(F.col("_is_left") == 1)
    matched = F.col("_state._r_ts").isNotNull()
    if tolerance_ms is not None:
        matched = matched & (
            F.unix_millis(F.col(on)) - F.unix_millis(F.col("_state._r_ts"))
            <= tolerance_ms
        )
    sel = [F.col(c) for c in left.columns]
    sel.append(
        F.when(matched, F.col("_state._r_ts")).alias(f"{on}{suffix}")
    )
    for c in value_cols:
        sel.append(F.when(matched, F.col(f"_state._r_{c}")).alias(f"{c}{suffix}"))
    return out.select(*sel)


def scd2_build(events: DataFrame, *, key_col: str, attr_col: str,
               ts_col: str = "ts", seq_col: str | None = None) -> DataFrame:
    """Slowly-changing-dimension type-2 build (Kimball SCD2) from a
    change-event stream: collapse each key's event history into
    validity-interval versions — one row per (key, attribute value)
    RUN, with [valid_from, valid_to) interval epochs and an is_current
    flag on the open tail. This is the warehouse-side consumer of a
    CDC feed: the dimension table an as-of join (operators/asof.py::
    asof_join) then probes.

    Semantics: events order by (ts, seq) within each key; consecutive
    events with an UNCHANGED attribute extend the current version
    (only transitions open a new one — the first event always does);
    version numbers count transitions from 1; valid_to of version v is
    valid_from of v+1, NULL on the current version.

    Scale shape: one shuffle on the key — both windows (the lag that
    detects transitions and the lead/row_number that closes intervals)
    share the identical (key, ts, seq) partitioning+ordering, so
    Catalyst plans a single Exchange+Sort and the second window rides
    it. State per key is the version list, never the event list.

    Output: (key, version, attr, valid_from_epoch, valid_to_epoch,
    is_current) — valid_*_epoch are bigint seconds (timezone-proof
    across engines), valid_to_epoch NULL while current.
    """
    order = [F.col("_ts_e").asc()]
    if seq_col is not None:
        order.append(F.col(seq_col).asc())
    base = events.select(
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).cast("long").alias("_ts_e"),
        *([F.col(seq_col)] if seq_col else []),
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    # Null-safe transition test: `_prev != attr` is NULL (row dropped)
    # when either side is NULL, which would lose A->NULL transitions
    # and then mint a spurious duplicate-A version on A->NULL->A.  The
    # first event is identified by row_number (NOT by _prev being
    # NULL — a genuine NULL attribute on the previous event also lags
    # in as NULL); both window functions share the one Exchange+Sort.
    changes = (
        base.withColumn("_prev", F.lag("attr").over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1)
                | ~F.col("_prev").eqNullSafe(F.col("attr")))
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        changes
        .withColumn("version", F.row_number().over(w2))
        .withColumn("valid_to_epoch", F.lead("_ts_e").over(w2))
        .select(
            key_col,
            "version",
            "attr",
            F.col("_ts_e").alias("valid_from_epoch"),
            "valid_to_epoch",
            F.col("valid_to_epoch").isNull().alias("is_current"),
        )
    )
