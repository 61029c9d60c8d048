"""Skew mitigation for equi joins (SCALE.md): explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized shuffle partitions, but it only helps sort-merge
joins and only after the skewed partition materializes. Salting attacks the
problem in the plan: the big side's key is extended with a salt bucket, the
small side is replicated once per bucket, and the join key becomes
(key, salt) — a hot key's rows spread across ``salt`` reducers instead of
one. Classic use: joining a fact table against a dimension where 1% of keys
carry 50% of rows (the HPI analog: one chatty client owning most RPC
traffic).

Cost model: replicates the small side ``salt``×, so use it when
small×salt ≪ big-side-hot-key volume. Results are exactly those of the
plain join — the salt value a row lands on never affects matching, only
placement, so salt derivation needs no determinism guarantee across
retries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join ``big ⋈ small`` on ``on`` with the big side salted into
    ``salt`` buckets and the small side replicated per bucket. Supported
    ``how``: inner / left (semantics identical to the plain join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    # any bucket assignment is correct; hash of the full row spreads even
    # single-key hot spots without an RNG (deterministic per row content)
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    b = big.withColumn("_salt", bucket)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")


def key_skew_report(df: DataFrame, key_cols: Sequence[str],
                    top: int = 10) -> DataFrame:
    """Key-distribution diagnostic — the measurement that decides whether a
    join needs ``salted_join`` (or a bigger ``salt``) BEFORE the shuffle
    melts down: the ``top`` heaviest keys with their row count, corpus
    share, and x_avg (how many times the mean key's volume this key
    carries; a key at x_avg 1000 on 1000 reducers serializes the stage).

    Scale shape: one partial+final count aggregate to |keys| rows, a
    single-row totals aggregate broadcast back over it (1-row nested loop
    by construction), and a TakeOrdered top-N — no global sort, nothing
    driver-side. x_avg is exact integer arithmetic with one final
    division."""
    keys = [F.col(c) for c in key_cols]
    g = df.groupBy(*keys).agg(F.count("*").alias("n"))
    t = g.agg(
        F.count("*").alias("_total_keys"),
        F.sum("n").alias("_total_rows"),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            *key_cols,
            "n",
            F.round(F.col("n").cast("double") / F.col("_total_rows"), 6)
            .alias("share"),
            F.round(
                (F.col("n") * F.col("_total_keys")).cast("double")
                / F.col("_total_rows"),
                6,
            ).alias("x_avg"),
        )
        .orderBy(F.desc("n"), *key_cols)
        .limit(top)
    )
