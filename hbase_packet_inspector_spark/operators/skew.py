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
