"""Exact-arithmetic helpers for oracle-parity queries.

Money/measure math is done on exact scaled integers and converted to double
with ONE final division, so Spark and DuckDB produce bit-identical doubles
and no round() is needed. round() of near-tie doubles is engine-dependent
(Spark rounds the shortest decimal repr HALF_UP; DuckDB multiplies+rounds;
they disagree on e.g. 66.55375), so the query library avoids rounding any
value that can land on a tie.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Exact integer cents of a 2-decimal double column."""
    return F.round(col * 100).cast("long")


# DuckDB-side fragment matching cents(): sum of exact cents as BIGINT.
SQL_SUM_CENTS = "sum(CAST(round({col} * 100) AS BIGINT))"
