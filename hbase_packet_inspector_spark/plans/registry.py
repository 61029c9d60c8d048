"""Query registry: every engine capability exposed as a named query.

Each entry pairs a Spark DataFrame builder with the equivalent ANSI SQL that
DuckDB can run over the same parquet tables (the driver's correctness oracle).
Column aliases MUST match between the two — the driver sorts columns by name
and hashes values.

Determinism rules applied throughout the library:
- every floating-point output column is ``round()``-ed (sum order across
  engines/partitions differs in the last bits);
- every top-k / limit query orders by the *rounded* measure plus a unique
  tie-break key, so the selected row set is engine-independent;
- no raw timestamp outputs — epoch seconds (bigint) instead, immune to
  session-timezone differences between Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco
