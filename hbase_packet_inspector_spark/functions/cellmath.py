"""Cell-count math and batch zip/rollup as higher-order column functions
(SURVEY.md §2 C3/C10/C11/C12, D1). All JVM-side — no Python UDFs.

Reference semantics:
- scan response cells = sum of cells_per_result (hbase.clj:37-41)
- multi response: results positionally merged over the request's actions
  (hbase.clj:49-69, ``(map merge actions results)``): the action supplies
  method/table/region/row/durability, the result supplies cells/error —
  result values win even when null (the result map always carries the keys),
  and the merged list is as long as the SHORTER side (Clojure ``map`` stops
  at the shortest; checked mutations can return fewer results than actions,
  hbase.clj:63-66 TODO note)
- record finalize: batch = count(actions); cells = own cells, else sum of
  non-null child cells — never null, ``(reduce + ())`` is 0
  (core.clj:261-271)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sum_cells_per_result(cells_per_result: Column) -> Column:
    """Total cells of a scan response: sum of an array<int> (C10)."""
    return F.aggregate(
        cells_per_result, F.lit(0), lambda acc, x: acc + F.coalesce(x, F.lit(0))
    )


def zip_actions_results(actions: Column, results: Column) -> Column:
    """Positionally merge a multi request's actions with the response's raw
    results (C12) per ``(map merge actions results)`` (hbase.clj:68-69):
    action fields survive only where the result map has no key — i.e. the
    result's cells/error are taken verbatim (possibly null), everything else
    comes from the action. Output length = min(len(actions), len(results))."""
    zipped = F.slice(
        F.arrays_zip(actions.alias("a"), results.alias("r")),
        1,
        F.least(F.size(actions), F.size(results)),
    )
    return F.transform(
        zipped,
        lambda z: F.struct(
            z["a"]["method"].alias("method"),
            z["a"]["table"].alias("table"),
            z["a"]["region"].alias("region"),
            z["a"]["row"].alias("row"),
            z["r"]["cells"].alias("cells"),
            z["a"]["durability"].alias("durability"),
            z["r"]["error"].alias("error"),
        ),
    )


def sum_child_cells(children: Column) -> Column:
    """Sum of the non-null cells of a child action/result array (the
    ``(reduce + (remove nil? (map :cells ...)))`` of send!, core.clj:269-271
    and parse-multi-response, hbase.clj:67). Null iff ``children`` is null;
    0 for an empty (or all-null-cells) array."""
    return F.aggregate(
        F.filter(children, lambda a: a["cells"].isNotNull()),
        F.lit(0),
        lambda acc, a: acc + a["cells"],
    ).cast("int")
