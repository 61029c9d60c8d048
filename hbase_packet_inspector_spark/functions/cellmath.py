"""Cell-count math and batch zip/rollup as higher-order column functions
(SURVEY.md §2 C3/C10/C11/C12, D1). All JVM-side — no Python UDFs.

Reference semantics:
- scan response cells = sum of cells_per_result (hbase.clj:37-41)
- multi response: results positionally zipped with the request's actions
  (hbase.clj:49-69) — zip MUST preserve order
- record finalize: batch = count(actions); cells = cells or sum of non-null
  action cells (core.clj:261-271)
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
    results (C12): action supplies method/table/region/row/durability, result
    supplies cells/error; result fields win where both are set."""
    zipped = F.arrays_zip(actions.alias("a"), results.alias("r"))
    return F.transform(
        zipped,
        lambda z: F.struct(
            F.coalesce(z["r"]["method"], z["a"]["method"]).alias("method"),
            F.coalesce(z["r"]["table"], z["a"]["table"]).alias("table"),
            F.coalesce(z["r"]["region"], z["a"]["region"]).alias("region"),
            F.coalesce(z["r"]["row"], z["a"]["row"]).alias("row"),
            F.coalesce(z["r"]["cells"], z["a"]["cells"]).alias("cells"),
            F.coalesce(z["r"]["durability"], z["a"]["durability"]).alias("durability"),
            z["r"]["error"].alias("error"),
        ),
    )


def batch_cells_rollup(cells: Column, children: Column) -> Column:
    """Record-finalize cells (D1): keep the record's own cells if set, else
    sum the non-null cells of its child actions/results."""
    summed = F.aggregate(
        F.filter(children, lambda a: a["cells"].isNotNull()),
        F.lit(0),
        lambda acc, a: acc + a["cells"],
    )
    return F.coalesce(
        cells, F.when(children.isNotNull(), summed.cast("int"))
    )
