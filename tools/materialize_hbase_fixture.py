"""Materialize the decoded reference-pcap tables as committed parquet.

Runs the same capture pipeline as the ``hbase_pcap_decode`` /
``hbase_pcap_tables`` queries (pcap scan -> reassembly -> protobuf decode ->
correlation -> table build) on the reference fixtures and writes ONLY the
columns those queries roll up to ``tests/fixtures/hbase_capture/``, sorted
deterministically and written via pyarrow (single stable file per table —
Spark's directory output would not be byte-reproducible).

The committed files give both queries a DuckDB oracle: the driver then
hash-checks the decode rollups against an independent engine's aggregation
of the pinned decode output, so any regression in the wire decoder
(sources/hbase_wire.py) or the correlation/table build shows up as an
oracle mismatch, not just a row-count drift.

Re-run after any intentional decoder change:

    python tools/materialize_hbase_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "hbase_capture",
)


def main() -> None:
    from hbase_packet_inspector_spark.session import get_spark
    from hbase_packet_inspector_spark.plans.pipeline_queries import (
        _load_hbase_capture,
    )

    spark = get_spark("materialize-hbase-fixture")
    tables = _load_hbase_capture(spark)
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    # responses: the hbase_pcap_decode rollup axis (method, cells, elapsed)
    resp = (
        tables["responses"]
        .select("method", "cells", "elapsed")
        .toPandas()
        .sort_values(["method", "cells", "elapsed"])
        .reset_index(drop=True)
    )
    # requests: the hbase_pcap_tables rollup axis (table, method, batch, cells)
    req = (
        tables["requests"]
        .select("table", "method", "batch", "cells")
        .toPandas()
        .sort_values(["table", "method", "batch", "cells"])
        .reset_index(drop=True)
    )
    for name, df in (("responses", resp), ("requests", req)):
        path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"wrote {path}: {len(df)} rows, dtypes={dict(df.dtypes)}")


if __name__ == "__main__":
    main()
