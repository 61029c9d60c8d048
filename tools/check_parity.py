"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value multiset (timestamps normalized to isoformat,
floats to repr). Usage:

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from hbase_packet_inspector_spark.session import get_spark
from hbase_packet_inspector_spark.sources.tables import TABLE_NAMES


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return f"bool:{v}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return repr(v)


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            # fetch through Arrow, not fetchall(): the driver's comparator
            # goes through a typed path where DuckDB HUGEINT (bare
            # sum(INTEGER)) surfaces as decimal128, NOT Python int — an
            # oracle missing a CAST(... AS BIGINT) must fail here too
            try:
                drows = [
                    tuple(row[c] for c in dcols)
                    for row in res.fetch_arrow_table().to_pylist()
                ]
            except Exception:
                drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            ms, md = to_multiset(scols, srows), to_multiset(dcols, drows)
            if ms != md:
                diff_s = {k: v for k, v in ms.items() if md.get(k) != v}
                diff_d = {k: v for k, v in md.items() if ms.get(k) != v}
                sample_s = list(diff_s.items())[:3]
                sample_d = list(diff_d.items())[:3]
                problems.append(
                    f"values differ ({len(diff_s)}/{len(ms)} keys): "
                    f"spark-only={sample_s} duck-only={sample_d}"
                )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        # drop persisted frames between queries (mirrors bench.py: earlier
        # queries' caches otherwise tax later ones with GC pressure)
        spark.catalog.clearCache()

    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
