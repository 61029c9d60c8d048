"""Isolated per-query timing + plan capture (optimization-round probe).

Reproduces bench.py's methodology for ONE query without the other 250
taxing the session: fresh local[$SPARK_GRAFT_CPUS] session, one warmup
run at sf0.001 (codegen/JVM amortization), then N timed runs at the
target SF with the SAME timed action as the bench (`.count()`), plus an
optional `.explain("formatted")` dump for the plans/r12 evidence files.

Usage:
    python tools/isolate.py QUERY [QUERY...] [--sf DIR] [--repeats N]
                            [--explain-dir plans/r12] [--suffix before]
                            [--noop]

--noop additionally times a noop-sink write (guide §1.4: computes every
column; `.count()` can prune) — both numbers print so the bench-visible
cost and the full-materialization cost can be compared.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_packet_inspector_spark import plans
from hbase_packet_inspector_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", default="/root/testdata/sf0.001")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    spark = get_spark("isolate")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        q = plans.QUERIES.get(name)
        if q is None:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"warmup {name}")
        try:
            q.fn(spark, args.warm).count()
        except Exception as e:
            print(f"{name}: warmup failed: {e}")
        spark.catalog.clearCache()
        _release(spark)

        runs, noops, n = [], [], 0
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            n = df.count()
            runs.append(time.perf_counter() - t0)
            if args.noop:
                spark.catalog.clearCache()
                _release(spark)
                t0 = time.perf_counter()
                (q.fn(spark, args.sf).write.format("noop")
                 .mode("overwrite").save())
                noops.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            _release(spark)
        msg = (f"{name}: count-min {min(runs):.3f}s "
               f"runs {[round(r, 3) for r in runs]} ({n} rows)")
        if noops:
            msg += (f" noop-min {min(noops):.3f}s "
                    f"runs {[round(r, 3) for r in noops]}")
        print(msg)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            out = os.path.join(args.explain_dir,
                               f"{name}_{args.suffix}.txt")
            df = q.fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(out, "w") as f:
                f.write(plan.strip() + "\n")
            print(f"  plan -> {out}")
            spark.catalog.clearCache()
            _release(spark)
    spark.stop()
    return 0


def _release(spark) -> None:
    try:
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = m.iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
    except Exception:
        pass


if __name__ == "__main__":
    sys.exit(main())
