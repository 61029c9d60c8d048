"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Parquet file skipping works off per-file min/max statistics, and a table
sorted by ONE column prunes only on that column — a predicate on the other
dimension still touches every file. Interleaving the bits of two columns
into a Morton key and range-partitioning on it makes every output file
cover a small HYPER-RECTANGLE of the key space, so min/max stats prune on
BOTH dimensions (the technique behind Delta/Iceberg OPTIMIZE ZORDER BY;
Morton 1966 is public domain).

Everything here is pure integer bit math in built-in column expressions —
JVM-side, whole-stage-codegen'd, bit-exact on any engine, so the layout
diagnostics are DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a, b, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of two NON-NEGATIVE
    integer columns — a's bit i lands at position 2i, b's at 2i+1. 2*bits
    result bits, so bits<=31 keeps the key in a positive long. Values are
    masked to ``bits`` (caller buckets/offsets wider or signed domains
    first — rank, epoch-bucket, hash-bucket all work)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def cluster_by_zorder(df: DataFrame, a: str, b: str, *, bits: int = 16,
                      n_files: int = 32) -> DataFrame:
    """The write-side layout pass: range-partition on the Morton key and
    sort within partitions, so each of the ``n_files`` output files covers
    one contiguous Z-range = a small hyper-rectangle in (a, b) — min/max
    stats then prune scans filtered on EITHER column. One range-exchange
    (sampled boundaries, the same cost as any sorted write); write the
    result with .write.parquet and the layout is the file statistics."""
    keyed = df.withColumn("_zkey", zorder_key(a, b, bits))
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
    )


def layout_skip_rates(df: DataFrame, a: str, b: str, *, bits: int = 8,
                      bucket_bits: int = 8, cut: int = 32) -> DataFrame:
    """The pruning evidence, measured: for single-column predicates
    ``a < cut`` and ``b < cut``, how many 'files' (coarse buckets) each
    layout's min/max envelopes let a scan SKIP — comparing the Z-order
    layout against the classic sort-by-``a`` layout (one file per a
    value). Sorted-by-a prunes a-predicates perfectly and b-predicates
    not at all (every file's b-envelope spans the domain); Z-order
    prunes BOTH at roughly the sqrt rate — this report prints those
    numbers from the data instead of asserting them.

    Output: (layout, predicate, n_buckets, touched, skip_rate), four
    rows (empty on an empty frame — an unattended diagnostic must not
    divide by zero). Each side is one narrow scan + a bucket-keyed
    aggregate over at most 2^bucket_bits envelope rows — the sorted-by-a
    comparison buckets ``a`` into equal-width ranges exactly like the
    z-side buckets its key (identity when a's domain is <= 2^bucket_bits
    dense values, so 'one file per a value' holds there), never one row
    per distinct value of a raw high-cardinality column."""
    schema = ("layout string, predicate string, n_buckets long, "
              "touched long, skip_rate double")
    spark = df.sparkSession
    amin, amax = df.agg(F.min(a), F.max(a)).first()
    if amin is None:
        return spark.createDataFrame([], schema)
    nb = 1 << bucket_bits
    width = max(1, -(-(int(amax) - int(amin) + 1) // nb))  # ceil(range/nb)
    a_bucket = ((F.col(a) - F.lit(int(amin))) / F.lit(width)).cast("long")
    # each envelope frame is <= 2^bucket_bits rows: collect ONCE per
    # layout (one table scan each) and count touches in Python — the
    # bounded-sufficient-statistics discipline; per-predicate .count()
    # calls would rescan the table per predicate
    rows = []
    for layout, env in (
        ("zorder",
         zorder_stats(df, a, b, bits=bits, bucket_bits=bucket_bits)),
        ("sorted_by_a",
         df.groupBy(a_bucket.alias("_k")).agg(
             F.min(a).alias("a_min"), F.max(a).alias("a_max"),
             F.min(b).alias("b_min"), F.max(b).alias("b_max"),
         )),
    ):
        envs = env.collect()
        tot = len(envs)
        for pred, lo in (("a", "a_min"), ("b", "b_min")):
            t = sum(1 for r in envs if r[lo] < cut)
            rows.append((layout, f"{pred}<{cut}", tot, t,
                         round(1.0 - t / tot, 6)))
    return spark.createDataFrame(rows, schema)


def footer_envelopes(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max envelopes read from REAL parquet footers — the
    ground truth behind every data-skipping claim (this is the stats
    index Delta/Iceberg maintain; vanilla parquet has it in each file's
    footer already). One row per file: (file, <c>_min, <c>_max per
    requested numeric column), min-of-row-group-mins / max-of-maxes.

    Scale shape: the driver handles FILE NAMES only; footers are opened
    and decoded on executors (mapInPandas over the path list — a 100k-file
    table fans out, ~KBs of footer per task, payload columns never read).
    A column with missing statistics yields nulls, which prune_files
    treats as always-touched — absent stats can only cost speed, never
    correctness."""
    import glob as _glob
    import os as _os

    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    files = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
    schema = StructType(
        [StructField("file", StringType())]
        + [StructField(f"{c}_{m}", DoubleType())
           for c in cols for m in ("min", "max")]
    )

    def _read(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["file"]:
                md = pq.ParquetFile(p).metadata
                names = {md.schema.column(i).name: i
                         for i in range(md.num_columns)}
                row = {"file": p}
                for c in cols:
                    j = names.get(c)
                    if j is None:
                        # column absent from this file's schema: null
                        # envelope, same as missing statistics — prune
                        # keeps the file (speed cost, never correctness)
                        row[f"{c}_min"] = None
                        row[f"{c}_max"] = None
                        continue
                    mins, maxs = [], []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(j).statistics
                        if st is None or not st.has_min_max:
                            mins, maxs = [], []
                            break
                        mins.append(st.min)
                        maxs.append(st.max)
                    row[f"{c}_min"] = float(min(mins)) if mins else None
                    row[f"{c}_max"] = float(max(maxs)) if maxs else None
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    paths = spark.createDataFrame([(f,) for f in files], "file string")
    return paths.repartition(max(1, min(len(files), 64))).mapInPandas(
        _read, schema
    )


def prune_files(envelopes: DataFrame, col: str, *, lo=None, hi=None) -> list:
    """File paths whose footer [min, max] envelope INTERSECTS [lo, hi] —
    the files a stats-aware scan must touch; everything else is skipped
    without opening it. Null envelopes (stats missing) are kept: skipping
    may only ever remove provably-disjoint files. The collect is
    file-count-sized (one path string per surviving file); feed the list
    to ``spark.read.parquet(*files)`` for the pruned scan."""
    e = envelopes
    if hi is not None:
        e = e.where(F.col(f"{col}_min").isNull() | (F.col(f"{col}_min") <= hi))
    if lo is not None:
        e = e.where(F.col(f"{col}_max").isNull() | (F.col(f"{col}_max") >= lo))
    return [r.file for r in e.select("file").collect()]


def zorder_stats(df: DataFrame, a: str, b: str, *, bits: int = 16,
                 bucket_bits: int = 8) -> DataFrame:
    """Layout diagnostic: carve the Morton key space into 2**bucket_bits
    coarse Z-ranges (the stand-ins for output files) and report each
    range's row count and per-dimension min/max envelope. Tight envelopes
    = effective two-dimensional pruning; one wide bucket = a skewed
    dimension that needs bucketing/offsetting before the interleave. One
    narrow scan + a bucket-keyed partial+final aggregate — a
    2**bucket_bits-row report at any data size."""
    zb = F.shiftright(zorder_key(a, b, bits), 2 * bits - bucket_bits)
    return (
        df.select(
            zb.alias("zbucket"),
            F.col(a).alias("_a"), F.col(b).alias("_b"),
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_a").alias("a_min"), F.max("_a").alias("a_max"),
            F.min("_b").alias("b_min"), F.max("_b").alias("b_max"),
        )
    )
