"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — broadcast the query set,
  JVM-side dot products via zip_with/aggregate (no Python in the hot path)
- IVF-style partitioned search: restrict candidates to the query's cell
  (here the ``label`` column stands in for a coarse-quantizer assignment) —
  the candidate set shrinks by ~#cells, the standard ANN scale path
- norm statistics as the sanity/diagnostic aggregate

At 100 TB the base side stays partitioned; only the query set is broadcast.
Scores use double precision; outputs round to 6 decimals because summation
order across engines/partitions differs in the final bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    same_cell_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    ``queries`` must have columns (q_id, q_emb). If ``same_cell_col`` is set,
    both sides must carry it and candidates are restricted to the query's
    cell (IVF-style pruning).
    """
    base = emb.withColumn("_v", _as_double(F.col(vec_col)))
    qs = queries.withColumn("_qv", _as_double(F.col("q_emb")))

    cond = F.col("q_id") != F.col(id_col)
    if same_cell_col is not None:
        # IVF-style cell pruning: queries carry q_<cell>, base carries <cell>
        cond = (F.col(f"q_{same_cell_col}") == F.col(same_cell_col)) & cond
    pairs = base.join(F.broadcast(qs), cond)

    cos = dot(F.col("_v"), F.col("_qv")) / (
        F.sqrt(sq_norm(F.col("_v"))) * F.sqrt(sq_norm(F.col("_qv")))
    )
    scored = pairs.select(
        "q_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cos, 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cos", "rnk")
    )


def norm_stats(emb: DataFrame, by: str = "label",
               vec_col: str = "embedding") -> DataFrame:
    norm = F.sqrt(sq_norm(_as_double(F.col(vec_col))))
    return (
        emb.withColumn("_norm", norm)
        .groupBy(by)
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("_norm"), 4).alias("avg_norm"),
            F.round(F.min("_norm"), 6).alias("min_norm"),
            F.round(F.max("_norm"), 6).alias("max_norm"),
        )
    )
