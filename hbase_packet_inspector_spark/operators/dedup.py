"""Deduplication operators for large-scale training-data pipelines.

All four families, Spark-first (pure DataFrame ops, no UDFs — everything
stays in whole-stage codegen):

- exact dedup:        hash-groupBy on the text hash
- n-gram Jaccard:     char-shingle explode + self-join (exact baseline;
                      quadratic in shingle frequency — the scale path is LSH)
- MinHash + LSH:      shingle -> k independent min-hashes -> banded keys ->
                      bucket self-join -> verify candidates with exact Jaccard
- SimHash:            per-bit majority vote over shingle hashes

Portability note: hash functions are md5 (identical in Spark and DuckDB), so
every stage is oracle-checkable. min() over md5 hex strings is a valid
min-hash (uniform permutation of the shingle space per seed).

At 100 TB: the shingle explode is a flatMap (no shuffle); min-hash is one
shuffle on (doc, seed); banding one shuffle on (band, key); candidate
verification touches only bucket collisions — this is the standard
linear-scan-free near-dup pipeline (cf. Broder 1997 resemblance sketches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 4
DEFAULT_HASHES = 16
DEFAULT_BANDS = 4


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 group + per-doc duplicate flag (keep = min doc_id)."""
    from pyspark.sql import Window

    h = F.md5(F.col(text_col))
    w = Window.partitionBy("text_hash")
    return (
        docs.withColumn("text_hash", h)
        .withColumn("dup_count", F.count("*").over(w))
        .withColumn("keep_doc_id", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("dup_count") > 1)
        .select("doc_id", "text_hash", "dup_count", "keep_doc_id", "is_dup")
    )


def char_shingles(docs: DataFrame, n: int = DEFAULT_SHINGLE,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct char n-grams. flatMap — no shuffle until
    the consumer aggregates."""
    sh = F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, length({text_col}) - {n - 1}), "
        f"i -> substring({text_col}, i, {n}))) ELSE array() END"
    )
    return docs.select("doc_id", F.explode(sh).alias("shingle"))


def shingle_sizes(shingles: DataFrame) -> DataFrame:
    return shingles.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))


def pairwise_jaccard(shingles: DataFrame, min_jaccard: float) -> DataFrame:
    """Exact pairwise Jaccard via shingle self-join. Quadratic in per-shingle
    frequency — correct baseline; use minhash_lsh_candidates at scale."""
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    sz = shingle_sizes(shingles)
    j = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sz.selectExpr("doc_id AS d1", "n_shingles AS n1"), "d1")
        .join(sz.selectExpr("doc_id AS d2", "n_shingles AS n2"), "d2")
        .withColumn("jaccard", j)
        .where(F.col("jaccard") >= min_jaccard)
        .select("d1", "d2", "jaccard")
    )


def minhash_signatures(shingles: DataFrame,
                       n_hashes: int = DEFAULT_HASHES) -> DataFrame:
    """(doc_id, seed, sig): sig = min over shingles of md5(seed || ':' || s).
    One shuffle on (doc_id, seed)."""
    seeded = shingles.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {n_hashes - 1})")).alias("seed"),
        "shingle",
    )
    return seeded.groupBy("doc_id", "seed").agg(
        F.min(F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"),
                             F.col("shingle")))).alias("sig")
    )


def lsh_band_keys(signatures: DataFrame, n_hashes: int = DEFAULT_HASHES,
                  n_bands: int = DEFAULT_BANDS) -> DataFrame:
    """(doc_id, band, band_key): band_key = md5 of the band's seed-ordered
    signature concat."""
    rows_per_band = n_hashes // n_bands
    banded = signatures.withColumn("band", F.expr(f"seed div {rows_per_band}"))
    # seed-ordered concat, portable: sort zero-padded 'ss:sig' strings
    member = F.concat(F.lpad(F.col("seed").cast("string"), 2, "0"),
                      F.lit(":"), F.col("sig"))
    return (
        banded.groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.array_sort(F.collect_list(member))))
             .alias("band_key"))
    )


def lsh_candidates(band_keys: DataFrame) -> DataFrame:
    """Distinct candidate pairs: docs sharing any band bucket."""
    a = band_keys.alias("a")
    b = band_keys.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def verify_candidates(candidates: DataFrame, shingles: DataFrame,
                      min_jaccard: float) -> DataFrame:
    """Exact Jaccard on candidate pairs only (the cheap post-LSH pass)."""
    sa = shingles.selectExpr("doc_id AS d1", "shingle")
    sb = shingles.selectExpr("doc_id AS d2", "shingle")
    inter = (
        candidates.join(sa, "d1").join(sb, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    sz = shingle_sizes(shingles)
    j = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sz.selectExpr("doc_id AS d1", "n_shingles AS n1"), "d1")
        .join(sz.selectExpr("doc_id AS d2", "n_shingles AS n2"), "d2")
        .withColumn("jaccard", j)
        .where(F.col("jaccard") >= min_jaccard)
        .select("d1", "d2", "jaccard")
    )


def minhash_lsh_dedup(docs: DataFrame, *, n: int = DEFAULT_SHINGLE,
                      n_hashes: int = DEFAULT_HASHES,
                      n_bands: int = DEFAULT_BANDS,
                      min_jaccard: float = 0.35) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH buckets -> verified
    pairs with exact Jaccard >= min_jaccard."""
    sh = char_shingles(docs, n)
    sigs = minhash_signatures(sh, n_hashes)
    cands = lsh_candidates(lsh_band_keys(sigs, n_hashes, n_bands))
    return verify_candidates(cands, sh, min_jaccard)


def simhash(docs: DataFrame, *, n: int = DEFAULT_SHINGLE,
            bits: int = 16) -> DataFrame:
    """Per-doc SimHash: bit_j = majority over shingles of (hex digit j of
    md5(shingle)) mod 2, emitted as a '0'/'1' string (portable bit
    extraction: works identically on any engine with md5 + ascii)."""
    sh = char_shingles(docs, n)
    h = F.md5(F.col("shingle"))
    votes = [
        F.sum(
            (F.ascii(F.substring(h, j + 1, 1)) % 2 * 2 - 1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = sh.groupBy("doc_id").agg(*votes)
    sig = F.concat(
        *[F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise("0") for j in range(bits)]
    )
    return agg.select("doc_id", sig.alias("simhash"))
