"""Deterministic sampling operators for training-data curation.

Random sampling is useless in a reproducible corpus pipeline — re-runs must
pick the SAME rows, and an auditor must be able to recompute membership from
the row alone. So every operator here derives its coin flip from a hash of
the row key (salted, uniform, engine-portable md5), never from an RNG:

- ``hash_bucket``: key -> stable bucket 0..99 (the first 6 md5 hex chars as
  an int, mod 100 — 16^6 values spread uniformly);
- ``stratified_sample``: per-stratum keep rates from a (broadcastable)
  rates dimension — the standard "X% of web, Y% of code" corpus mix;
- ``train_test_split``: disjoint deterministic splits from the same bucket.

At 100 TB all of this is a narrow map plus one broadcast hash join against
the tiny rates table: no shuffle of the corpus, no RNG state, and the
filter composes with parquet column pruning (only key + strata columns are
read if the caller selects nothing else).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, salt: str = "", buckets: int = 100) -> Column:
    """Stable uniform bucket in [0, buckets) from an md5 of the key (salted
    so independent sampling decisions don't correlate)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % buckets).cast("int")


def stratified_sample(
    docs: DataFrame,
    rates: DataFrame,
    key: str = "doc_id",
    strata: str = "source",
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's rate.

    ``rates`` has columns (``strata``, rate_pct) — broadcast: a corpus mix
    table is a few hundred rows however big the corpus is."""
    bucket = hash_bucket(F.col(key), salt="sample:")
    return (
        docs.withColumn("bucket", bucket)
        .join(F.broadcast(rates), strata)
        .where(F.col("bucket") < F.col("rate_pct"))
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    key: str = "doc_id",
    strata: str = "source",
    text_col: str = "text",
    shards: int = 8,
) -> DataFrame:
    """Sequence-packing accounting: assign docs to fixed token-budget chunks
    (the unit a trainer concatenates into one context window) and report the
    packing efficiency per chunk.

    Docs are first sharded by a salted hash (each shard is one output-file
    stream, the way real packers parallelize), then packed *sequentially
    within the shard* in ``key`` order: a doc starts a new chunk when the
    running token total before it has crossed the chunk boundary. The rule
    ``chunk = floor(cum_tokens_before / budget)`` is deterministic, order-
    stable, and engine-portable.

    Scale shape: one shuffle to (strata, shard) — the window runs per shard,
    so parallelism = |sources| x shards (tune ``shards`` to the cluster, the
    chunk streams are independent). No global sort, no driver loop. Chunk
    stats aggregate map-side on the same partitioning, so the window's
    exchange is reused."""
    from pyspark.sql import Window

    tokens = F.size(F.split(F.col(text_col), " "))
    shard = hash_bucket(F.col(key), salt="pack:", buckets=shards)
    w = (
        Window.partitionBy(strata, "shard")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        docs.select(F.col(strata), F.col(key), tokens.alias("tokens"))
        .withColumn("shard", shard)
        .withColumn("cum_before", F.coalesce(F.sum("tokens").over(w), F.lit(0)))
        .withColumn("chunk_id", F.floor(F.col("cum_before") / budget))
    )
    return staged.groupBy(strata, "shard", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").alias("chunk_tokens"),
        F.round(F.sum("tokens").cast("double") / budget, 6).alias("fill_ratio"),
        F.min(key).alias("first_doc"),
        F.max(key).alias("last_doc"),
    )


def source_mixture_weights(
    docs: DataFrame,
    temperature: float = 2.0,
    strata: str = "source",
    text_col: str = "text",
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source-mixing weights — the standard multi-source
    training-mix computation (share^(1/T), renormalized): T=1 reproduces
    natural token shares, T→inf approaches uniform, intermediate values
    up-weight small high-quality sources without drowning the big ones.
    Also reports ``expected_epochs`` — how many passes over each source a
    ``token_budget`` draw implies (the oversampling-factor audit).

    Scale shape: one partial+final aggregate to |sources| rows, then pure
    driver-free arithmetic over that tiny frame (window over an
    aggregated ~hundreds-row frame, not the corpus). Weights round to 6
    before the division is re-rounded so the schedule hashes identically
    across engines."""
    from pyspark.sql import Window

    tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    per = docs.groupBy(strata).agg(
        F.count("*").alias("n_docs"), F.sum(tokens).alias("tokens")
    )
    everything = Window.partitionBy()
    raw = F.round(
        F.pow(
            F.col("tokens").cast("double")
            / F.sum("tokens").over(everything).cast("double"),
            1.0 / temperature,
        ),
        6,
    )
    per = per.withColumn("raw_w", raw)
    weight = F.round(
        F.col("raw_w") / F.sum("raw_w").over(everything), 6
    )
    per = per.withColumn("weight", weight)
    return per.select(
        strata,
        "n_docs",
        "tokens",
        F.round(
            F.col("tokens").cast("double")
            / F.sum("tokens").over(everything),
            6,
        ).alias("token_share"),
        "weight",
        F.round(
            F.lit(token_budget) * F.col("weight") / F.col("tokens"), 6
        ).alias("expected_epochs"),
    )


def mixture_schedule(
    weights: DataFrame,
    *,
    token_budget: int = 1_000_000,
    strata: str = "source",
) -> DataFrame:
    """Materialize a mixing schedule from :func:`source_mixture_weights`
    output: per source, ``rate_ppm = least(1e6, round(1e6 * weight *
    budget / tokens))`` and ``target_tokens = round(weight * budget)``.
    A |sources|-row dim frame — save it with the model artifacts; the
    streaming ingest gate broadcasts it per micro-batch."""
    return weights.select(
        strata, "tokens", "weight",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.round(
                F.lit(1_000_000.0) * F.col("weight")
                * F.lit(float(token_budget)) / F.col("tokens")
            ).cast("long"),
        ).alias("rate_ppm"),
        F.round(F.col("weight") * F.lit(float(token_budget)))
        .cast("long").alias("target_tokens"),
    )


def mixture_keep(
    docs: DataFrame,
    schedule: DataFrame,
    *,
    key: str = "doc_id",
    strata: str = "source",
) -> DataFrame:
    """Row-level keep decision of a mixing schedule — the stateless half
    :func:`execute_mixture` aggregates into its report, and the half a
    streaming ingest applies per micro-batch (broadcast schedule dim +
    in-row salted hash, NO state, so batch === stream row-for-row).
    Kept rows pass through with their columns intact (plus the joined
    ``rate_ppm``); a doc's verdict depends only on its own key."""
    bucket = hash_bucket(F.col(key), salt="mix:", buckets=1_000_000)
    return (
        docs.join(F.broadcast(schedule.select(strata, "rate_ppm")), strata)
        .where(bucket < F.col("rate_ppm"))
    )


def execute_mixture(
    docs: DataFrame,
    weights: DataFrame,
    *,
    token_budget: int = 1_000_000,
    key: str = "doc_id",
    strata: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Execute a source-mixing schedule — the step between
    :func:`source_mixture_weights` (which computes the mix) and the
    trainer (which consumes it): per-source deterministic hash sampling
    at the rate the weights imply for ``token_budget``.

    ``rate_ppm = least(1e6, round(1e6 * weight * budget / tokens))`` —
    a source whose schedule wants MORE than one epoch is fully kept
    (oversampling/repetition is the trainer's loop, priced by
    ``expected_epochs`` upstream). A doc is kept iff its salted md5
    bucket in [0, 1e6) falls under its source's rate: reproducible on
    any engine, no RNG state, and stable under corpus growth — a doc's
    verdict never depends on other docs' arrival, so an incremental
    ingest keeps the same rows a batch run would.

    Output per source: (strata, tokens, rate_ppm, target_tokens,
    kept_docs, kept_tokens) — the audit that the executed sample hits
    the schedule, with the hash-quantization error visible. Sources the
    schedule zeroes out still report (kept 0), never silently vanish.

    Scale shape: the schedule is a broadcast |sources|-row dim; the keep
    decision is a narrow in-row expression (no corpus shuffle); the only
    shuffle is the |sources|-cardinality report rollup."""
    w = mixture_schedule(weights, token_budget=token_budget,
                         strata=strata)
    ntok = F.size(F.split(F.col(text_col), " ")).cast("long")
    kept = (
        mixture_keep(
            docs.select(F.col(strata), F.col(key), ntok.alias("_ntok")),
            w, key=key, strata=strata)
        .groupBy(strata)
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("_ntok").alias("kept_tokens"),
        )
    )
    return (
        w.join(kept, strata, "left")
        .select(
            strata, "tokens", "rate_ppm", "target_tokens",
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("bigint")
            .alias("kept_docs"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("bigint")
            .alias("kept_tokens"),
        )
    )


def global_shuffle(
    docs: DataFrame,
    shards: int = 8,
    seed: str = "",
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    (shard, pos) — shard from a salted hash bucket, pos by rank of a
    SECOND independent salted hash within the shard. Reproducible from the
    row alone (re-runs and engines agree), statistically order-free (the
    md5 rank decorrelates from any ingest order), and auditable.

    Scale shape: NO global sort — the corpus shuffles once to ``shards``
    hash partitions and each shard sorts independently (size ~ corpus /
    shards; pick shards so a shard fits a task's spill budget, e.g.
    100 TB / 200 MB ≈ 500 k shards). This is how training-data writers
    actually lay out epochs: shard files + in-shard order, never a single
    total order."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"order:{seed}:"), F.col(key).cast("string")))
    w = Window.partitionBy("shard").orderBy("h", key)
    return (
        docs.select(
            F.col(key),
            hash_bucket(F.col(key), salt=f"shard:{seed}:",
                        buckets=shards).alias("shard"),
            h.alias("h"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(key, "shard", "pos")
    )


def curriculum_order(
    docs: DataFrame,
    *,
    score_col: str,
    key: str = "doc_id",
    bins: int = 10,
    shards: int = 8,
    seed: str = "",
) -> DataFrame:
    """Curriculum training order: globally COARSE (easy→hard by score
    bin), locally shuffled — the curriculum-learning layout at corpus
    scale. A full global sort by score is the anti-pattern twice over:
    one total order means one reducer lineage, and exact score order
    trains badly anyway (batches full of near-identical difficulty).
    Equal-width score bins give the macro curriculum; within a bin the
    salted-md5 order decorrelates content exactly like
    :func:`global_shuffle`.

    Bin edges come from ONE 1-row (min, max) aggregate broadcast back
    (the sanctioned model-bounded shape); ``pos`` is a row_number per
    (bin, shard) — shard-local sorts sized corpus/(bins·shards), never
    a global sort. A constant score degenerates to bin 0 everywhere
    rather than dividing by zero.

    Output: (key, score, bin, shard, pos) — the trainer consumes bins
    ascending, shards within a bin in parallel."""
    from pyspark.sql import Window

    s = F.col(score_col).cast("double")
    mm = docs.agg(F.min(s).alias("_lo"), F.max(s).alias("_hi"))
    d = docs.select(F.col(key), s.alias("score")).crossJoin(F.broadcast(mm))
    span = F.col("_hi") - F.col("_lo")
    b = (
        F.when(span == 0, F.lit(0))
        .otherwise(F.least(
            F.lit(bins - 1).cast("long"),
            F.floor((F.col("score") - F.col("_lo")) / span * bins),
        ))
        .cast("int")
    )
    h = F.md5(F.concat(F.lit(f"curr:{seed}:"), F.col(key).cast("string")))
    w = Window.partitionBy("bin", "shard").orderBy("h", key)
    return (
        d.select(
            F.col(key), F.col("score"), b.alias("bin"),
            hash_bucket(F.col(key), salt=f"cshard:{seed}:",
                        buckets=shards).alias("shard"),
            h.alias("h"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(key, "score", "bin", "shard", "pos")
    )


def train_test_split(
    docs: DataFrame, key: str = "doc_id", test_pct: int = 10
) -> DataFrame:
    """Deterministic disjoint split: adds ``split`` = 'test' for the lowest
    ``test_pct`` buckets, 'train' otherwise. Same row -> same split on every
    run and every engine."""
    bucket = hash_bucket(F.col(key), salt="split:")
    return docs.withColumn(
        "split",
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    key: str = "doc_id",
    test_pct: int = 10,
) -> DataFrame:
    """Near-dup-aware train/test split — the repair executing what
    ``split_leakage_audit`` detects: start from the deterministic hash
    split, then QUARANTINE every test doc with a verified near-dup in
    train. Dropping from test cannot create new leaks (removing a row
    leaves every remaining pair's sides unchanged — whereas moving the
    doc INTO train can turn a former test↔test pair into fresh
    leakage), so a single pass is a fixpoint. Train keeps every row;
    the benchmark loses only its contaminated items, each attributable
    via ``split_raw`` vs ``split_safe``.

    ``pairs`` is a verified near-dup pair frame with ``d1``/``d2``
    columns (minhash_lsh_dedup's output shape, or any detector that
    matches it).

    Scale shape: the pair frame is the detector's OUTPUT — tiny next
    to the corpus; two equi-joins label its sides, the offender set
    distincts, one left join marks the corpus. The split assignment
    itself stays a narrow in-row hash."""
    sp = train_test_split(docs.select(F.col(key)), key=key,
                          test_pct=test_pct)
    a = sp.select(F.col(key).alias("d1"), F.col("split").alias("_sa"))
    b = sp.select(F.col(key).alias("d2"), F.col("split").alias("_sb"))
    lab = pairs.select("d1", "d2").join(a, "d1").join(b, "d2")
    # ONE pass over lab: the two leak directions are mutually exclusive
    # per row, so a CASE projection + distinct emits exactly the union
    # of the former two filtered branches — which each re-evaluated the
    # entire upstream near-dup pipeline (r12: the pair detector is the
    # expensive side; the union form doubled it)
    bad = (
        lab.select(
            F.when((F.col("_sa") == "test") & (F.col("_sb") == "train"),
                   F.col("d1"))
            .when((F.col("_sa") == "train") & (F.col("_sb") == "test"),
                  F.col("d2"))
            .alias(key))
        .where(F.col(key).isNotNull())
        .distinct()
        .withColumn("_leak", F.lit(True))
    )
    return (
        sp.join(bad, key, "left")
        .select(
            key,
            F.col("split").alias("split_raw"),
            F.when(F.col("_leak").isNotNull(), F.lit("quarantine"))
            .otherwise(F.col("split")).alias("split_safe"),
        )
    )


def budget_select(scored: DataFrame, budget: int, *, score_col: str,
                  tokens_col: str, id_col: str = "doc_id",
                  n_bins: int = 256) -> DataFrame:
    """Fill a token budget with the highest-scoring documents — the cut
    every data-selection method (DSIR, classifier scores, quality gates)
    ends with: "take the most target-like docs until the budget is
    spent." Keeps the maximal prefix of docs ordered by (score desc,
    id asc) whose cumulative ``tokens_col`` fits ``budget``; membership
    is exact and deterministic (rows with a null score are excluded).

    Scale shape — NO global sort: a fixed-width score histogram (one
    min/max pass + one n_bins-row aggregate, the gate_cutoffs_binned
    sufficient-statistics discipline) locates the boundary bin on the
    driver. Bins above the boundary are kept with a plain filter — no
    ordering needed, because fixed-width binning is order-consistent
    (equal scores share a bin; every doc in a higher bin outranks every
    doc in a lower one) — and only the boundary bin's rows pay the
    running-sum window. Degenerate case (all scores equal → one bin)
    decays to sorting that bin, which is the global sort any exact
    selection would then require; pre-round scores or raise n_bins if
    the boundary bin is crowded. Two scans of ``scored`` total (the
    histogram and the filters) — persist upstream if it is expensive to
    recompute."""
    from pyspark.sql import Window

    sc = F.col(score_col)
    scored = scored.where(sc.isNotNull())
    lo, hi = scored.agg(F.min(score_col), F.max(score_col)).first()
    if lo is None:
        return scored.limit(0)
    span = (hi - lo) or 1.0
    binned = scored.withColumn(
        "_bin",
        F.least(
            F.floor((sc - F.lit(lo)) / F.lit(span) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    hist = {
        r["_bin"]: r["t"]
        for r in binned.groupBy("_bin")
        .agg(F.sum(tokens_col).alias("t")).collect()
    }
    cum, boundary = 0, None
    for b in range(n_bins - 1, -1, -1):
        t = hist.get(b, 0)
        if cum + t <= budget:
            cum += t
        else:
            boundary = b
            break
    if boundary is None:
        return scored  # everything fits
    remaining = budget - cum
    kept_full = binned.where(F.col("_bin") > boundary).drop("_bin")
    w = Window.orderBy(F.desc(score_col), F.asc(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bnd = (
        binned.where(F.col("_bin") == boundary)
        .withColumn("_cum", F.sum(tokens_col).over(w))
        .where(F.col("_cum") <= remaining)
        .drop("_bin", "_cum")
    )
    return kept_full.unionByName(bnd)


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Stable uniform double in (0, 1]: the first 6 md5 hex chars of the
    salted key as a 24-bit int, shifted by 1 so ln() is always defined —
    u = (h + 1) / 2^24. Engine-portable (DuckDB recomputes it from the
    same md5), 24 bits of resolution — ties between distinct keys are
    ~2^-24 likely and break on the row key downstream."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("double") + 1.0)
        / F.lit(float(1 << 24))
    )


def weighted_sample_aes(df: DataFrame, weight: Column, *, k: int = 200,
                        key: str = "doc_id",
                        salt: str = "aes:") -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    algorithm A-ES (IPL 2006): each row draws u = hash-uniform(key) and
    scores ln(u) / w — the top-k scores are exactly a weighted sample
    without replacement (P(row first) = w_i / Σw). The textbook key
    u^(1/w) is monotone with ln(u)/w, so the log form ranks identically
    while staying in a numerically flat range.

    This is THE one-pass distributed answer to "sample 10k docs
    proportional to token count" — no per-stratum rates, no rejection
    loop, no RNG state: membership is recomputable from the row alone
    (the reproducibility bar every operator in this module meets).

    Scale shape: a narrow map to score each row, then a global top-k —
    Spark plans orderBy(...).limit(k) as TakeOrderedAndProject (per-
    partition heaps + a k-row driver merge), so the corpus is never
    globally sorted and never shuffles. Score rounded 6 AFTER selection
    (the cut itself compares full doubles; md5-derived u's are spread
    ~2^-24 apart, far beyond any cross-engine 1-ulp ln() drift).

    ``weight`` must be strictly positive; rows with weight <= 0 are
    dropped (they can never be sampled under A-ES semantics)."""
    scored = (
        df.withColumn("_w", weight.cast("double"))
        .where(F.col("_w") > 0)
        .withColumn(
            "aes_score",
            F.log(hash_uniform(F.col(key), salt=salt)) / F.col("_w"),
        )
    )
    return (
        scored.orderBy(F.col("aes_score").desc(), F.col(key).asc())
        .limit(k)
        .withColumn("aes_score", F.round("aes_score", 6))
        .withColumn("weight", F.col("_w").cast("bigint"))
        .drop("_w")
    )
