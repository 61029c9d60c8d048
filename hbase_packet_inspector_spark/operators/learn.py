"""Declarative model training: batch-gradient-descent logistic regression
expressed as DataFrame aggregations — the "train a quality classifier on
doc features" loop of a curation pipeline, with the same execution shape
the k-means refinement uses (operators/similarity.py::kmeans_refine).

Why this shape scales: each round is ONE distributed aggregation — every
row computes its per-row gradient contribution narrow (sigmoid + a few
multiplies, all codegen), and partial aggregation reduces it map-side, so
the shuffle carries #partitions × (#features+1) doubles regardless of
corpus size. The weight vector (tiny) rides the driver between rounds and
re-enters as literals — a broadcast of ~bytes. At 10^12 rows the cost is
#rounds scans; a real deployment would mini-batch by sampling partitions,
same plan shape.

Determinism discipline (the oracle gate's float rules): the gradient is an
order-dependent double sum, so weights are round()-ed after every update —
cross-engine drift (~1e-13 relative) is annihilated at 1e-6 — and the
logit is clamped to ±30 BEFORE exp so no input can overflow to inf (which
would poison the hash on both engines in different ways).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_CLAMP = 30.0


def _sigmoid(z: Column) -> Column:
    zc = F.greatest(F.least(z, F.lit(Z_CLAMP)), F.lit(-Z_CLAMP))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-zc))


def _logit(weights: Sequence[float], feature_cols: Sequence[str]) -> Column:
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    return z


def logreg_step(
    feats: DataFrame,
    weights: Sequence[float],
    feature_cols: Sequence[str],
    label_col: str,
    *,
    lr: float = 0.5,
    round_to: int = 6,
) -> list[float]:
    """One batch-gradient-descent update. ``weights`` = [bias, w_1..w_k].

    grad_j = avg((sigmoid(w·x) - y) * x_j); returns round(w - lr*grad, 6).
    One aggregation job: per-row work is codegen, the reduce is
    partial+final over (#features+1) running means."""
    p = _sigmoid(_logit(weights, feature_cols))
    err = p - F.col(label_col).cast("double")
    aggs = [F.avg(err).alias("g0")] + [
        F.avg(err * F.col(c).cast("double")).alias(f"g{i + 1}")
        for i, c in enumerate(feature_cols)
    ]
    g = feats.agg(*aggs).collect()[0]
    return [
        round(float(w) - lr * float(g[f"g{j}"]), round_to)
        for j, w in enumerate(weights)
    ]


def logreg_fit(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    lr: float = 0.5,
    rounds: int = 2,
    round_to: int = 6,
) -> tuple[list[float], DataFrame]:
    """``rounds`` gradient steps from w=0, then one evaluation pass.

    Returns (final_weights, metrics): a one-row DataFrame with the learned
    weights, the mean log-loss at those weights, and the correct-prediction
    count (p >= 0.5 decision) — the fit AND its quality in one place.
    Each round is one scan; the loop is driver-orchestrated exactly like
    kmeans_refine, with only the (tiny) weight vector off-cluster."""
    weights = [0.0] * (len(feature_cols) + 1)
    for _ in range(rounds):
        weights = logreg_step(
            feats, weights, feature_cols, label_col, lr=lr, round_to=round_to
        )
    p = _sigmoid(_logit(weights, feature_cols))
    y = F.col(label_col).cast("double")
    logloss = F.round(
        F.avg(-(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))), round_to
    ).alias("logloss")
    correct = F.sum(
        ((p >= 0.5).cast("double") == y).cast("long")
    ).alias("n_correct")
    metrics = feats.agg(logloss, correct).select(
        *[
            F.lit(w).alias(name)
            for w, name in zip(
                weights, ["w_bias"] + [f"w_{c}" for c in feature_cols]
            )
        ],
        "logloss",
        "n_correct",
    )
    return weights, metrics


def logreg_predict(
    feats: DataFrame,
    weights: Sequence[float],
    feature_cols: Sequence[str],
    *,
    round_to: int = 6,
) -> DataFrame:
    """Inference pass at trained weights: append ``score`` =
    round(sigmoid(w·x), 6) to every row — the "apply the quality
    classifier to the whole corpus" step that follows ``logreg_fit`` in a
    curation pipeline. Pure codegen column math (weights enter as
    literals, a broadcast of ~bytes), so scoring 10^12 rows is exactly one
    narrow scan; downstream filters on ``score`` push into it. Consumers
    thresholding a decision should compare the ROUNDED score so the
    boundary is engine-deterministic."""
    p = _sigmoid(_logit(weights, feature_cols))
    return feats.withColumn("score", F.round(p, round_to))


def pr_curve_binned(scored: DataFrame, *, score_col: str = "score",
                    label_col: str = "y", n_bins: int = 20) -> DataFrame:
    """Precision/recall calibration table at binned score thresholds —
    the report that picks a quality classifier's operating point after
    training ("keep everything the model scores above t": what does each
    t cost in precision and recall?). One row per threshold i/n_bins:
    (threshold, tp, fp, fn, prec, rec, f1), where predictions are
    "score lands in bin >= i" — bin membership, not a per-threshold
    rescan, so BOTH engines agree bitwise at the boundaries.

    Scale shape: ONE (bin, label) histogram aggregate over the scored
    corpus — a 2*n_bins-row mergeable sufficient statistic (the
    gate_cutoffs_binned discipline: partials combine, so the same shape
    calibrates under a stream or across shards) — then reverse running
    sums over the n_bins-row grid (a window over n_bins rows, nothing
    corpus-sized). prec/rec round to 6 BEFORE f1 so the derived metric
    is engine-exact; thresholds with no predicted positives report null
    prec/f1 rather than dividing by zero.

    Score domain: scores are expected in [0, 1] (sigmoid output). The
    bin is clamped into [0, n_bins-1] at BOTH ends so an out-of-range
    score counts in the nearest edge bin instead of silently vanishing
    from tp/fp/fn (an unclamped negative bin would drop the row in the
    grid left-join and overstate recall). Null scores still drop —
    un-scored rows have no place on a threshold curve."""
    from pyspark.sql import Window

    y = F.col(label_col).cast("long")
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    hist = scored.groupBy(b.alias("bin")).agg(
        F.sum(y).alias("pos"),
        F.sum(F.lit(1) - y).alias("neg"),
    )
    spark = scored.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    full = grid.join(hist, "bin", "left").fillna(0, ["pos", "neg"])
    w_ge = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = full.select(
        "bin",
        F.sum("pos").over(w_ge).alias("tp"),
        F.sum("neg").over(w_ge).alias("fp"),
        (F.sum("pos").over(w_all) - F.sum("pos").over(w_ge)).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    out = cum.select(
        F.round(F.col("bin").cast("double") / n_bins, 6).alias("threshold"),
        "tp", "fp", "fn",
        F.when(tp + fp > 0, F.round(tp / (tp + fp), 6)).alias("prec"),
        F.when(tp + fn > 0, F.round(tp / (tp + fn), 6)).alias("rec"),
    )
    p, r = F.col("prec"), F.col("rec")
    return out.withColumn(
        "f1", F.when(p + r > 0, F.round(2 * p * r / (p + r), 6))
    )


def calibration_bins(scored: DataFrame, *, score_col: str = "score",
                     label_col: str = "y",
                     n_bins: int = 10) -> DataFrame:
    """Reliability diagram for a probability-scored classifier — the
    calibration audit that complements :func:`pr_curve_binned`'s
    operating-point table: per score bin, does the model's stated
    confidence match the observed positive rate? A quality classifier
    that says 0.9 but is right 60% of the time silently skews every
    downstream token-budget and mixture decision keyed on its scores.

    One row per non-empty bin (bin i covers [i/n, (i+1)/n), scores
    clamped into the edge bins like pr_curve_binned): ``n``,
    ``avg_score`` (the model's mean stated confidence there),
    ``frac_pos`` (what actually happened), ``gap`` =
    |frac_pos − avg_score| computed from the ROUNDED columns so the
    derived metric is engine-exact, and ``weight`` = n/N. The expected
    calibration error is ``sum(weight × gap)`` — left to the consumer
    as one more fold rather than a global window here.

    Scale shape: ONE (bin, label) histogram aggregate (mergeable
    sufficient statistic — partials combine, so the same shape audits
    a stream or shards) + a single-row total broadcast back; nothing
    corpus-sized survives the first aggregate."""
    y = F.col(label_col).cast("long")
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    hist = scored.groupBy(b.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg(F.col(score_col)), 6).alias("avg_score"),
        F.round(F.avg(y.cast("double")), 6).alias("frac_pos"),
    )
    tot = hist.agg(F.sum("n").alias("_N"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n", "avg_score", "frac_pos",
            F.round(F.abs(F.col("frac_pos") - F.col("avg_score")), 6)
            .alias("gap"),
            F.round(F.col("n").cast("double") / F.col("_N"), 6)
            .alias("weight"),
        )
    )


def isotonic_calibration(scored: DataFrame, *, score_col: str = "score",
                         label_col: str = "y",
                         n_bins: int = 10) -> DataFrame:
    """Isotonic (monotone) calibration fit over the reliability bins —
    pool-adjacent-violators (Ayer et al. 1955; Zadrozny & Elkan 2002)
    computed via the PAV MINIMAX identity rather than the sequential
    pooling loop:

        iso_i = max_{j<=i} min_{k>=i} avg(y over bins j..k)

    which is embarrassingly declarative over a CONSTANT bin grid: the
    corpus collapses to an n_bins-row (n, Σy) histogram in one
    mergeable aggregate, prefix sums make any interval average one
    exact integer division, and two tiny inequality joins + two
    groupBys evaluate the minimax — no iteration, no driver loop, no
    float accumulation (every candidate avg is a single int/int IEEE
    division, so the max-of-mins picks identical values on any
    engine). The sequential PAV and the minimax formula provably agree
    (Robertson, Wright & Dykstra 1988, Thm 1.4.4).

    Output per non-empty bin: n, avg_score, frac_pos (the raw
    reliability diagram, :func:`calibration_bins`' columns) plus
    ``iso_rate`` — the monotone-regressed positive rate, i.e. the
    calibration map actually shipped with a model (unlike the raw
    diagram, it never zig-zags when a mid bin is noisy).

    Scale shape: one (bin) histogram shuffle; everything after runs on
    n_bins-row frames (grid joins are n_bins^2 <= 100 rows) — corpus
    size only enters the first aggregate."""
    from pyspark.sql import Window

    y = F.col(label_col).cast("long")
    b = F.greatest(
        F.lit(0),
        F.least(F.lit(n_bins - 1),
                F.floor(F.col(score_col) * n_bins).cast("int")),
    )
    hist = (
        scored.select(b.alias("bin"), y.alias("_y"),
                      F.col(score_col).alias("_s"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("_ysum"),
            F.round(F.avg("_s"), 6).alias("avg_score"),
            F.round(F.avg(F.col("_y").cast("double")), 6)
            .alias("frac_pos"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin", "n", "_ysum", "avg_score", "frac_pos",
        F.sum("n").over(w).alias("_cn"),
        F.sum("_ysum").over(w).alias("_cy"),
    )
    # interval [j, k] average from the two endpoint rows alone:
    # (cy_k - (cy_j - y_j)) / (cn_k - (cn_j - n_j))
    j = cum.select(F.col("bin").alias("_j"),
                   (F.col("_cn") - F.col("n")).alias("_pn"),
                   (F.col("_cy") - F.col("_ysum")).alias("_py"))
    k = cum.select(F.col("bin").alias("_k"),
                   F.col("_cn").alias("_kn"), F.col("_cy").alias("_ky"))
    pairs = (
        j.join(k, F.col("_k") >= F.col("_j"))
        .select(
            "_j", "_k",
            ((F.col("_ky") - F.col("_py")).cast("double")
             / (F.col("_kn") - F.col("_pn")).cast("double"))
            .alias("_avg"),
        )
    )
    bins_i = cum.select(F.col("bin").alias("_i"))
    inner = (
        bins_i.join(
            pairs,
            (F.col("_j") <= F.col("_i")) & (F.col("_k") >= F.col("_i")),
        )
        .groupBy("_i", "_j")
        .agg(F.min("_avg").alias("_minavg"))
        .groupBy("_i")
        .agg(F.round(F.max("_minavg"), 6).alias("iso_rate"))
    )
    return (
        cum.join(inner, cum.bin == F.col("_i"))
        .select("bin", "n", "avg_score", "frac_pos", "iso_rate")
    )
