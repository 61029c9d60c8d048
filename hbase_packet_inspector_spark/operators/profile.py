"""Column-profiling operator: the data-quality report a corpus pipeline
runs before anything else touches a new source drop.

One wide partial+final aggregate computes, per requested column: row count,
null count, exact distinct count, and min/max (typed comparison, then cast
to string for the uniform report schema); an ``inline`` unpivot turns the
single wide row into one report row per column. Nothing leaves the
executors but the one aggregated row.

Scale notes (100 TB): multiple EXACT ``count(distinct)`` aggregates in one
pass cost an Expand — the scan is replicated x(#profiled columns) before
the partial aggregate, exactly like GROUPING SETS. That is the honest price
of exactness and is fine up to a handful of columns; for wide tables pass
``exact_distinct=False`` to use ``approx_count_distinct`` (HLL, single
pass, no Expand) — the oracle-checked form stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, *,
            exact_distinct: bool = True) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct, min_value,
    max_value) — min/max compared in the column's own type, reported as
    strings so one schema serves every column."""
    cols = list(cols) if cols is not None else list(df.columns)
    nd = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(c).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(report))


def k_anonymity(df: DataFrame, quasi_cols: list[str], *,
                k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple: every
    equivalence class (distinct quasi-column combination) with its
    size, whether it violates ``k`` (fewer than k rows share the
    combination, so a joiner with background knowledge narrows a
    target to < k candidates), and the re-identification risk 1/size.

    This is the release-gate complement to text-level PII scrubbing
    (operators/text.py::scrub_pii): scrubbing removes direct
    identifiers, this measures whether the REMAINING attribute
    combinations still single people out — the audit a training-data
    pipeline runs before shipping structured metadata columns.

    One groupBy on the quasi tuple (partial+final count, one shuffle
    keyed exactly like the release join would be); output is
    equivalence-class-cardinality sized, never row-sized.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_n"))
        .select(
            *quasi_cols, "group_n",
            (F.col("group_n") < k).alias("violates_k"),
            F.round(F.lit(1.0) / F.col("group_n"), 6)
            .alias("reident_risk"),
        )
    )


def l_diversity(df: DataFrame, quasi_cols: list[str],
                sensitive_col: str, *, l: int = 3) -> DataFrame:
    """l-diversity audit — k-anonymity's stronger sibling: a class
    whose rows all share one SENSITIVE value leaks that value even
    when the class is large (the homogeneity attack k-anonymity
    misses), so each quasi-identifier equivalence class must contain
    at least ``l`` distinct sensitive values.

    Same shuffle shape as :func:`k_anonymity` (one groupBy on the
    quasi tuple) with a distinct-count on the sensitive column; at
    scale the exact distinct is the cost — swap in
    approx_count_distinct when classes are huge and the audit
    threshold is far from the estimate error.

    Output per equivalence class: (quasi..., group_n, n_sensitive,
    violates_l).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_n"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .select(
            *quasi_cols, "group_n", "n_sensitive",
            (F.col("n_sensitive") < l).alias("violates_l"),
        )
    )


def t_closeness(df: DataFrame, quasi_cols: list[str],
                sensitive_col: str, *, t_num: int = 1,
                t_den: int = 5) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    skewness-attack check l-diversity misses: a class can contain
    l distinct sensitive values yet still leak (e.g. 99% of one rare
    value), so each quasi-identifier equivalence class's sensitive
    DISTRIBUTION must stay within ``t`` of the global distribution.
    For categorical sensitive attributes the distance is total
    variation: TVD = (1/2) * sum_v |c_v/n - C_v/N|.

    Determinism (plans/num.py discipline): the TVD numerator is the
    EXACT integer sum_v |c_v*N - C_v*n| (widened to decimal(38,0) —
    c*N overflows int64 near 1e9-row classes on a 1e12-row corpus, the
    value_corr lesson), the emitted tvd is that integer's ONE double
    division by 2*n*N, and the threshold test is a pure integer
    comparison num*t_den > 2*n*N*t_num — never a float-vs-float
    compare at the boundary.

    Scale shape: one shuffle on (quasi..., sensitive) builds the
    class-value counts; class sizes and the global value histogram are
    RE-AGGREGATIONS of that frame (no second scan); the class x value
    grid is a broadcast fan-out by the value-domain cardinality
    (dimension-bounded — sensitive attributes with huge domains should
    be bucketed first, as the registered query does), and the final
    per-class sum rides a groupBy on the quasi tuple.
    """
    d38 = "decimal(38,0)"
    cv = (
        df.groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    classes = cv.groupBy(*quasi_cols).agg(F.sum("_c").alias("_n"))
    glob = (
        cv.groupBy(sensitive_col).agg(F.sum("_c").alias("_gc"))
        .crossJoin(
            F.broadcast(
                cv.agg(F.sum("_c").alias("_tot"))))
    )
    grid = classes.crossJoin(F.broadcast(glob))  # classes x values
    terms = grid.join(cv, [*quasi_cols, sensitive_col], "left").select(
        *quasi_cols, "_n", "_tot",
        F.abs(
            F.coalesce(F.col("_c"), F.lit(0)).cast(d38) * F.col("_tot").cast(d38)
            - F.col("_gc").cast(d38) * F.col("_n").cast(d38)
        ).alias("_term"),
    )
    agg = terms.groupBy(*quasi_cols).agg(
        F.max("_n").alias("_n"),
        F.max("_tot").alias("_tot"),
        F.sum("_term").alias("_num"),
    )
    den = F.lit(2).cast(d38) * F.col("_n").cast(d38) * F.col("_tot").cast(d38)
    return agg.select(
        *quasi_cols,
        F.col("_n").cast("bigint").alias("group_n"),
        (F.col("_num").cast("double") / den.cast("double")).alias("tvd"),
        (F.col("_num") * F.lit(t_den).cast(d38)
         > den * F.lit(t_num).cast(d38)).alias("violates_t"),
    )


def dp_noisy_counts(df: DataFrame, group_cols: list[str], *,
                    epsilon: float = 1.0, threshold: float = 10.0,
                    salt: str = "dp:") -> DataFrame:
    """ε-differentially-private histogram release (Dwork et al. 2006):
    per-group counts + Laplace(1/ε) noise, then threshold suppression —
    the mechanism behind every "publish corpus composition stats
    without leaking membership" release, and the natural third stage
    after the k_anonymity / l_diversity / t_closeness AUDITS: those
    measure re-identification risk of the raw release, this produces a
    release whose risk is bounded by ε regardless of background
    knowledge (a unit count change moves any output's likelihood by at
    most e^ε). Suppressing noisy counts below ``threshold`` is the
    standard practice for rare groups, whose signal is mostly noise.

    Noise is DERIVED, not drawn (the reproducibility discipline of
    operators/sampling.py): u = hash-uniform(group key) in (0, 1],
    centered v = u - 0.5, noise = -(1/ε)·sign(v)·ln(1 - 2|v|) — the
    exact inverse CDF of Laplace(1/ε). A re-run (or a second engine)
    reproduces the identical release, so the noise cannot be averaged
    away by repeated queries — the release is computed ONCE per salt,
    which is the correct accounting posture (each fresh salt spends
    another ε of budget).

    Scale shape: one groupBy (partial+final count), then scalar math on
    the group-cardinality frame. Output: groups with noisy_count ≥
    threshold only, plus the noise parameters for the release card."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string")
                                for c in group_cols])
    h = F.md5(F.concat(F.lit(salt), key))
    u = (
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("double") + 1.0)
        / F.lit(float(1 << 24))
    )
    v = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(v)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(v))
    )
    noisy = (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("true_count"))
        .select(
            *group_cols,
            F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        )
    )
    return (
        noisy.where(F.col("noisy_count") >= threshold)
        .select(
            *group_cols, "noisy_count",
            F.lit(float(epsilon)).alias("epsilon"),
            F.lit(float(threshold)).alias("suppress_below"),
        )
    )
