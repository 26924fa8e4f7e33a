"""[EXT] Robust statistics: per-group winsorization and IQR outlier
flagging.

Feature-pipeline hygiene ops: clamp heavy tails before scaling/training
(winsorize) and flag rows outside Tukey fences for quality review.  Both
run as one exact-percentile aggregation per group + one broadcastable
join back — group cardinality is the dimension cardinality (small), the
fact side streams through codegen untouched.

Percentiles use Spark's exact interpolated ``percentile`` (the DuckDB
mirror is ``quantile_cont``) — identical linear interpolation on the
sorted per-group values, so bounds agree cross-engine to float noise.
The scale path for HUGE group counts is the histogram sketch
(`operators/sketches.py`); these exact forms are for the usual case of
few groups × many rows, where Spark's percentile aggregate is a single
shuffle with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_quantiles(
    df: DataFrame, group_cols: list[str], value_col: str, probs: list[float]
) -> DataFrame:
    qcols = [
        F.expr(f"percentile({value_col}, {p})").alias(f"_q{i}")
        for i, p in enumerate(probs)
    ]
    return df.groupBy(*group_cols).agg(*qcols)


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp ``value_col`` into its per-group [lower, upper] exact
    percentile band; adds ``{value}_winsorized`` (original column kept)."""
    out = out_col or f"{value_col}_winsorized"
    bounds = _group_quantiles(df, group_cols, value_col, [lower, upper])
    v = F.col(value_col)
    return (
        df.join(F.broadcast(bounds), on=group_cols)
        .withColumn(
            out,
            F.when(v < F.col("_q0"), F.col("_q0"))
            .when(v > F.col("_q1"), F.col("_q1"))
            .otherwise(v),
        )
        .drop("_q0", "_q1")
    )


def iqr_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 1.5,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Tukey-fence outlier flag per group: outside
    [q1 − k·IQR, q3 + k·IQR] (k=1.5 is the classic fence; 3.0 flags
    only extremes).  Adds a boolean column; rows pass through."""
    bounds = _group_quantiles(df, group_cols, value_col, [0.25, 0.75])
    v = F.col(value_col)
    iqr = F.col("_q1") - F.col("_q0")
    return (
        df.join(F.broadcast(bounds), on=group_cols)
        .withColumn(
            flag_col,
            (v < F.col("_q0") - F.lit(k) * iqr)
            | (v > F.col("_q1") + F.lit(k) * iqr),
        )
        .drop("_q0", "_q1")
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift gate between a reference window and a
    current window (rule of thumb: < 0.1 stable, 0.1–0.2 drifting,
    > 0.2 action).  Returns one row: (psi, n_a, n_b, n_bins).

    Composed over the mergeable histogram sketch
    (`operators/sketches.py::histogram_sketch`) with SHARED bounds, so
    the same persisted daily sketches a quantile rollup keeps can feed
    drift monitoring without re-scanning raw data.  Bin proportions are
    Laplace-smoothed (+0.5 per bin) so empty bins cannot produce ±inf.

    Determinism contract: per-bin terms round to 9 dp and sum in exact
    decimal (the perplexity pattern) — engines agree exactly.
    """
    from kusuma_metamorph_etl_spark.operators.sketches import (
        derive_bounds,
        histogram_sketch,
    )

    if lo is None or hi is None:
        lo_a, hi_a = derive_bounds(df_a, value_col)
        lo_b, hi_b = derive_bounds(df_b, value_col)
        lo, hi = min(lo_a, lo_b), max(hi_a, hi_b)
    a = histogram_sketch(df_a, value_col, lo, hi, n_bins).withColumnRenamed(
        "n", "na"
    )
    b = histogram_sketch(df_b, value_col, lo, hi, n_bins).withColumnRenamed(
        "n", "nb"
    )
    # Full 0..n_bins-1 spine: the sketch emits only OBSERVED bins, but a
    # bin empty in BOTH snapshots still carries a nonzero smoothed term
    # whenever the totals differ — an a⟗b join silently dropped those
    # terms and understated the textbook all-bins PSI (r8 review).
    spine = (
        df_a.sparkSession.range(n_bins)
        .select(F.col("id").cast("int").alias("bin"))
    )
    joined = (
        spine.join(a, on="bin", how="left")
        .join(b, on="bin", how="left")
        .select(
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    totals = joined.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    smoothing = 0.5
    terms = joined.crossJoin(F.broadcast(totals)).select(
        "na",
        "nb",
        (
            (
                (F.col("na") + smoothing)
                / (F.col("ta") + smoothing * n_bins)
                - (F.col("nb") + smoothing) / (F.col("tb") + smoothing * n_bins)
            )
            * F.log(
                (
                    (F.col("na") + smoothing)
                    / (F.col("ta") + smoothing * n_bins)
                )
                / (
                    (F.col("nb") + smoothing)
                    / (F.col("tb") + smoothing * n_bins)
                )
            )
        ).alias("term"),
    )
    return terms.agg(
        F.round(
            F.sum(F.round(F.col("term"), 9).cast("decimal(38,9)")).cast("double"),
            6,
        ).alias("psi"),
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.lit(n_bins).alias("n_bins"),
    )


def psi_drift_categorical(
    df_a: DataFrame,
    df_b: DataFrame,
    cat_col: str,
) -> DataFrame:
    """PSI over a CATEGORICAL column (the numeric twin is
    :func:`psi_drift`): categories replace bins — the mix-shift monitor
    for language/source/status composition between snapshots.  Same
    Laplace smoothing over the union of observed categories and the same
    9-dp decimal term-sum determinism contract; returns one row
    (psi, n_a, n_b, n_categories)."""
    a = df_a.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("na")
    )
    b = df_b.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    joined = a.join(b, on="cat", how="full").select(
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    cats = joined.count()
    totals = joined.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    s = 0.5
    p = (F.col("na") + s) / (F.col("ta") + s * cats)
    q = (F.col("nb") + s) / (F.col("tb") + s * cats)
    terms = joined.crossJoin(F.broadcast(totals)).select(
        "na", "nb", ((p - q) * F.log(p / q)).alias("term")
    )
    return terms.agg(
        F.round(
            F.sum(F.round(F.col("term"), 9).cast("decimal(38,9)")).cast("double"),
            6,
        ).alias("psi"),
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.lit(cats).alias("n_categories"),
    )


def correlation_matrix(
    df: DataFrame, cols: list[str], round_to: int = 6
) -> DataFrame:
    """Pairwise Pearson correlations over ``cols`` in ONE aggregation
    pass → long-form ``(col_a, col_b, corr, n)`` for the k·(k−1)/2
    unordered pairs (col_a < col_b lexicographically) — the feature-
    redundancy screen run before training and the drift check run after
    (compose with the PSI gates above).

    One ``agg`` computes every pair's co-moments in a single scan
    (k²-bounded aggregate state, data read once — never k² scans);
    ``n`` is the pair's non-null-both count, NULL corr when a side is
    constant (Spark and SQL engines agree NULL, not NaN, after the
    round-trip).  Correlations are rounded so engines that accumulate
    co-moments in different orders agree exactly (`rate_anomaly`'s
    mean/std discipline).
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least two columns")
    pairs = [
        (a, b)
        for i, a in enumerate(sorted(cols))
        for b in sorted(cols)[i + 1 :]
    ]
    aggs = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        aggs.append(F.round(F.corr(a, b), round_to).alias(f"__r_{tag}"))
        aggs.append(
            F.count(
                F.when(F.col(a).isNotNull() & F.col(b).isNotNull(), 1)
            ).alias(f"__n_{tag}")
        )
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__r_{a}__{b}").alias("corr"),
            F.col(f"__n_{a}__{b}").alias("n"),
        )
        for a, b in pairs
    ]
    return wide.select(F.explode(F.array(*structs)).alias("r")).select(
        "r.col_a", "r.col_b", "r.corr", "r.n"
    )
