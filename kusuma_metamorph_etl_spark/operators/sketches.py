"""[EXT] Mergeable summary sketches beyond what Spark aggregates offer.

Spark's ``percentile_approx`` (Greenwald-Khanna) is accurate but its
state cannot be persisted and merged across pre-aggregations — the thing
a 100 TB pipeline actually needs: write a tiny sketch per (key, day) at
ingest, then answer any-range quantile queries by MERGING sketches
instead of re-scanning raw data (the same pattern `hll_sketch_agg` /
`hll_union_agg` give distinct counts, cf `agg_hll_mergeable`).

Measured merge-vs-rescan (sf0.1, local[32], median of 3 — the numbers
behind the claim): answering per-type distinct-users from a persisted
daily HLL rollup takes 0.25s (merge ~n_types×n_days sketch rows) vs
0.35s re-scanning all raw events exactly and 0.27s re-scanning with
``approx_count_distinct``.  At sf0.1 raw is only 100k rows so the gap
is modest; the point is the SHAPE — merge cost is bounded by the rollup
table (keys × days), rescan cost by raw volume, and the ratio widens
linearly with data size (at 100 TB the rollup stays MB-scale while the
rescan is the full corpus).  One-off rollup build+write: 4.3s.

The fixed-bin histogram sketch here is the simplest mergeable quantile
summary: merging is a bin-wise sum (associative, commutative), the
estimate error is bounded by one bin width, and the whole thing is plain
DataFrame ops — a (keys, bin, n) long-form table that parquet stores
RLE-compressed.  Trade-off versus t-digest/KLL: bounds must be known
up front and accuracy is uniform over the range rather than adaptive at
the tails; within those limits it is exact-cost-model, oracle-checkable,
and trivially mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derive_bounds(df: DataFrame, value_col: str) -> tuple[float, float]:
    """One global min/max aggregation deriving sketch bounds ``(lo, hi)``.

    The collect is a single row — driver-bounded by construction.  All
    sketches that will later be MERGED must share bounds, so derive them
    once over (a superset of) the union'd data and pass the result to
    every per-slice ``histogram_sketch`` build, not per-slice.
    """
    row = df.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    ).collect()[0]
    if row["lo"] is None:
        raise ValueError(
            f"derive_bounds: no non-null values in {value_col!r}; "
            "cannot derive histogram bounds"
        )
    lo, hi = float(row["lo"]), float(row["hi"])
    if lo == hi:
        hi = lo + 1.0  # degenerate single-value column: any width works
    return lo, hi


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float | None = None,
    hi: float | None = None,
    n_bins: int = 1000,
    keys: list[str] | None = None,
) -> DataFrame:
    """Fixed-bin histogram sketch: ``(keys..., bin, n)`` counts with
    values clamped into ``[lo, hi]`` (out-of-range mass lands in the edge
    bins — choose bounds generously).  When ``lo``/``hi`` are omitted they
    are derived by one extra min/max pass (``derive_bounds``); callers
    building sketches to merge later should derive bounds once themselves
    and pass the same pair to every build.  NULL values are excluded
    before binning (they are not "low" values; counting them in bin 0
    would skew low quantiles).  One map + one keyed count — a normal
    shuffle.
    """
    keys = keys or []
    df = df.filter(F.col(value_col).isNotNull())
    if lo is None or hi is None:
        lo, hi = derive_bounds(df, value_col)
    width = (hi - lo) / n_bins
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(*keys, bin_col.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histograms(
    sketches: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Merge sketches that share bounds/bins: bin-wise sum.  This is the
    whole point — any set of per-day/per-source sketches collapses into
    one without touching raw data."""
    keys = keys or []
    return sketches.groupBy(*keys, "bin").agg(F.sum("n").alias("n"))


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1000,
    keys: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a (merged) sketch: ``(keys..., q, est)``
    with linear interpolation inside the chosen bin; error ≤ one bin
    width by construction.

    Plan: one cumulative window per key over ≤ ``n_bins`` rows (bounded —
    this is sketch-sized, not data-sized), explode the probe quantiles,
    and pick each q's first bin with cumulative mass ≥ q·total via a
    min-struct aggregation.  Everything downstream of the sketch is
    sketch-cardinality work.
    """
    keys = keys or []
    width = (hi - lo) / n_bins
    w_cum = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bin")
    w_all = Window.partitionBy(*[F.col(k) for k in keys])
    cum = sketch.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "tot", F.sum("n").over(w_all)
    )
    probes = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    )
    hit = (
        probes.filter(F.col("cum") >= F.col("q") * F.col("tot"))
        .groupBy(*keys, "q")
        .agg(F.min(F.struct("bin", "cum", "n", "tot")).alias("s"))
    )
    frac = (
        F.col("s.tot") * F.col("q") - (F.col("s.cum") - F.col("s.n"))
    ) / F.col("s.n")
    est = F.lit(lo) + (F.col("s.bin") + frac) * F.lit(width)
    return hit.select(*keys, "q", est.alias("est"))


# ---------------------------------------------------------------- count-min


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    keys: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch as a long-form ``(keys..., d, slot, n)`` table:
    ``depth`` independent hash rows of ``width`` counters (Cormode &
    Muthukrishnan 2005).  Point-count estimates are never UNDER the true
    count and overshoot by at most ``ε·N`` (ε = e/width) with probability
    1 − e^−depth — the mergeable frequency summary for heavy-hitter
    tracking over pre-aggregated rollups.

    Build is one explode(depth) + keyed count; rows are hashed with
    ``xxhash64(value, d)`` so every engine/partitioning agrees.
    """
    keys = keys or []
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    F.xxhash64(F.col(value_col), F.lit(d)), F.lit(width)
                ).cast("int").alias("slot"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(*keys, F.explode(rows).alias("r"))
        .groupBy(*keys, "r.d", "r.slot")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_cms(sketches: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge compatible (same depth/width) sketches: counter-wise sum."""
    keys = keys or []
    return sketches.groupBy(*keys, "d", "slot").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-count estimates for every probe value: min over the sketch's
    ``depth`` counters at the value's hash slots.  The probe side fans out
    to ``depth`` rows and equi-joins the sketch on (keys, d, slot) —
    sketch-cardinality work; missing counters read as zero (a value the
    sketch never saw estimates 0, not null)."""
    keys = keys or []
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    F.xxhash64(F.col(value_col), F.lit(d)), F.lit(width)
                ).cast("int").alias("slot"),
            )
            for d in range(depth)
        ]
    )
    probe_rows = probes.select(*keys, value_col, F.explode(rows).alias("r")).select(
        *keys, value_col, "r.d", "r.slot"
    )
    return (
        probe_rows.join(sketch, on=[*keys, "d", "slot"], how="left")
        .groupBy(*keys, value_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est"))
    )


# --------------------------------------------------------- Misra–Gries top-k

def _mg_partition_summaries(
    df: DataFrame, item_col: str, k: int
) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ k (item, weight) counters
    per partition, maintained in bounded memory over Arrow batches.

    The MG decrement rule (new item with all k counters full → decrement
    every counter, drop zeros) guarantees a partition-local undercount of
    at most n_p/k per item; crucially any item with partition count
    > n_p/k SURVIVES the partition summary.
    """
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for batch in batches:
            for item in batch["__item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"__item": list(counters), "mg_count": list(counters.values())}
        )

    return df.select(F.col(item_col).cast("string").alias("__item")).mapInPandas(
        summarize, schema="__item string, mg_count long"
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 100,
    exact: bool = True,
) -> DataFrame:
    """All items with frequency > n/k, by Misra–Gries candidate generation
    + one exact verify pass — (item, n, n_total) with EXACT counts.

    The scale story vs plain ``groupBy(item).count()``: a full count
    shuffles every distinct item (billions, for tokens/URLs at 100 TB);
    MG summaries shuffle ≤ partitions × k rows.  Correctness: if an
    item's global count exceeds n/k = Σ n_p/k, then by pigeonhole its
    count exceeds n_p/k in at least one partition, so it survives that
    partition's summary — the candidate union provably contains every
    global heavy hitter (no false negatives; false positives are culled
    by the verify pass).  The verify pass counts ONLY candidate items
    (broadcast semi-join before the count), so its shuffle is
    candidate-bounded too.

    ``exact=False`` skips verification and returns summed MG lower
    bounds over the merged summaries (one tiny shuffle, no second data
    pass; counts may undercount by ≤ n/k — the telemetry-grade mode).
    """
    summaries = _mg_partition_summaries(df, item_col, k)
    merged = summaries.groupBy("__item").agg(F.sum("mg_count").alias("mg_count"))
    n_total = df.count()
    threshold = n_total / k
    if not exact:
        return merged.select(
            F.col("__item").alias(item_col),
            F.col("mg_count").alias("n"),
            F.lit(n_total).alias("n_total"),
        ).filter(F.col("n") > threshold)
    candidates = merged.select("__item")
    verified = (
        df.select(F.col(item_col).cast("string").alias("__item"))
        .join(F.broadcast(candidates), on="__item", how="left_semi")
        .groupBy("__item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
    )
    return verified.select(
        F.col("__item").alias(item_col), "n", F.lit(n_total).alias("n_total")
    )
