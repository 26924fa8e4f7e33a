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

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derive_bounds(df: DataFrame, value_col: str) -> tuple[float, float]:
    """One global min/max aggregation deriving sketch bounds ``(lo, hi)``.

    The collect is a single row — driver-bounded by construction.  All
    sketches that will later be MERGED must share bounds, so derive them
    once over (a superset of) the union'd data and pass the result to
    every per-slice ``histogram_sketch`` build, not per-slice.

    NaN values are excluded: Spark's ``max`` sorts NaN above every real
    number, so one NaN row would otherwise make ``hi = NaN``, collapse
    the bin width to NaN, and turn every quantile estimate into NaN
    (same trap `partitioning.quantile_bucket` documents).
    """
    v = F.col(value_col).cast("double")
    row = df.filter(~F.isnan(v)).agg(
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    ).collect()[0]
    if row["lo"] is None:
        raise ValueError(
            f"derive_bounds: no non-null, non-NaN values in {value_col!r}; "
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
    and pass the same pair to every build.  NULL and NaN values are
    excluded before binning (they are not "low" values; counting them in
    bin 0 would skew low quantiles, and a NaN would otherwise ride
    Spark's NaN-is-largest sort into the top bin).  One map + one keyed
    count — a normal shuffle.
    """
    keys = keys or []
    df = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double"))
    )
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
        n_part = 0
        for batch in batches:
            n_part += len(batch)
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
        # one TOTAL row per partition (n_part set, counters null): the
        # consumer folds Σ n_part into n_total without a second scan of
        # the data (r9 review — heavy_hitters ran a full count() pass
        # just for the threshold).  Distinguished by n_part's nullity,
        # NOT an __item sentinel: data nulls legitimately produce a
        # null-__item COUNTER row.
        yield pd.DataFrame(
            {
                "__item": list(counters) + [None],
                "mg_count": list(counters.values()) + [None],
                "n_part": [None] * len(counters) + [n_part],
            }
        )

    return df.select(F.col(item_col).cast("string").alias("__item")).mapInPandas(
        summarize, schema="__item string, mg_count long, n_part long"
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

    ``exact=False`` skips verification and returns the FULL candidate
    set with summed MG lower bounds (one tiny shuffle, ONE data pass;
    counts may undercount by ≤ n/k — the telemetry-grade mode).  The
    candidate set is a guaranteed SUPERSET of the true heavy hitters,
    deliberately UNFILTERED: thresholding the lower bounds at n/k would
    silently drop a true heavy hitter whose counters undercount below
    the line (r9 review) — callers threshold after their own exact
    verify, exactly like :func:`streaming.sink.merged_heavy_hitters`.

    One scan in approx mode, two in exact mode (summaries + verify) —
    n_total rides along as per-partition total rows inside the summary
    frame (``_mg_partition_summaries``), and the bounded summary frame
    is shared across its consumers via a lazy localCheckpoint
    (≤ partitions × (k+1) rows — the cheap side of the SCALE.md
    cache-lifetime policy), so no third scan computes the count.
    """
    if k < 1:
        # fail fast: a non-positive k makes the frequency-> n/k threshold
        # meaningless and silently returned an empty frame (r17 edge sweep)
        raise ValueError(f"heavy_hitters: k must be >= 1, got {k}")
    summaries = _mg_partition_summaries(df, item_col, k).localCheckpoint(
        eager=False
    )
    merged = (
        summaries.filter(F.col("n_part").isNull())
        .groupBy("__item")
        .agg(F.sum("mg_count").alias("mg_count"))
    )
    n_total = summaries.agg(F.sum("n_part")).collect()[0][0] or 0
    threshold = n_total / k
    if not exact:
        return merged.select(
            F.col("__item").alias(item_col),
            F.col("mg_count").alias("n"),
            F.lit(n_total).alias("n_total"),
        )
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


# ------------------------------------------------------------------- Bloom

def bloom_sketch(
    df: DataFrame,
    value_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    keys: list[str] | None = None,
) -> DataFrame:
    """Mergeable Bloom membership sketch as a packed ``(keys..., word,
    bits)`` bitset table: ``n_bits`` bits stored as ≤ ``n_bits/64`` long
    words (Bloom 1970).  A value sets ``n_hashes`` bit positions
    ``xxhash64(value, j) mod n_bits``; membership tests read the same
    positions.  Zero false negatives by construction; false-positive
    rate ≈ (1 − e^{−kn/m})^k — size ``n_bits`` ≈ 10 bits per expected
    distinct value for ~1% FP at ``n_hashes=5``.

    The build is one narrow explode to (word, bit) pairs + one keyed
    ``bit_or`` aggregation — the shuffle carries at most
    ``n_hashes × rows`` tiny pairs and the OUTPUT is sketch-sized
    (≤ n_bits/64 rows) regardless of data volume.  Like the HLL /
    histogram / CMS families above, per-slice sketches merge without
    rescanning raw data (:func:`merge_bloom` — bit-wise OR is
    associative/commutative/idempotent, so re-merging a slice is
    harmless).
    """
    if n_bits < 1 or n_hashes < 1:
        # fail fast: n_bits=0 dies mid-execution with a cryptic ANSI
        # REMAINDER_BY_ZERO, negative n_bits emits garbage negative
        # words, and n_hashes=0 silently builds an EMPTY sketch whose
        # probes would FALSE-NEGATIVE — the one error a Bloom filter
        # must never make (r17 edge sweep)
        raise ValueError(
            f"bloom_sketch: n_bits and n_hashes must be >= 1, got "
            f"n_bits={n_bits}, n_hashes={n_hashes}"
        )
    keys = keys or []
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(value_col), F.lit(j)), F.lit(n_bits))
            for j in range(n_hashes)
        ]
    )
    pos = F.explode(positions).alias("pos")
    return (
        df.select(*keys, pos)
        .select(
            *keys,
            F.shiftright("pos", 6).alias("word"),
            # SQL shiftleft takes a column bit count; the Python wrapper
            # only accepts an int literal.
            F.expr("shiftleft(1L, int(pos % 64))").alias("bit"),
        )
        .groupBy(*keys, "word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def merge_bloom(sketches: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge compatible (same ``n_bits``/``n_hashes``) sketches: word-wise
    bit-OR.  Any set of per-day/per-source filters collapses into one
    without touching raw data."""
    keys = keys or []
    return sketches.groupBy(*keys, "word").agg(F.bit_or("bits").alias("bits"))


# Above this many 64-bit words (512 KB) the bitset ships as a broadcast
# variable + Arrow-batched membership UDF; at or below it the bitset is a
# single array<bigint> plan literal and the whole test is native
# getbit/element_at expressions inside the scan's codegen span (r18,
# guide §4.1).  The cutoff is a shipping-cost bound, not a tuning knob:
# a plan literal rides the per-stage task binary and the explain text,
# so a 16 MB `bloom_params_for`-capped bitset stays on the broadcast
# path, while every query-scale sketch (1 M bits = 16 K words) probes
# with zero Python boundary.
_NATIVE_BITSET_MAX_WORDS = 1 << 16


def bloom_probe(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    out: str = "maybe_present",
) -> DataFrame:
    """Membership test for every probe row: ``out`` is true iff ALL
    ``n_hashes`` bit positions of the value are set in the (merged,
    key-free) sketch.  True can be a false positive (bounded by the
    sketch's FP rate); false is DEFINITIVE absence — which is why the
    canonical use is :func:`bloom_prefilter_join`-style scan pruning
    where the exact join afterwards removes the false positives.

    Plan: the sketch is collected once (bounded by construction:
    ≤ ``n_bits/64`` rows — 16 K longs for 1 M bits, a 128 KB bitset);
    probe positions are computed JVM-side with the SAME ``xxhash64``
    expressions as the build (so build/probe hashing cannot drift).  Up
    to ``_NATIVE_BITSET_MAX_WORDS`` the bit tests are native
    ``getbit(element_at(bitset, pos >> 6), pos & 63)`` expressions over
    an ``array<bigint>`` literal — whole-stage-codegen'd, no Python
    boundary at all (r18: the pandas-UDF test cost one Arrow round-trip
    per fact row; `agg_bloom_join`'s two ArrowEvalPython nodes are
    gone).  Larger bitsets keep the broadcast numpy array + Arrow UDF —
    a multi-MB literal would bloat every stage's task binary.  Either
    way there is no shuffle on the probe side — the probe is a narrow
    map, exactly what a scan pre-filter must be.
    """
    return probes.withColumn(
        out, _bloom_member_column(probes, sketch, value_col, n_bits, n_hashes)
    )


def _bloom_member_column(
    probes: DataFrame,
    sketch: DataFrame,
    value_col: str,
    n_bits: int,
    n_hashes: int,
):
    """The membership test as a bare Column — shared by
    :func:`bloom_probe` (withColumn contract) and
    :func:`bloom_prefilter_join`, which applies it DIRECTLY as a filter
    predicate: `withColumn(out).filter(out)` makes the optimizer push a
    duplicated copy of the whole expression (literal included) below
    the projection — the §4.4 duplication shape, one extra copy of the
    up-to-512KB bitset literal in the plan (r19, plan-verified)."""
    n_words = (n_bits + 63) >> 6
    # Driver budget note (VERDICT r18 #4): this collect is bounded by
    # construction at n_bits/64 longs — 16 MB at the bloom_params_for
    # cap, far under spark.driver.maxResultSize — but it IS a per-call
    # driver round-trip on a scan-prefilter path; callers probing many
    # sketches per job should persist/reuse the collected words rather
    # than re-collect per probe.
    collected = sketch.select("word", "bits").collect()

    def position(j: int):
        return F.pmod(F.xxhash64(F.col(value_col), F.lit(j)), F.lit(n_bits))

    if n_words <= _NATIVE_BITSET_MAX_WORDS:
        words = [0] * n_words
        for row in collected:
            words[int(row["word"])] = int(row["bits"])
        # One server-side parse of the whole array literal.  F.lit(words)
        # would round-trip py4j once PER ELEMENT (~1.3 ms each — 20 s for
        # a 16 K-word bitset, measured r18); the SQL parser ingests the
        # same array in ~10 ms and constant-folds it to one Literal.
        bitset = F.expr(
            "array(" + ",".join(f"{w}L" for w in words) + ")"
        )
        # Reference the (up to 512 KB) array literal exactly ONCE
        # (ADVICE r18): a per-hash conjunct chain carries one copy of
        # the literal per conjunct through the optimized plan and the
        # serialized task binary (Catalyst tree transforms copy shared
        # subtrees), so the shipping-cost rationale behind
        # _NATIVE_BITSET_MAX_WORDS held only for a single copy.  forall
        # over the positions array keeps the whole membership test one
        # expression with one literal; the lambda body stays
        # JVM-native (no Python boundary — the HOF evaluates via
        # interpreted eval rather than whole-stage codegen, and still
        # WINS: interleaved fresh-JVM A/B on agg_bloom_join at sf0.1
        # read 0.64x min / 3x3 reps vs the 5-copy conjunct chain —
        # the duplicated literal cost more than codegen saved).
        positions = F.array(*[position(j) for j in range(n_hashes)])
        member = F.forall(
            positions,
            lambda p: F.getbit(
                F.element_at(bitset, F.shiftright(p, 6).cast("int") + 1),
                (p % 64).cast("int"),
            )
            == 1,
        )
        return member

    import numpy as np

    words_np = np.zeros(n_words, dtype=np.uint64)
    for row in collected:
        words_np[int(row["word"])] = np.uint64(
            int(row["bits"]) & 0xFFFFFFFFFFFFFFFF
        )
    bc = probes.sparkSession.sparkContext.broadcast(words_np)

    @F.pandas_udf("boolean")
    def member_udf(pos_lists: pd.Series) -> pd.Series:
        w = bc.value
        mat = np.array(pos_lists.tolist(), dtype=np.int64)
        if mat.size == 0:
            return pd.Series([], dtype=bool)
        hit = (w[mat >> 6] >> (mat & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    positions = F.array(*[position(j) for j in range(n_hashes)])
    return member_udf(positions)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a Bloom pre-filter on the fact side: build a sketch
    of the dim keys, drop fact rows whose key is DEFINITELY absent, then
    run the exact join.  Result is identical to the plain join (no false
    negatives; false positives die in the join) — the sketch only cuts
    the fact-side shuffle volume.

    This is the hand-rolled twin of Spark's own runtime-filter pushdown
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), materialized
    at the API level so the filter can also be PERSISTED and reused
    across runs (a daily job probing the same slowly-changing dim should
    build the sketch once, not per query).  Worth it when the dim is too
    big to broadcast but its key set is sketchable (1 M keys ≈ 160 KB at
    10 bits/key); for broadcast-sized dims just broadcast the join —
    measured at sf0.1 (3-rep median, noop sink): plain broadcast join
    0.49s vs 1.30s through the sketch, i.e. at test scale the build+probe
    overhead LOSES and the operator's value is strictly the
    non-broadcastable-dim regime plus sketch reuse across runs.

    ``how`` is restricted to ``inner``/``left_semi``: for left/outer
    joins the pre-filter would drop fact rows with no dim match that the
    plain join keeps with NULLs, breaking the identical-result contract
    (ADVICE r7).
    """
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            "bloom_prefilter_join preserves plain-join equivalence only for "
            f"inner/left_semi joins, got how={how!r} — left/outer joins keep "
            "unmatched fact rows the pre-filter would drop"
        )
    sketch = bloom_sketch(dim.select(on), on, n_bits, n_hashes)
    # Filter DIRECTLY on the membership expression: the old
    # withColumn("__maybe").filter(...).drop(...) shape made the
    # optimizer push a second full copy of the expression — bitset
    # literal included — below the projection (§4.4 duplication;
    # plan-verified: forall/getbit now appear exactly once).
    kept = fact.filter(
        _bloom_member_column(fact, sketch, on, n_bits, n_hashes)
    )
    return kept.join(dim, on=on, how=how)


# ------------------------------------------------------------ KMV (theta)

def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    keys: list[str] | None = None,
) -> DataFrame:
    """K-minimum-values distinct sketch as a long-form ``(keys..., h)``
    table: the ``k`` smallest distinct ``xxhash64`` values per key group
    (Bar-Yossef et al. 2002; the theta-sketch family).  What it buys over
    HLL: the retained hash SAMPLE supports set INTERSECTION estimates
    (:func:`kmv_intersect`) — HLL unions beautifully but cannot
    intersect without inclusion-exclusion error blowup.

    Build: hash (narrow map) → distinct → TWO-LEVEL bottom-k: a salted
    pre-reduction (bottom-k per (key, h mod n_salts) slice) bounds every
    sort task at distinct/n_salts rows, then the global bottom-k runs
    over ≤ n_salts·k pre-reduced rows per key — a naive single window
    would sort a key's ENTIRE distinct set in one task, the classic
    hot-key trap for billion-cardinality columns.  Bottom-k of bottom-k's
    is bottom-k, so the reduction is exact, and the same property makes
    per-day sketches roll up without rescanning raw data
    (:func:`merge_kmv`).
    """
    keys = keys or []
    hashed = (
        df.select(*keys, F.xxhash64(F.col(value_col)).alias("h"))
        .distinct()
    )
    pre = _bottom_k(hashed, k, [*keys, F.pmod("h", F.lit(64))])
    return _bottom_k(pre, k, list(keys))


def _bottom_k(frame: DataFrame, k: int, part_cols: list) -> DataFrame:
    w = Window.partitionBy(*part_cols).orderBy("h")
    return (
        frame.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def merge_kmv(
    sketches: DataFrame, k: int = 256, keys: list[str] | None = None
) -> DataFrame:
    """Merge compatible (same k) sketches: union → distinct → bottom-k
    per key again (inputs are already ≤ k rows per key per slice, so no
    salting needed).  Associative and idempotent."""
    keys = keys or []
    return _bottom_k(sketches.select(*(keys or []), "h").distinct(), k, list(keys))


def kmv_distinct(
    sketch: DataFrame, k: int = 256, keys: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimates from a KMV sketch: ``(keys..., est)``.

    With fewer than k retained hashes the sketch IS the distinct set —
    the count is exact.  Otherwise the k-th smallest hash estimates the
    sampled fraction θ of hash space and est = (k−1)/θ (the unbiased
    KMV estimator; relative error ~ 1/√(k−2)).  Hash values map to
    (0,1) via the signed-long affine shift — all column arithmetic,
    sketch-cardinality work.
    """
    keys = keys or []
    two63 = float(1 << 63)
    two64 = float(1 << 64)
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"), F.max("h").alias("__hmax")
    )
    theta = (F.col("__hmax").cast("double") + F.lit(two63)) / F.lit(two64)
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )
    return agg.select(*keys, F.round(est, 6).alias("est"))


def kmv_intersect(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """Set-INTERSECTION cardinality estimate from two key-free KMV
    sketches — the query HLL cannot answer.  Single-row output
    ``(est_a, est_b, est_union, est_intersection)``.

    Standard theta-sketch combination: form the union sketch (bottom-k
    of A ∪ B), count how many of its hashes appear in BOTH inputs (ρ),
    then |A∩B| ≈ ρ/k · |A∪B|̂ — the union sketch is a uniform hash
    sample of A∪B, so the fraction of its members lying in the
    intersection transfers.  Everything is sketch-cardinality joins;
    raw data is never touched.
    """
    a = sketch_a.select("h").distinct()
    b = sketch_b.select("h").distinct()
    union_sk = merge_kmv(a.unionByName(b), k)
    both = a.join(b, on="h", how="left_semi")
    in_both = union_sk.join(both, on="h", how="left_semi")
    est_a = kmv_distinct(a, k).select(F.col("est").alias("est_a"))
    est_b = kmv_distinct(b, k).select(F.col("est").alias("est_b"))
    est_u = kmv_distinct(union_sk, k).select(F.col("est").alias("est_union"))
    counts = (
        union_sk.agg(F.count(F.lit(1)).alias("__ku"))
        .crossJoin(in_both.agg(F.count(F.lit(1)).alias("__rho")))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(counts)
        .select(
            "est_a",
            "est_b",
            "est_union",
            # guard the empty-union degenerate case (both inputs empty):
            # 0 intersection, not a division-by-zero
            F.when(
                F.col("__ku") > 0,
                F.round(
                    F.col("__rho") / F.col("__ku") * F.col("est_union"), 6
                ),
            ).otherwise(F.lit(0.0)).alias("est_intersection"),
        )
    )


def kmv_difference(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """Set-DIFFERENCE cardinality estimate |A \\ B| from two key-free
    KMV sketches — completes the theta-sketch algebra next to
    :func:`kmv_intersect` (union / intersection / difference are the
    three ops the Apache DataSketches theta family exposes).  Single-row
    ``(est_a, est_b, est_union, est_difference)``.

    Same transfer argument as the intersection: the union sketch is a
    uniform hash sample of A ∪ B, so the fraction of its members lying
    in A but not B estimates |A \\ B| / |A ∪ B|.  Everything is
    sketch-cardinality joins; raw data is never touched.
    """
    a = sketch_a.select("h").distinct()
    b = sketch_b.select("h").distinct()
    union_sk = merge_kmv(a.unionByName(b), k)
    only_a = a.join(b, on="h", how="left_anti")
    in_diff = union_sk.join(only_a, on="h", how="left_semi")
    est_a = kmv_distinct(a, k).select(F.col("est").alias("est_a"))
    est_b = kmv_distinct(b, k).select(F.col("est").alias("est_b"))
    est_u = kmv_distinct(union_sk, k).select(F.col("est").alias("est_union"))
    counts = union_sk.agg(F.count(F.lit(1)).alias("__ku")).crossJoin(
        in_diff.agg(F.count(F.lit(1)).alias("__rho"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(counts)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.when(
                F.col("__ku") > 0,
                F.round(
                    F.col("__rho") / F.col("__ku") * F.col("est_union"), 6
                ),
            ).otherwise(F.lit(0.0)).alias("est_difference"),
        )
    )
