"""[EXT] Data-layout planning: min-max z-order keys and small-file
compaction targets.

The CLUSTERING pass itself lives in :mod:`operators.partitioning`
(`cluster_by_zorder`: quantile-bucketized dims → `zorder_value`
interleave → range-partition + sort, plan-tested for row-group
skipping).  This module adds the two planning pieces around it:

* :func:`zorder_minmax_key` — the FIXED-WIDTH (min-max) quantizer
  variant of the z-key.  Quantile buckets adapt to data skew (better
  balance) but their boundaries come from ``approxQuantile`` — fine for
  layout, impossible to replay in another engine.  Min-max quantization
  is a closed-form expression, so the key is verifiable bit-for-bit by
  the DuckDB oracle (`layout_zorder`) and stable across engines — the
  variant to use when the key is PERSISTED (e.g. as a clustering column
  other writers must reproduce).
* :func:`compaction_plan` — the small-files planner: per-partition size
  estimates and the file count a writer should coalesce to for a target
  file size, i.e. the ``repartition(n)`` decision a nightly compaction
  job makes before rewriting a partition.

Cited parity: the reference writes snapshot directories with whatever
layout its task partitioning happens to produce (`ingestion_task.py`);
these operators exist for the 100 TB target where scan pruning and file
counts are first-class knobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.partitioning import zorder_value


def minmax_quantize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Fixed-width quantization to [0, 2^bits): floor((x-mn)/(mx-mn) *
    2^bits) clamped at the top (x == mx lands on 2^bits otherwise).  A
    constant column (mx == mn) quantizes to 0 everywhere — degenerate
    but total.  Closed-form double arithmetic, reproducible in any
    engine — the property :func:`zorder_minmax_key`'s oracle needs."""
    n = 1 << bits
    scaled = F.floor(
        (col.cast("double") - mn)
        / F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        * n
    )
    # NULL values (or an all-NULL column making mn/mx NULL) quantize to
    # bucket 0 EXPLICITLY: Spark's least() skips NULLs (a NULL would
    # otherwise land in the TOP bucket), DuckDB's differs — coalescing
    # on both sides keeps the oracle and the engine bit-identical.
    return F.least(F.coalesce(scaled, F.lit(0)), F.lit(n - 1)).cast("long")


def zorder_minmax_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_col: str = "__z"
) -> DataFrame:
    """Attach the min-max-quantized z-order key for ``cols``: one tiny
    global min/max aggregate (broadcast back), then
    :func:`partitioning.zorder_value`'s shift/mask interleave — pure JVM
    expressions, no UDF.  Key width = bits * len(cols) ≤ 63.  Callers
    that want the physical layout follow with ``repartitionByRange(
    key_col).sortWithinPartitions(key_col)`` (or use
    ``cluster_by_zorder`` for skew-adaptive buckets)."""
    if not cols:
        raise ValueError("zorder_minmax_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError("bits * dimensions must fit a signed 64-bit key")
    stats = df.agg(
        *[
            F.min(F.col(c).cast("double")).alias(f"__mn_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(F.col(c).cast("double")).alias(f"__mx_{i}")
            for i, c in enumerate(cols)
        ],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    qs = [
        minmax_quantize(F.col(c), F.col(f"__mn_{i}"), F.col(f"__mx_{i}"), bits)
        for i, c in enumerate(cols)
    ]
    return with_stats.withColumn(key_col, zorder_value(qs, bits)).drop(
        *[f"__mn_{i}" for i in range(len(cols))],
        *[f"__mx_{i}" for i in range(len(cols))],
    )


def compaction_plan(
    df: DataFrame,
    partition_col: str,
    row_bytes: Column,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Per-partition compaction targets: ``(partition, n_rows, est_bytes,
    n_files)`` with ``n_files = ceil(est_bytes / target_bytes)`` (min 1).
    ``row_bytes`` is a per-row size-estimate expression (e.g. fixed
    widths + ``length`` of the variable columns) — cheap and good enough
    to kill the small-files problem; exact on-disk size depends on
    encoding and is not needed for a file-count decision.  One groupBy,
    output is partition-cardinality-sized."""
    return (
        df.groupBy(F.col(partition_col).alias("partition"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            # coalesce: a partition whose every row_bytes is NULL must
            # plan 0 bytes / 1 file, not propagate NULL into the ceil
            F.coalesce(F.sum(row_bytes), F.lit(0)).cast("long").alias(
                "est_bytes"
            ),
        )
        .withColumn(
            "n_files",
            F.greatest(
                F.ceil(F.col("est_bytes") / F.lit(float(target_bytes))),
                F.lit(1),
            ).cast("long"),
        )
    )


ZONEMAP_SCHEMA = "file string, column string, vmin double, vmax double, n_nulls long"


def build_zonemap(spark, path: str, cols: list[str]) -> DataFrame:
    """File-level zone map (min/max/null-count per numeric column per
    parquet file) read from the FOOTERS — no data pages touched.  The
    file list fans out to executors and each footer is read with
    pyarrow, so building the map over a million-file table is one narrow
    distributed pass of metadata-sized work.

    This is the scan-layer complement of :func:`zorder_minmax_key`:
    clustering gives files tight min/max boxes, the zone map makes those
    boxes queryable WITHOUT opening files.  (Table formats persist
    exactly these stats in their manifests — Iceberg/Delta file stats;
    this operator is the engine-local equivalent for plain parquet
    directories, and the listing below comes from a directory glob —
    production tables would enumerate from the format's manifest
    instead of the filesystem.)"""
    import glob as _glob

    files = sorted(_glob.glob(f"{path}/*.parquet"))
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    paths = spark.createDataFrame([(f,) for f in files], "file string")
    want = list(cols)

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for batch in batches:
            rows = []
            for f in batch["file"]:
                meta = pq.ParquetFile(f).metadata
                # per column: [lo, hi, nulls], or None once ANY row group
                # lacks stats (the whole file's bounds become unknown —
                # a partial box would let pruning drop a possible match)
                agg: dict = {}
                statless: set = set()
                for rg in range(meta.num_row_groups):
                    md = meta.row_group(rg)
                    for i in range(md.num_columns):
                        col = md.column(i)
                        name = col.path_in_schema
                        if name not in want or name in statless:
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            statless.add(name)
                            agg.pop(name, None)
                            continue
                        lo, hi = float(st.min), float(st.max)
                        nn = int(st.null_count or 0)
                        cur = agg.get(name)
                        if cur is None:
                            agg[name] = [lo, hi, nn]
                        else:
                            cur[0] = min(cur[0], lo)
                            cur[1] = max(cur[1], hi)
                            cur[2] += nn
                for name in want:
                    cur = agg.get(name)
                    rows.append(
                        (f, name, *(cur if cur else (None, None, None)))
                    )
            yield pd.DataFrame(
                rows, columns=["file", "column", "vmin", "vmax", "n_nulls"]
            )

    return paths.mapInPandas(read_footers, schema=ZONEMAP_SCHEMA)


def prune_files(
    zonemap: DataFrame, ranges: dict[str, tuple[float, float]]
) -> list[str]:
    """File paths whose zones OVERLAP every queried range — conservative
    (a file with missing/statless bounds is kept; pruning must never
    drop a possible match).  The collect is file-cardinality-bounded
    metadata, the same size class as Spark's own partition pruning."""
    if not ranges:
        raise ValueError("prune_files needs at least one column range")
    surviving = None
    for col, (lo, hi) in ranges.items():
        keep = zonemap.filter(
            (F.col("column") == col)
            & (
                F.col("vmin").isNull()
                # NaN bounds (a writer that kept stats on an all-NaN
                # double column) compare false against everything and
                # would WRONGLY prune — treat them as unknown, keep
                | F.isnan("vmin")
                | ((F.col("vmax") >= lo) & (F.col("vmin") <= hi))
            )
        ).select("file")
        surviving = keep if surviving is None else surviving.join(keep, "file", "left_semi")
    return sorted(r["file"] for r in surviving.distinct().collect())


def zonemap_read(
    spark, path: str, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Read only the files whose zones can contain rows in ``ranges``,
    then apply the exact predicate (zone pruning is conservative, the
    residual filter is still required).  Returns an EMPTY frame with the
    table's schema when every file prunes away."""
    zm = build_zonemap(spark, path, list(ranges))
    files = prune_files(zm, ranges)
    full_schema = spark.read.parquet(path).schema
    if not files:
        return spark.createDataFrame([], full_schema)
    df = spark.read.schema(full_schema).parquet(*files)
    cond = None
    for col, (lo, hi) in ranges.items():
        c = F.col(col).between(lo, hi)
        cond = c if cond is None else cond & c
    return df.filter(cond)
