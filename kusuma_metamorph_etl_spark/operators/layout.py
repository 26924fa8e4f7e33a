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
