"""Min-max z-order keys + compaction planning (operators/layout.py).
The quantile-bucketed clustering pass (`cluster_by_zorder`) is covered
by tests/test_plans.py's row-group-skipping test; this file covers the
oracle-replayable min-max key variant and the small-files planner."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators import layout


def _interleave2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_minmax_key_matches_reference_interleave(spark):
    """Full 16x16 grid: quantizing [0,15] to 4 bits is the identity, so
    the key must equal the hand-rolled Morton interleave everywhere."""
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r["__z"]
        for r in layout.zorder_minmax_key(df, ["x", "y"], bits=4).collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave2(x, y, 4)


def test_minmax_key_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError):
        layout.zorder_minmax_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError):
        layout.zorder_minmax_key(df, [], bits=8)


def test_minmax_key_preserves_rows_and_schema(spark, sf_small):
    part = spark.read.parquet(f"{sf_small}/part.parquet")
    z = layout.zorder_minmax_key(part, ["p_size", "p_retailprice"], bits=8)
    assert z.count() == part.count()
    assert set(z.columns) == set(part.columns) | {"__z"}


def test_minmax_key_top_value_clamped_and_constant_total(spark):
    # max value lands in the top bucket, not 2^bits; constant dim -> 0
    df = spark.createDataFrame([(0, 5), (10, 5), (20, 5)], "a int, b int")
    rows = {
        r.a: r["__z"]
        for r in layout.zorder_minmax_key(df, ["a", "b"], bits=2).collect()
    }
    # a: min 0 max 20 -> quantized 0,2,3 (20 clamps to 3); b constant -> 0
    assert rows == {0: _interleave2(0, 0, 2), 10: _interleave2(2, 0, 2),
                    20: _interleave2(3, 0, 2)}


def test_minmax_key_sorted_layout_clusters_both_dimensions(spark, sf_small):
    """Sorting by the min-max key must keep a narrow range on EITHER
    dimension inside a subset of partitions — the pruning property."""
    part = spark.read.parquet(f"{sf_small}/part.parquet")
    z = (
        layout.zorder_minmax_key(part, ["p_size", "p_retailprice"], bits=6)
        .repartitionByRange(8, "__z")
        .sortWithinPartitions("__z")
    )
    with_pid = z.withColumn("pid", F.spark_partition_id())
    n_parts = with_pid.select("pid").distinct().count()
    hits_size = (
        with_pid.filter(F.col("p_size").between(10, 14))
        .select("pid").distinct().count()
    )
    hits_price = (
        with_pid.filter(F.col("p_retailprice").between(910.0, 922.0))
        .select("pid").distinct().count()
    )
    assert n_parts >= 4
    assert hits_size < n_parts
    assert hits_price < n_parts


def test_compaction_plan_counts_and_ceils(spark):
    df = spark.createDataFrame(
        [("p1", "x" * 100)] * 50 + [("p2", "y" * 100)] * 3,
        "part string, payload string",
    )
    plan = layout.compaction_plan(
        df, "part", F.length("payload") + F.lit(16), target_bytes=2000
    )
    rows = {r.partition: r for r in plan.collect()}
    assert rows["p1"].n_rows == 50
    assert rows["p1"].est_bytes == 50 * 116
    assert rows["p1"].n_files == 3  # ceil(5800/2000)
    assert rows["p2"].n_files == 1  # minimum one file


def test_minmax_key_null_values_quantize_to_zero(spark):
    df = spark.createDataFrame(
        [(0, 1), (None, 2), (10, 3)], "a int, id int"
    )
    rows = {
        r.id: r["__z"]
        for r in layout.zorder_minmax_key(df, ["a"], bits=3).collect()
    }
    assert rows[2] == 0  # NULL -> bucket 0, never the top bucket
    assert rows[1] == 0 and rows[3] == 7


def test_compaction_plan_all_null_bytes_partition(spark):
    df = spark.createDataFrame(
        [("p1", None), ("p1", None)], "part string, nb int"
    )
    row = layout.compaction_plan(df, "part", F.col("nb"), 1000).collect()[0]
    assert row.est_bytes == 0 and row.n_files == 1


class TestZonemap:
    """File-level zone maps: footer-only stats, conservative pruning,
    and the z-order synergy (clustered layout prunes, natural doesn't)."""

    def _write(self, spark, sf_small, tmp_path, clustered: bool):
        li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
            "l_partkey", "l_suppkey", "l_quantity"
        )
        path = str(tmp_path / ("zed" if clustered else "plain"))
        if clustered:
            from kusuma_metamorph_etl_spark.operators.partitioning import (
                cluster_by_zorder,
            )

            cluster_by_zorder(
                li, ["l_partkey", "l_suppkey"], bits=4, num_files=16
            ).write.parquet(path)
        else:
            li.repartition(16).write.parquet(path)
        return li, path

    def test_pruned_read_equals_full_filter(self, spark, sf_small, tmp_path):
        li, path = self._write(spark, sf_small, tmp_path, clustered=True)
        ranges = {"l_partkey": (1.0, 20.0), "l_suppkey": (1.0, 5.0)}
        got = layout.zonemap_read(spark, path, ranges)
        expect = li.filter(
            F.col("l_partkey").between(1, 20) & F.col("l_suppkey").between(1, 5)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expect.collect())
        )

    def test_clustered_layout_prunes_natural_does_not(
        self, spark, sf_small, tmp_path
    ):
        _, zed = self._write(spark, sf_small, tmp_path, clustered=True)
        _, plain = self._write(spark, sf_small, tmp_path, clustered=False)
        pk_hi = (
            spark.read.parquet(zed).agg(F.max("l_partkey")).first()[0]
        )
        ranges = {"l_partkey": (1.0, float(pk_hi // 4))}
        zed_files = layout.prune_files(
            layout.build_zonemap(spark, zed, ["l_partkey"]), ranges
        )
        plain_files = layout.prune_files(
            layout.build_zonemap(spark, plain, ["l_partkey"]), ranges
        )
        assert len(plain_files) == 16  # natural layout: every file overlaps
        # clustered: the corner prunes a solid fraction.  RELATIVE bound,
        # not a fixed count: cluster_by_zorder's approxQuantile bucket
        # boundaries shift slightly with partition order (one boundary
        # file in or out run-to-run — observed 8 or 9 of 16), and the
        # property under test is "clustering prunes, natural doesn't",
        # not an exact file census.
        assert len(zed_files) <= 0.75 * len(plain_files)

    def test_missing_stats_column_keeps_file(self, spark, tmp_path):
        # an all-NULL column writes no min/max stats; pruning must KEEP
        # the file (conservative), and the residual filter still applies
        path = str(tmp_path / "nullstats")
        spark.createDataFrame(
            [(None, 1), (None, 2)], "a double, b int"
        ).coalesce(1).write.parquet(path)
        zm = layout.build_zonemap(spark, path, ["a"])
        row = zm.collect()[0]
        assert row.vmin is None and row.vmax is None
        assert len(layout.prune_files(zm, {"a": (0.0, 1.0)})) == 1
        assert layout.zonemap_read(spark, path, {"a": (0.0, 1.0)}).count() == 0

    def test_all_pruned_returns_empty_with_schema(self, spark, tmp_path):
        path = str(tmp_path / "small")
        spark.createDataFrame(
            [(1, "x"), (2, "y")], "k int, s string"
        ).coalesce(1).write.parquet(path)
        out = layout.zonemap_read(spark, path, {"k": (100.0, 200.0)})
        assert out.count() == 0
        assert set(out.columns) == {"k", "s"}

    def test_empty_ranges_rejected(self, spark, tmp_path):
        path = str(tmp_path / "e")
        spark.createDataFrame([(1,)], "k int").write.parquet(path)
        with pytest.raises(ValueError):
            layout.prune_files(layout.build_zonemap(spark, path, ["k"]), {})
