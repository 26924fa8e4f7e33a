"""quantile_bucket contract tests — determinism and invalid-value routing.

The bucket id must be a pure function of the value (SCALE.md: why this
exists instead of ``repartitionByRange``), nulls and NaN must land in the
sentinel bucket -1, and NaN in the data must never reach the Bucketizer
splits (non-increasing splits throw).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.partitioning import quantile_bucket


def _df(spark, values):
    return spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id long, x double")


def test_nan_routes_to_top_bucket_nulls_to_sentinel(spark):
    """NaN takes the bucket ABOVE every real value and NULL bucket -1 —
    the placements Spark's own ORDER BY uses (r8 review: folding NaN in
    with the nulls flipped its rank position in the descending walk)."""
    vals = [float(i) for i in range(100)] + [float("nan")] * 5 + [None] * 3
    df = _df(spark, vals)
    bucketed, n = quantile_bucket(df, "x", 4)
    rows = bucketed.collect()
    by_id = {r["id"]: r["__bkt"] for r in rows}
    for i in range(100, 105):  # NaN rows: one past the top real bucket
        assert by_id[i] == n
    for i in range(105, 108):  # null rows
        assert by_id[i] == -1
    # valid rows stay inside [0, n)
    assert all(0 <= by_id[i] < n for i in range(100))


def test_mostly_nan_column_does_not_throw(spark):
    """NaN-heavy columns put NaN into approxQuantile's result — it must be
    dropped from the splits rather than producing a broken Bucketizer."""
    vals = [float("nan")] * 50 + [1.0, 2.0, 3.0]
    df = _df(spark, vals)
    bucketed, n = quantile_bucket(df, "x", 4)
    assert n >= 1
    got = {r["id"]: r["__bkt"] for r in bucketed.collect()}
    assert all(got[i] == n for i in range(50))  # NaN: top bucket
    assert all(0 <= got[i] < n for i in (50, 51, 52))


def test_all_nan_column_single_bucket(spark):
    df = _df(spark, [float("nan")] * 10)
    bucketed, n = quantile_bucket(df, "x", 4)
    assert n == 1
    assert all(r["__bkt"] == n for r in bucketed.collect())  # NaN: top


def test_bucket_id_deterministic_across_recompute(spark):
    df = _df(spark, [float(i % 37) * 1.5 for i in range(500)])
    bucketed, _ = quantile_bucket(df, "x", 8)
    a = sorted((r["id"], r["__bkt"]) for r in bucketed.collect())
    b = sorted((r["id"], r["__bkt"]) for r in bucketed.collect())
    assert a == b


def test_integer_column_supported(spark):
    """isnan guard must not break non-fractional input columns."""
    df = spark.createDataFrame([(i, i % 13) for i in range(200)], "id long, x long")
    bucketed, n = quantile_bucket(df, "x", 4)
    assert bucketed.filter(F.col("__bkt") < 0).count() == 0
    assert 1 <= n <= 4 + 1


def test_dynamic_partition_pruning_fires_on_partitioned_fact(
    spark, sf_small, tmp_path
):
    """The 100 TB star-join behavior: a fact laid out partitionBy(key)
    must prune at RUNTIME from the dim side's filter (no literal predicate
    on the fact anywhere) — Catalyst's dynamic partition pruning inserts a
    dynamicpruning subquery into the scan's partition filters.  This is
    free ONLY if the layout partitions on the join key; the test pins
    that the engine's layout choice actually unlocks it."""
    fact_path = str(tmp_path / "fact")
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    orders.write.partitionBy("o_orderpriority").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("5-LOW", "cold")], ["o_orderpriority", "tier"]
    ).filter("tier = 'hot'")
    joined = fact.join(dim, on="o_orderpriority")
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan
    # and the result is the pruned slice only
    got = joined.count()
    want = orders.filter("o_orderpriority = '1-URGENT'").count()
    assert got == want > 0
