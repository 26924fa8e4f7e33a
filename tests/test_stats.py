"""Robust stats: winsorize clamps, IQR flags, broadcast-join plan."""

from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.stats import iqr_outliers, winsorize


def _df(spark):
    rows = [("g", float(v)) for v in range(1, 21)] + [("g", 1000.0)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_winsorize_clamps_tails_only(spark):
    # values 1..20 plus an outlier 1000; with lower=0, upper=0.9 the top
    # tail clamps to the exact interpolated 90th percentile of 21 values
    out = {  # noqa: C416
        (r["v"], r["v_winsorized"])
        for r in winsorize(_df(spark), ["k"], "v", lower=0.0, upper=0.9).collect()
    }
    # 90th percentile of sorted values (1..20, 1000): index 0.9*20 = 18 → 19.0
    assert (1000.0, 19.0) in out
    assert (5.0, 5.0) in out  # interior untouched
    assert (1.0, 1.0) in out  # lower=0 keeps the minimum


def test_iqr_outliers_flags_planted_value(spark):
    got = {r["v"]: r["is_outlier"] for r in iqr_outliers(_df(spark), ["k"], "v").collect()}
    assert got[1000.0] is True
    assert sum(got.values()) == 1  # only the planted point trips the fence


def test_bounds_join_is_broadcast(spark):
    plan = winsorize(_df(spark), ["k"], "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
