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


# ---------------------------------------------------------------- PSI drift

def test_psi_drift_zero_for_identical_and_large_for_shifted(spark):
    import math

    from kusuma_metamorph_etl_spark.operators.stats import psi_drift

    a = spark.createDataFrame([(float(i % 100),) for i in range(2000)], ["v"])
    same = psi_drift(a, a, "v", n_bins=10).collect()[0]
    assert same["psi"] == 0.0  # identical distributions → exactly zero terms
    assert same["n_a"] == same["n_b"] == 2000

    # hard shift: mass moves to the top of the range
    b = spark.createDataFrame([(float(60 + i % 40),) for i in range(2000)], ["v"])
    shifted = psi_drift(a, b, "v", n_bins=10).collect()[0]
    assert shifted["psi"] > 0.2  # "action" territory
    assert math.isfinite(shifted["psi"])  # empty bins smoothed, no inf


def test_psi_drift_matches_hand_computation(spark):
    import math

    from kusuma_metamorph_etl_spark.operators.stats import psi_drift

    # 2 bins over [0, 2): a = 8 low + 2 high, b = 5 low + 5 high
    a = spark.createDataFrame([(0.5,)] * 8 + [(1.5,)] * 2, ["v"])
    b = spark.createDataFrame([(0.5,)] * 5 + [(1.5,)] * 5, ["v"])
    got = psi_drift(a, b, "v", n_bins=2, lo=0.0, hi=2.0).collect()[0]
    want = 0.0
    for na, nb in ((8, 5), (2, 5)):
        p = (na + 0.5) / (10 + 1.0)
        q = (nb + 0.5) / (10 + 1.0)
        want += round((p - q) * math.log(p / q), 9)
    assert abs(got["psi"] - round(want, 6)) < 1e-9


def test_psi_categorical_zero_identical_and_detects_mix_shift(spark):
    from kusuma_metamorph_etl_spark.operators.stats import psi_drift_categorical

    a = spark.createDataFrame(
        [("en",)] * 80 + [("fr",)] * 20, ["lang"]
    )
    same = psi_drift_categorical(a, a, "lang").collect()[0]
    assert same["psi"] == 0.0 and same["n_categories"] == 2
    # mix flips 80/20 → 20/80
    b = spark.createDataFrame(
        [("en",)] * 20 + [("fr",)] * 80, ["lang"]
    )
    shifted = psi_drift_categorical(a, b, "lang").collect()[0]
    assert shifted["psi"] > 0.2
    # a category absent on one side is smoothed, not infinite
    c = spark.createDataFrame([("de",)] * 100, ["lang"])
    import math

    disjoint = psi_drift_categorical(a, c, "lang").collect()[0]
    assert math.isfinite(disjoint["psi"]) and disjoint["n_categories"] == 3


class TestCorrelationMatrix:
    def test_perfect_and_inverse_correlations(self, spark):
        from kusuma_metamorph_etl_spark.operators.stats import correlation_matrix

        df = spark.createDataFrame(
            [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0)],
            ["a", "b", "c"],
        )
        out = {
            (r["col_a"], r["col_b"]): r
            for r in correlation_matrix(df, ["a", "b", "c"]).collect()
        }
        assert out[("a", "b")]["corr"] == 1.0
        assert out[("a", "c")]["corr"] == -1.0
        assert out[("a", "b")]["n"] == 3
        assert len(out) == 3  # unordered pairs only

    def test_single_pass_plan_and_validation(self, spark):
        import pytest

        from kusuma_metamorph_etl_spark.operators.stats import correlation_matrix

        df = spark.createDataFrame([(1.0, 2.0)], ["a", "b"])
        plan = (
            correlation_matrix(df, ["a", "b"])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("LogicalRDD") == 1  # one scan, no per-pair unions
        with pytest.raises(ValueError):
            correlation_matrix(df, ["a"])


def test_psi_includes_bins_empty_in_both_snapshots(spark):
    """Regression (r8 review): bins empty in BOTH snapshots were dropped
    by the observed-bins join, yet their Laplace-smoothed terms are
    nonzero whenever the totals differ — the returned PSI understated
    the textbook all-bins formula."""
    import math

    from kusuma_metamorph_etl_spark.operators.stats import psi_drift

    a = spark.createDataFrame([(0.0,)] * 100, "v double")
    b = spark.createDataFrame([(0.0,)] * 50, "v double")
    # shared bounds widen a constant column; all mass in bin 0, bins 1-9
    # empty in both — each still contributes a smoothed term
    got = psi_drift(a, b, "v", n_bins=10, lo=0.0, hi=100.0).collect()[0]
    n_bins, s = 10, 0.5
    ta, tb = 100, 50
    def term(na, nb):
        pa = (na + s) / (ta + s * n_bins)
        pb = (nb + s) / (tb + s * n_bins)
        return round((pa - pb) * math.log(pa / pb), 9)
    expected = round(term(100, 50) + 9 * term(0, 0), 6)
    assert abs(got["psi"] - expected) < 1e-9, (got["psi"], expected)
