"""Gap-fill and range-frame rolling: hand-computed expectations on a
tiny series with holes, plus the sparse-series RANGE-vs-ROWS contract."""

import datetime as dt

from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.timeseries import gapfill, rolling


def _series(spark, rows):
    return spark.createDataFrame(
        [(k, dt.date.fromisoformat(d), float(v)) for k, d, v in rows],
        ["k", "d", "v"],
    )


def test_gapfill_fills_every_calendar_day(spark):
    df = _series(
        spark,
        [("a", "2024-01-01", 10.0), ("a", "2024-01-04", 40.0),
         ("a", "2024-01-06", 20.0), ("b", "2024-02-01", 5.0)],
    )
    out = {
        (r["k"], r["d"].isoformat()): r
        for r in gapfill(df, ["k"], "d", "v").collect()
    }
    assert len(out) == 6 + 1  # a: Jan 1..6 inclusive; b: single day
    # observed rows keep v; filled rows have v NULL
    assert out[("a", "2024-01-01")]["v"] == 10.0
    assert out[("a", "2024-01-02")]["v"] is None
    # forward fill carries the last observation
    assert out[("a", "2024-01-02")]["v_ffill"] == 10.0
    assert out[("a", "2024-01-03")]["v_ffill"] == 10.0
    assert out[("a", "2024-01-05")]["v_ffill"] == 40.0
    # linear interpolation between (Jan1,10) and (Jan4,40): 10 + 10/day
    assert abs(out[("a", "2024-01-02")]["v_interp"] - 20.0) < 1e-12
    assert abs(out[("a", "2024-01-03")]["v_interp"] - 30.0) < 1e-12
    # between (Jan4,40) and (Jan6,20): midpoint 30
    assert abs(out[("a", "2024-01-05")]["v_interp"] - 30.0) < 1e-12
    # observed rows pass through interp unchanged
    assert out[("a", "2024-01-06")]["v_interp"] == 20.0
    assert out[("b", "2024-02-01")]["v_interp"] == 5.0


def test_gapfill_edges_backfill_and_carry(spark):
    # leading hole: interp backfills from the first observation
    df = _series(
        spark, [("a", "2024-01-02", 8.0), ("a", "2024-01-05", 2.0)]
    )
    filled = gapfill(df, ["k"], "d", "v")
    spine = filled.filter(F.col("v").isNull()).count()
    assert spine == 2  # Jan 3, Jan 4
    rows = {r["d"].isoformat(): r for r in filled.collect()}
    assert rows["2024-01-02"]["v_ffill"] == 8.0
    assert rows["2024-01-03"]["v_ffill"] == 8.0
    assert abs(rows["2024-01-03"]["v_interp"] - 6.0) < 1e-12
    assert abs(rows["2024-01-04"]["v_interp"] - 4.0) < 1e-12


def test_rolling_range_frame_windows_calendar_days(spark):
    # Sparse series: Jan 1, Jan 5, Mar 1.  A 7-day RANGE frame must pair
    # Jan 5 with Jan 1 but NOT Mar 1 with either (a 3-ROWS frame would).
    df = _series(
        spark,
        [("a", "2024-01-01", 10.0), ("a", "2024-01-05", 30.0),
         ("a", "2024-03-01", 100.0)],
    )
    out = {
        r["d"].isoformat(): r
        for r in rolling(df, ["k"], "d", "v", days=7, out_prefix="r7").collect()
    }
    assert out["2024-01-01"]["r7_sum"] == 10.0 and out["2024-01-01"]["r7_n"] == 1
    assert out["2024-01-05"]["r7_sum"] == 40.0 and out["2024-01-05"]["r7_n"] == 2
    assert out["2024-03-01"]["r7_sum"] == 100.0 and out["2024-03-01"]["r7_n"] == 1
    assert abs(out["2024-01-05"]["r7_avg"] - 20.0) < 1e-12


def test_rolling_trailing_window_is_inclusive_days(spark):
    # Exactly 6 days apart is IN the 7-day trailing window; 7 days is out.
    df = _series(
        spark,
        [("a", "2024-01-01", 1.0), ("a", "2024-01-07", 2.0),
         ("a", "2024-01-08", 4.0)],
    )
    out = {
        r["d"].isoformat(): r
        for r in rolling(df, ["k"], "d", "v", days=7).collect()
    }
    assert out["2024-01-07"]["v_7d_sum"] == 3.0  # Jan 1 still inside
    assert out["2024-01-08"]["v_7d_sum"] == 6.0  # Jan 1 aged out


def test_rate_anomaly_flags_planted_spike_after_cold_start(spark):
    from kusuma_metamorph_etl_spark.operators.timeseries import rate_anomaly

    base = dt.date(2024, 1, 1)
    rows = []
    for i in range(40):
        v = 100.0 + (i % 3)  # tight baseline: ~1 unit of jitter
        if i == 35:
            v = 500.0  # planted spike
        rows.append(("k", base + dt.timedelta(days=i), v))
    df = spark.createDataFrame(rows, ["k", "d", "v"])
    out = {r["d"].isoformat(): r for r in rate_anomaly(df, ["k"], "d", "v").collect()}
    assert out["2024-02-05"]["is_anomaly"] is True  # day 35
    # cold start: first min_baseline days have NULL z, no flag
    assert out["2024-01-01"]["z"] is None
    assert out["2024-01-03"]["z"] is None
    # normal days unflagged
    assert out["2024-01-20"]["is_anomaly"] is False
    # the spike day is EXCLUDED from its own baseline (trailing window):
    # baseline mean stays ~101 even on the spike day
    assert out["2024-02-05"]["baseline_mean"] < 110
    # ...but contaminates the NEXT day's baseline (documented trade-off)
    assert out["2024-02-06"]["baseline_mean"] > 110


def test_rolling_distinct_matches_bruteforce(spark):
    """HLL-merged rolling distinct must track the brute-force rolling
    distinct within HLL error on a fixture where the answer changes."""
    from kusuma_metamorph_etl_spark.operators.timeseries import rolling_distinct

    base = dt.date(2024, 3, 1)
    rows = []
    for day in range(10):
        # each day has users [day*10 .. day*10+19]: 7-day distinct grows
        # to 7*10+10=80 then plateaus
        for u in range(day * 10, day * 10 + 20):
            rows.append((dt.datetime.combine(base + dt.timedelta(days=day),
                                             dt.time(12)), u))
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    got = {
        r["day_dt"].isoformat(): r for r in rolling_distinct(df, "ts", "user_id").collect()
    }
    # brute force
    per_day = {}
    for day in range(10):
        users = set()
        for back in range(7):
            src = day - back
            if src >= 0:
                users |= set(range(src * 10, src * 10 + 20))
        per_day[(base + dt.timedelta(days=day)).isoformat()] = len(users)
    assert set(got) == set(per_day)
    for k, exact in per_day.items():
        est = got[k]["approx_7d_distinct"]
        assert abs(est - exact) / exact < 0.1, (k, est, exact)
        assert got[k]["day_distinct"] == 20


def test_ewma_hand_computed_with_calendar_gap(spark):
    from kusuma_metamorph_etl_spark.operators.timeseries import ewma

    df = _series(
        spark,
        [("a", "2024-01-01", 10), ("a", "2024-01-02", 20), ("a", "2024-01-05", 30)],
    )
    out = {
        r["d"].isoformat(): r["ewma"]
        for r in ewma(df, ["k"], "d", "v", alpha=0.5).collect()
    }
    assert out["2024-01-01"] == 10.0
    # (0.5*10 + 20) / 1.5
    assert out["2024-01-02"] == round(25 / 1.5, 6)
    # gap decays by elapsed DAYS: weights 0.5^4, 0.5^3, 1
    assert out["2024-01-05"] == round(
        (10 * 0.0625 + 20 * 0.125 + 30) / (0.0625 + 0.125 + 1), 6
    )


def test_ewma_truncates_beyond_window(spark):
    from kusuma_metamorph_etl_spark.operators.timeseries import ewma

    df = _series(
        spark,
        [("a", "2024-01-01", 10), ("a", "2024-01-02", 20), ("a", "2024-01-05", 30)],
    )
    out = {
        r["d"].isoformat(): r["ewma"]
        for r in ewma(df, ["k"], "d", "v", alpha=0.5, window_days=3).collect()
    }
    # at Jan 5 both prior points are >= 3 days old: only the day-0 term
    assert out["2024-01-05"] == 30.0
    # at Jan 2 the Jan 1 point (1 day old) is still inside the window
    assert out["2024-01-02"] == round(25 / 1.5, 6)


def test_ewma_keys_are_independent_and_alpha_validated(spark):
    import pytest

    from kusuma_metamorph_etl_spark.operators.timeseries import ewma

    df = _series(
        spark, [("a", "2024-01-01", 10), ("b", "2024-01-01", 99)]
    )
    rows = {r["k"]: r["ewma"] for r in ewma(df, ["k"], "d", "v").collect()}
    assert rows == {"a": 10.0, "b": 99.0}
    with pytest.raises(ValueError):
        ewma(df, ["k"], "d", "v", alpha=1.5)
    with pytest.raises(ValueError):
        ewma(df, ["k"], "d", "v", window_days=0)


def test_seasonal_profile_hand_computed(spark):
    from kusuma_metamorph_etl_spark.operators.timeseries import seasonal_profile

    # two weeks, Mondays run hot (+30 over the other day), one key
    df = _series(
        spark,
        [
            ("a", "2024-01-01", 40),  # Monday
            ("a", "2024-01-04", 10),  # Thursday
            ("a", "2024-01-08", 40),  # Monday
            ("a", "2024-01-11", 10),  # Thursday
        ],
    )
    out = {
        r["d"].isoformat(): r for r in seasonal_profile(df, ["k"], "d", "v").collect()
    }
    # overall mean 25; Monday mean 40 -> seasonal +15; Thursday -> -15
    assert out["2024-01-01"]["seasonal"] == 15.0
    assert out["2024-01-04"]["seasonal"] == -15.0
    assert out["2024-01-01"]["deseasonalized"] == 25.0
    assert out["2024-01-11"]["deseasonalized"] == 25.0
    assert out["2024-01-01"]["dow"] == 2  # Spark: 1=Sunday, Monday=2


def test_resample_ohlc_weekly_bars(spark):
    from kusuma_metamorph_etl_spark.operators.timeseries import resample_ohlc

    # 2024-01-01 is a Monday; two observed days that week + one the next
    df = _series(
        spark,
        [
            ("a", "2024-01-02", 30),
            ("a", "2024-01-05", 10),
            ("a", "2024-01-03", 50),
            ("a", "2024-01-09", 70),
        ],
    )
    out = {
        r["period"].isoformat(): r
        for r in resample_ohlc(df, ["k"], "d", "v").collect()
    }
    wk1 = out["2024-01-01"]
    assert (wk1["open"], wk1["high"], wk1["low"], wk1["close"], wk1["n_obs"]) == (
        30.0,
        50.0,
        10.0,
        10.0,
        3,
    )
    assert out["2024-01-08"]["open"] == 70.0
    assert out["2024-01-08"]["n_obs"] == 1


def test_ewma_null_observation_contributes_nothing(spark):
    """Regression (r8 review): a NULL value's weight used to stay in the
    denominator while its value term vanished from the numerator,
    silently deflating every average in reach (10, NULL, 10 gave 3.33
    and 7.14 instead of 10.0) — e.g. any gapfill output fed to ewma."""
    from kusuma_metamorph_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 10.0),
            ("a", dt.date(2024, 1, 2), None),
            ("a", dt.date(2024, 1, 3), 10.0),
        ],
        "k string, d date, v double",
    )
    out = {
        r["d"].isoformat(): r["ewma"]
        for r in ewma(df, ["k"], "d", "v", alpha=0.5).collect()
    }
    assert out["2024-01-01"] == 10.0
    assert out["2024-01-02"] == 10.0  # window holds only the day-1 obs
    assert out["2024-01-03"] == 10.0
    # a window with ONLY NULL observations has no defined average: NULL
    lone = spark.createDataFrame(
        [("b", dt.date(2024, 1, 1), None)], "k string, d date, v double"
    )
    got = ewma(lone, ["k"], "d", "v", alpha=0.5).collect()[0]
    assert got["ewma"] is None
