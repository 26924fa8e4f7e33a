"""Touch attribution: hand-built journeys with known first/last touches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.events import attribution


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1, 0, 0, sec), uid, typ, float(v))
            for eid, sec, uid, typ, v in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


def test_last_and_first_touch_per_conversion(spark):
    df = _events(
        spark,
        [
            (1, 1, 1, "view", 0),
            (2, 2, 1, "click", 0),
            (3, 3, 1, "purchase", 10),
            (4, 4, 1, "purchase", 5),  # prior purchase masked, not a touch
            (5, 1, 2, "purchase", 7),  # no touch at all
        ],
    )
    out = {r["event_id"]: r for r in attribution(df).collect()}
    assert (out[3]["channel_last"], out[3]["channel_first"]) == ("click", "view")
    assert (out[4]["channel_last"], out[4]["channel_first"]) == ("click", "view")
    assert (out[5]["channel_last"], out[5]["channel_first"]) == (None, None)
    assert set(out) == {3, 4, 5}  # only conversions emit rows


def test_timestamp_tie_breaks_on_event_id(spark):
    df = _events(
        spark,
        [
            (10, 1, 1, "view", 0),
            (11, 1, 1, "click", 0),  # same ts as view: id order decides
            (12, 2, 1, "purchase", 3),
        ],
    )
    row = attribution(df).collect()[0]
    assert row["channel_last"] == "click"
    assert row["channel_first"] == "view"


def test_transition_matrix_counts_and_row_normalization(spark):
    from kusuma_metamorph_etl_spark.operators.events import transition_matrix

    df = _events(
        spark,
        [
            (1, 1, 1, "a", 0),
            (2, 2, 1, "b", 0),
            (3, 3, 1, "a", 0),
            (4, 4, 1, "b", 0),
            (5, 1, 2, "a", 0),
            (6, 2, 2, "a", 0),
        ],
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in transition_matrix(df).collect()
    }
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("a", "a")] == (1, round(1 / 3, 6))
    assert out[("b", "a")] == (1, 1.0)
    # first event per user is a start, not a transition
    assert sum(n for n, _ in out.values()) == 6 - 2


def test_funnel_window_constraint_cuts_late_stages(spark):
    from kusuma_metamorph_etl_spark.operators.events import funnel_one_scan

    df = _events(
        spark,
        [
            # user 1 converts inside the 10s window
            (1, 0, 1, "view", 0),
            (2, 3, 1, "click", 0),
            (3, 8, 1, "purchase", 0),
            # user 2 clicks inside, purchases outside the window
            (4, 0, 2, "view", 0),
            (5, 5, 2, "click", 0),
            (6, 30, 2, "purchase", 0),
            # user 3: click itself outside -> purchase also cut
            (7, 0, 3, "view", 0),
            (8, 20, 3, "click", 0),
            (9, 25, 3, "purchase", 0),
        ],
    )
    out = {
        r["user_id"]: r
        for r in funnel_one_scan(
            df, ["view", "click", "purchase"], within_seconds=10
        ).collect()
    }
    assert out[1]["t_purchase"] is not None
    assert out[2]["t_click"] is not None and out[2]["t_purchase"] is None
    assert out[3]["t_click"] is None and out[3]["t_purchase"] is None
    # and without the window, user 2 and 3 convert fully
    free = {
        r["user_id"]: r
        for r in funnel_one_scan(df, ["view", "click", "purchase"]).collect()
    }
    assert free[2]["t_purchase"] is not None
    assert free[3]["t_purchase"] is not None


def test_session_stats_rollup(spark):
    from kusuma_metamorph_etl_spark.operators.events import session_stats

    df = _events(
        spark,
        [
            # user 1: two sessions (gap 40s > 10s threshold)
            (1, 0, 1, "view", 1.5),
            (2, 5, 1, "click", 2.5),
            (3, 50, 1, "view", 4.0),
            # user 2: single-event session -> bounce
            (4, 0, 2, "purchase", 7.0),
        ],
    )
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(df, gap_seconds=10).collect()
    }
    s11 = out[(1, 1)]
    assert (s11["n_events"], s11["duration_us"], s11["session_value"]) == (
        2,
        5_000_000,
        4.0,
    )
    assert s11["bounce"] is False
    assert out[(1, 2)]["bounce"] is True
    assert out[(2, 1)]["session_value"] == 7.0


def test_stickiness_dau_mau(spark):
    from kusuma_metamorph_etl_spark.operators.events import stickiness

    rows = [
        ("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 2),
        ("2024-01-01 12:00:00", 1),  # same user twice -> dau counts once
        ("2024-01-02 10:00:00", 1),
        ("2024-01-02 10:30:00", 3),
        ("2024-01-03 09:00:00", 2),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    got = {str(r.day): r for r in stickiness(df).collect()}
    assert got["2024-01-01"].dau == 2 and got["2024-01-01"].mau == 3
    assert got["2024-01-02"].dau == 2
    assert got["2024-01-03"].dau == 1
    assert got["2024-01-03"].stickiness == round(1 / 3, 6)


def test_degenerate_window_guards_r17(spark):
    """r17 edge sweep, batch 3: sessionize(gap<=0) silently degraded to
    one session per event, dedup_within_window(window<=0) silently
    deduped nothing, and bloom_sketch(n_bits=0 / n_hashes=0) either died
    with a cryptic REMAINDER_BY_ZERO or silently built an EMPTY sketch
    whose probes would false-negative — each now raises ValueError."""
    import pytest
    from pyspark.sql import functions as F

    from kusuma_metamorph_etl_spark.operators.events import (
        dedup_within_window,
        sessionize,
    )
    from kusuma_metamorph_etl_spark.operators.sketches import bloom_sketch

    ev = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00")],
        "user_id long, event_id long, ts string",
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError, match="gap_seconds must be >= 1"):
        sessionize(ev, gap_seconds=0)
    with pytest.raises(ValueError, match="window_seconds must be >= 1"):
        dedup_within_window(ev, keys=["user_id"], window_seconds=-5)
    vals = spark.createDataFrame([("a",)], ["v"])
    for bits, h in ((0, 5), (-64, 5), (64, 0)):
        with pytest.raises(ValueError, match="n_bits and n_hashes"):
            bloom_sketch(vals, "v", n_bits=bits, n_hashes=h)
