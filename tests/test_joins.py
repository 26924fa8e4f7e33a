"""asof_join unit tests on hand-checkable fixtures: backward semantics,
inclusive equality, no-match nulls, and the staleness tolerance."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.joins import asof_join, range_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 6, 1, 12, minute, 0)


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(10)), (2, "A", _ts(30)), (3, "B", _ts(5))],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(9), 100.0),
            ("A", _ts(10), 101.0),  # equality — must match trade 1
            ("A", _ts(29), 102.0),
            ("B", _ts(50), 200.0),  # only AFTER trade 3 — no match
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive(spark, frames):
    trades, quotes = frames
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(trades, quotes, on=["sym"], value_cols=["px"]).collect()
    }
    assert out == {1: 101.0, 2: 102.0, 3: None}


def test_asof_tolerance(spark, frames):
    trades, quotes = frames
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on=["sym"], value_cols=["px"], tolerance="30 seconds"
        ).collect()
    }
    # Trade 2 at 12:30's best quote (12:29) is older than 30s → nulled;
    # trade 1's exact-time quote survives.
    assert out == {1: 101.0, 2: None, 3: None}


def test_asof_forward_inclusive_and_tolerance(spark, frames):
    trades, quotes = frames
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on=["sym"], value_cols=["px"], direction="forward"
        ).collect()
    }
    # trade 1 @12:10 -> exact-time quote 101 (inclusive); trade 2 @12:30 ->
    # no A quote at-or-after -> null; trade 3 @12:05 -> B quote @12:50.
    assert out == {1: 101.0, 2: None, 3: 200.0}
    bounded = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on=["sym"], value_cols=["px"],
            direction="forward", tolerance="10 minutes",
        ).collect()
    }
    assert bounded == {1: 101.0, 2: None, 3: None}  # 45-min lookahead nulled


def test_asof_forward_tie_picks_smallest(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts(10))], "id long, sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(10), 5.0), ("A", _ts(10), 7.0)],
        "sym string, ts timestamp, px double",
    )
    fwd = asof_join(
        left, right, on=["sym"], value_cols=["px"], direction="forward"
    ).collect()
    bwd = asof_join(left, right, on=["sym"], value_cols=["px"]).collect()
    assert fwd[0]["px"] == 5.0  # forward: smallest value struct
    assert bwd[0]["px"] == 7.0  # backward: largest value struct


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            (1, "u", _ts(10)),  # == lower → in  ([lower, upper) semantics)
            (2, "u", _ts(20)),  # == upper → out
            (3, "u", _ts(15)),  # inside
            (4, "u", _ts(40)),  # outside everything
            (5, "v", _ts(15)),  # right time, wrong key
        ],
        "id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u", _ts(10), _ts(20), "w1")],
        "k string, lo timestamp, hi timestamp, label string",
    )
    out = range_join(
        points, intervals, "ts", "lo", "hi", on=["k"], chunk_seconds=60
    )
    assert {r["id"] for r in out.collect()} == {1, 3}


def test_range_join_interval_spanning_chunks(spark):
    # Interval longer than the chunk: must still match points in EVERY
    # covered chunk exactly once.
    points = spark.createDataFrame(
        [(i, "u", _ts(i)) for i in range(0, 60, 7)],
        "id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u", _ts(0), _ts(59), "big")],
        "k string, lo timestamp, hi timestamp, label string",
    )
    out = range_join(
        points, intervals, "ts", "lo", "hi", on=["k"], chunk_seconds=120
    ).collect()
    assert sorted(r["id"] for r in out) == list(range(0, 59, 7))


class TestFuzzyJoin:
    def test_deletion_variants(self, spark):
        from kusuma_metamorph_etl_spark.operators.joins import deletion_variants

        df = spark.createDataFrame([("abc",)], "k string")
        got = set(df.select(deletion_variants(F.col("k"))).first()[0])
        assert got == {"abc", "bc", "ac", "ab"}

    def test_blocking_is_exact_for_d1(self, spark, sf_small):
        # SymSpell deletion blocking has recall 1.0 at distance 1: the
        # candidate-verified result must EQUAL the brute-force cross join.
        from kusuma_metamorph_etl_spark.operators.joins import fuzzy_self_pairs

        sup = spark.read.parquet(f"{sf_small}/supplier.parquet")
        got = {
            (r["a"], r["b"])
            for r in fuzzy_self_pairs(sup, "s_name", "s_suppkey").collect()
        }
        a = sup.select(F.col("s_suppkey").alias("a"), F.col("s_name").alias("ka"))
        b = sup.select(F.col("s_suppkey").alias("b"), F.col("s_name").alias("kb"))
        brute = {
            (r["a"], r["b"])
            for r in a.join(b, F.col("a") < F.col("b"))
            .filter(F.levenshtein("ka", "kb") <= 1)
            .collect()
        }
        assert got == brute and brute  # equal, and non-trivially non-empty

    def test_substitution_insert_delete_all_covered(self, spark):
        from kusuma_metamorph_etl_spark.operators.joins import fuzzy_self_pairs

        df = spark.createDataFrame(
            [(1, "spark"), (2, "sparc"), (3, "sparks"), (4, "spak"), (5, "flink")],
            "id long, k string",
        )
        pairs = {
            (r["a"], r["b"]) for r in fuzzy_self_pairs(df, "k", "id").collect()
        }
        assert (1, 2) in pairs  # substitution
        assert (1, 3) in pairs  # insertion
        assert (1, 4) in pairs  # deletion
        assert not any(5 in p for p in pairs)  # flink matches nothing


class TestIntervalOverlap:
    def test_overlap_semantics_and_chunk_dedup(self, spark):
        from kusuma_metamorph_etl_spark.operators.joins import (
            interval_overlap_join,
        )

        t0 = dt.datetime(2024, 6, 1, 0, 0, 0)

        def h(hours):
            return t0 + dt.timedelta(hours=hours)

        # left interval 1 spans 3 chunks (0-3h); right interval 10 overlaps
        # it in two shared chunks — must appear ONCE; touching endpoints
        # (half-open) must NOT match; disjoint must not match.
        left = spark.createDataFrame(
            [(1, h(0), h(3)), (2, h(5), h(6))],
            "lid long, ls timestamp, le timestamp",
        )
        right = spark.createDataFrame(
            [
                (10, h(1), h(4)),   # overlaps interval 1 across 2 chunks
                (11, h(3), h(4)),   # touches interval 1 at 3h -> no match
                (12, h(6), h(7)),   # touches interval 2 at 6h -> no match
                (13, h(5), h(5, )),  # empty interval inside 2 -> no match
            ],
            "rid long, rs timestamp, re timestamp",
        )
        rows = interval_overlap_join(
            left, right, ("ls", "le"), ("rs", "re"), chunk_seconds=3600
        ).collect()
        pairs = [(r["lid"], r["rid"]) for r in rows]
        assert pairs == [(1, 10)]  # once, despite two shared chunks

    def test_matches_brute_force_on_events(self, spark, sf_small):
        from kusuma_metamorph_etl_spark.operators.joins import (
            interval_overlap_join,
        )

        events = spark.read.parquet(f"{sf_small}/events.parquet")
        half_hour = F.expr("INTERVAL 30 MINUTES")
        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("cid"),
            F.col("ts").alias("cs"), (F.col("ts") + half_hour).alias("ce"),
        )
        purchases = events.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("pid"),
            F.col("ts").alias("ps"), (F.col("ts") + half_hour).alias("pe"),
        )
        got = {
            (r["cid"], r["pid"])
            for r in interval_overlap_join(
                clicks, purchases, ("cs", "ce"), ("ps", "pe"), on=["user_id"]
            ).collect()
        }
        brute = {
            (r["cid"], r["pid"])
            for r in clicks.join(purchases, on="user_id")
            .filter((F.col("cs") < F.col("pe")) & (F.col("ps") < F.col("ce")))
            .collect()
        }
        assert got == brute and brute


class TestFunnel:
    def test_ordered_stages_and_breaks(self, spark):
        from kusuma_metamorph_etl_spark.operators.events import funnel

        t0 = dt.datetime(2024, 6, 1, 12, 0, 0)

        def m(minute):
            return t0 + dt.timedelta(minutes=minute)

        rows = [
            # user 1: clean v(0) -> c(5) -> p(9)
            (1, m(0), "view"), (1, m(5), "click"), (1, m(9), "purchase"),
            # user 2: purchase BEFORE click -> funnel breaks at purchase
            (2, m(0), "view"), (2, m(3), "purchase"), (2, m(6), "click"),
            # user 3: click before the first view -> breaks at click
            (3, m(2), "click"), (3, m(4), "view"),
            # user 4: never viewed -> not in the funnel at all
            (4, m(1), "click"), (4, m(2), "purchase"),
            # user 5: same-instant click counts (>= rule)
            (5, m(0), "view"), (5, m(0), "click"),
        ]
        events = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        got = {
            r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"])
            for r in funnel(events, ["view", "click", "purchase"]).collect()
        }
        assert set(got) == {1, 2, 3, 5}
        assert got[1] == (m(0), m(5), m(9))
        assert got[2] == (m(0), m(6), None)  # click at 6, no purchase after
        assert got[3] == (m(4), None, None)
        assert got[5] == (m(0), m(0), None)

    def test_sessionize_gap_rule(self, spark):
        from kusuma_metamorph_etl_spark.operators.events import sessionize

        t0 = dt.datetime(2024, 6, 1, 12, 0, 0)

        def m(minute):
            return t0 + dt.timedelta(minutes=minute)

        rows = [
            # user 1: events at 0, 10, 41 min with 30-min gap: the 31-min
            # jump starts session 2; exactly-30-min gaps do NOT (strict >)
            (1, 100, m(0)), (1, 101, m(10)), (1, 102, m(41)),
            (1, 103, m(71)),  # 30:00.000000 exactly after 41 -> same session
            (2, 200, m(5)),
        ]
        events = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp"
        )
        got = {
            r["event_id"]: r["session_idx"]
            for r in sessionize(events, gap_seconds=1800).collect()
        }
        assert got == {100: 1, 101: 1, 102: 2, 103: 2, 200: 1}

    def test_retention_cohorts(self, spark):
        from kusuma_metamorph_etl_spark.operators.events import retention_cohorts

        d = dt.datetime
        rows = [
            (1, d(2024, 6, 1, 9)), (1, d(2024, 6, 3, 8)),   # cohort 6/1: day 0, 2
            (2, d(2024, 6, 1, 23)), (2, d(2024, 6, 3, 1)),  # cohort 6/1: day 0, 2
            (3, d(2024, 6, 3, 12)),                          # cohort 6/3: day 0
        ]
        events = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
            for r in retention_cohorts(events).collect()
        }
        assert got == {
            ("2024-06-01", 0): 2,
            ("2024-06-01", 2): 2,
            ("2024-06-03", 0): 1,
        }

    def test_one_scan_equals_k_join(self, spark, sf_small):
        """funnel_one_scan (the evt_funnel implementation — one fact scan,
        pivot to sorted arrays) must produce the identical user-grain frame
        as the k-join funnel on real event data."""
        from kusuma_metamorph_etl_spark.operators.events import (
            funnel,
            funnel_one_scan,
        )

        events = spark.read.parquet(f"{sf_small}/events.parquet")
        stages = ["view", "click", "purchase"]
        k_join = {tuple(r) for r in funnel(events, stages).collect()}
        one_scan = {tuple(r) for r in funnel_one_scan(events, stages).collect()}
        assert k_join and one_scan == k_join


def test_asof_nearest_picks_closer_side_and_tie_backward(spark, frames):
    trades, quotes = frames
    got = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, on=["sym"], value_cols=["px"], direction="nearest"
        ).collect()
    }
    # trade 1 @12:10: exact-equality quote 101 (backward inclusive)
    assert got[1] == 101.0
    # trade 2 @12:30: backward 102 @12:29 (1 min) — no forward A quote
    assert got[2] == 102.0
    # trade 3 @12:05 (sym B): ONLY a forward quote exists (12:50) → 200
    assert got[3] == 200.0


def test_asof_nearest_exact_tie_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "A", _ts(10))], "id long, sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("A", _ts(5), 1.0), ("A", _ts(15), 2.0)],
        "sym string, ts timestamp, px double",
    )
    # equidistant (5 min each way) → backward wins
    got = asof_join(left, right, on=["sym"], value_cols=["px"], direction="nearest").collect()
    assert got[0]["px"] == 1.0
    # tolerance nulls BOTH sides when they are farther than the bound
    got2 = asof_join(
        left, right, on=["sym"], value_cols=["px"],
        direction="nearest", tolerance="2 minutes",
    ).collect()
    assert got2[0]["px"] is None
    # asymmetric: shrink backward out of tolerance, forward survives
    right3 = spark.createDataFrame(
        [("A", _ts(1), 1.0), ("A", _ts(12), 2.0)],
        "sym string, ts timestamp, px double",
    )
    got3 = asof_join(
        left, right3, on=["sym"], value_cols=["px"],
        direction="nearest", tolerance="5 minutes",
    ).collect()
    assert got3[0]["px"] == 2.0


def test_join_degenerate_parameter_guards_r17(spark):
    """r17 edge sweep, batch 5: a NEGATIVE asof tolerance silently
    matched nothing ("0 seconds" stays legal — exact-timestamp-only),
    and chunk_seconds=0 in range/interval-overlap joins died
    mid-execution with a cryptic ANSI DIVIDE_BY_ZERO (negative chunks
    walked a nonsense grid) — each now raises ValueError."""
    import pytest
    from pyspark.sql import functions as F

    from kusuma_metamorph_etl_spark.operators.joins import (
        asof_join,
        interval_overlap_join,
        range_join,
    )

    ts = lambda s: F.col(s).cast("timestamp")
    l = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10")], "k long, ts string"
    ).select("k", ts("ts").alias("ts"))
    r = spark.createDataFrame(
        [(1, "2024-01-01 00:00:08", 5.0)], "k long, ts string, v double"
    ).select("k", ts("ts").alias("ts"), "v")
    with pytest.raises(ValueError, match="tolerance must be non-negative"):
        asof_join(l, r, on=["k"], value_cols=["v"], tolerance="-5 seconds")
    # compound negative without a leading minus (r17 ADVICE): the
    # evaluated-sign guard must catch it too
    with pytest.raises(ValueError, match="tolerance must be non-negative"):
        asof_join(
            l, r, on=["k"], value_cols=["v"], tolerance="0 minutes -5 seconds"
        )
    # zero-net compound stays legal (exact-ts-only semantics)
    asof_join(
        l, r, on=["k"], value_cols=["v"], tolerance="1 minutes -60 seconds"
    )
    a = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "id long, s string, e string",
    ).select("id", ts("s").alias("s"), ts("e").alias("e"))
    b = spark.createDataFrame(
        [(2, "2024-01-01 00:30:00", "2024-01-01 02:00:00")],
        "id2 long, s2 string, e2 string",
    ).select("id2", ts("s2").alias("s2"), ts("e2").alias("e2"))
    for cs in (0, -10):
        with pytest.raises(ValueError, match="chunk_seconds must be >= 1"):
            interval_overlap_join(a, b, ("s", "e"), ("s2", "e2"), chunk_seconds=cs)
        with pytest.raises(ValueError, match="chunk_seconds must be >= 1"):
            range_join(l, a, "ts", "s", "e", chunk_seconds=cs)
