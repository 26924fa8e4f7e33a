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
* timestamps compare in UTC (session TZ pinned in session.py);
* OUTPUT COLUMNS MUST BE SCALAR: the driver canonicalizes results with a
  pandas ``sort_values`` over every column and crashes on list/dict cells
  (r9: two driver-ERRs).  Serialize arrays before registering —
  ``array_join(col, '|')``, a long-form ``(key, pos, value)`` grain, or a
  per-element projection.  ``tools/check_correctness.py`` now enforces
  this (``assert_driver_hashable``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

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

# Per-module registration sequence (the stable tie-break the window
# generator sorts within) — REGISTRY itself gets reordered by _PRIORITY.
# Keyed by defining module so the canonical order is IMPORT-ORDER
# INDEPENDENT: a test importing queries.marts before queries.core must
# not shuffle the generated window.
_REG_BY_MODULE: dict[str, list[str]] = {}

# Canonical module rank for the registration-order tie-break.  The
# former queries.ext monolith split into per-domain modules in r13;
# their rank order IS the canonical [EXT] registration order.
_MODULE_RANK = (
    "queries.core",
    "queries.ext_text",
    "queries.ext_dedup",
    "queries.ext_sim",
    "queries.ext_mm",
    "queries.ext_events",
    "queries.ext_rel",
    "queries.ext_quality",
    "queries.ext_sql",
    "queries.ext_marts",
    "queries.marts",
)


def register(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(fn, oracle)
        _REG_BY_MODULE.setdefault(fn.__module__, []).append(name)
        return fn

    return wrap


def _canonical_order() -> list[str]:
    """Registration order normalized to the fixed module rank."""

    def rank(module: str) -> tuple[int, str]:
        for i, suffix in enumerate(_MODULE_RANK):
            if module.endswith(suffix):
                return (i, "")
        return (len(_MODULE_RANK), module)

    out: list[str] = []
    for module in sorted(_REG_BY_MODULE, key=rank):
        out.extend(_REG_BY_MODULE[module])
    return out


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

# ---------------------------------------------------------------------------
# Driver-facing registration order.  The correctness harness checks the
# FIRST 50 registered queries per round; cumulative driver evidence
# (r1 ∪ r2 ∪ …) is what the judge tracks, so each round the window
# rotates toward whatever has the least evidence.
#
# The order is GENERATED, not hand-maintained (VERDICT r7 Next #5):
#
#     python tools/make_window.py        # prints the tuple to paste below
#
# sorted by (latest-status-FAIL/ERR first, zero-evidence next with the
# deferred flag behind, oldest latest-evidence round, registration
# order) over the union of CORRECTNESS_r*.json rows
# with round <= _PRIORITY_BASIS_ROUND.  tests/test_registry_window.py
# recomputes the same order and fails on any hand-edit drift or
# miscount; the basis round is pinned so the guard stays deterministic
# after later CORRECTNESS files land.
#
# ROUND-17 WINDOW: basis 16; 269 registered (+mart_pretrain_batches —
# the corpus→training-batches capstone: llm_dataprep curation → trained
# BPE lossless gate → epoch repetition → deterministic shuffle →
# token-budget packing; +mart_rag_context — the inference-side twin:
# exact cosine top-20 retrieval → per-query 256-token greedy context
# assembly; both full-oracle rows, funded under the retire-one policy
# by consolidating txt_fingerprint + txt_rolling_fingerprint →
# txt_fingerprint_family and samp_shuffle + samp_epochs →
# samp_epoch_order_family).  The 4
# zero-evidence r17 rows lead the cut, then the due r10/r11 cohorts.
# Also r17: sim_maxsim_ann's shortlist parameters are now DERIVED from
# corpus size (maxsim_probe_for/maxsim_candidates_for — the fixed
# (10, 35) measured recall 0.453 at sf1.0, gate-RED; derived holds
# 0.731, BENCH_SCALE.json r17).  The
# age guard scopes to REGISTERED rows
# only: ids retired by consolidation (win_lag_lead et al →
# win_rank_family in r13, the txt_url_normalize pair in r14) keep
# stale CORRECTNESS evidence forever but
# cannot be re-proven — their family row carries the rotation duty.
# An evidence-age guard (tests/test_registry_window.py) fails the
# build when any registered row's latest evidence is older than the
# derived rotation budget (ceil(rows/50), currently 6), a bulge guard
# fails it when the projected post-window oldest cohort exceeds 44
# rows, and compute_priority carries a CUT-REPAIR pass so a glued
# rows-only/_err pair can never straddle the 50-cut.  REGEN AFTER
# EVERY REGISTRATION; the window guard test is the backstop, run it
# before every commit.
#
# r18 builder checklist: once the driver lands CORRECTNESS_r17.json,
# bump _PRIORITY_BASIS_ROUND to 17, regenerate with
# `python tools/make_window.py --through-round 17`, and re-paste
# (defer only if new zero-evidence registrations overflow the window).
# Registry ceiling policy (ENFORCED since r12 by
# tests/test_registry_window.py::test_registry_under_rotation_ceiling):
# len(REGISTRY) must stay ≤ 50 × MAX_EVIDENCE_AGE (300 today) — every
# addition past 269 should retire or consolidate a row, and the commit
# message must name the retired/merged row.
# ---------------------------------------------------------------------------

_PRIORITY_BASIS_ROUND = 17

# Hand-picked spills when zero-evidence rows outnumber the 50-slot
# window; each entry names the in-window sibling that covers its family.
# Empty this round (r17 basis): zero latest-red and zero pre-existing
# zero-evidence rows at rotation time — the window is pure oldest-cohort
# rotation (r10/r11 due) plus any r17 registrations, which lead it with
# room.
DEFERRED_TO_NEXT_WINDOW: frozenset[str] = frozenset()


def evidence_status(
    through_round: int | None = None,
) -> dict[str, tuple[int, bool]]:
    """Per query id: ``(latest driver-evidence round, red)`` unioned over
    the committed ``CORRECTNESS_r*.json`` files.  ``red`` means the row's
    LATEST driver evidence is a FAIL/ERR — any ``*_match: false`` or a
    real ``err`` (the by-design ``"no_oracle"`` rows-only marker is
    green).  ``through_round`` caps which files are read so the pasted
    order stays reproducible."""
    import json
    import re as _re

    out: dict[str, tuple[int, bool]] = {}
    repo_root = Path(__file__).resolve().parent.parent
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        for name, row in json.loads(path.read_text()).items():
            err = row.get("err")
            red = (err is not None and err != "no_oracle") or any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            prev = out.get(name)
            if prev is None or rnd >= prev[0]:
                out[name] = (rnd, red)
    return out


def evidence_rounds(through_round: int | None = None) -> dict[str, int]:
    """Latest driver-evidence round per query id (the judge's
    zero-evidence metric) — see :func:`evidence_status`."""
    return {n: rnd for n, (rnd, _) in evidence_status(through_round).items()}


WINDOW = 50  # the driver checks the first WINDOW rows of _PRIORITY


def _glued_pair(a: str, b: str) -> bool:
    """True when ``b`` is the ``_err`` oracle gate of rows-only query
    ``a`` — the pair the window contract keeps on one side of the cut."""
    return b == a + "_err" and a in REGISTRY and REGISTRY[a].oracle is None


def _pair_member(name: str) -> bool:
    """True when ``name`` is either half of a glued rows-only/_err pair."""
    if name.endswith("_err"):
        base = name[: -len("_err")]
        return base in REGISTRY and REGISTRY[base].oracle is None
    return name in REGISTRY and REGISTRY[name].oracle is None and (
        name + "_err" in REGISTRY
    )


def compute_priority(through_round: int | None = None) -> tuple[str, ...]:
    """The generated driver order: latest-status-FAIL/ERR rows FIRST
    (a fixed red row must re-enter the window immediately — the r8→r9
    ``dq_null_profile`` lesson: its fix sat unverified a whole round),
    then zero-evidence rows (registration order, DEFERRED_TO_NEXT_WINDOW
    pushed behind the rest), then evidenced-green rows
    oldest-round-first.

    A rows-only query and its ``_err`` oracle gate are glued to the
    stronger (smaller) of their two keys: the gate is what makes the
    rows-only row evidence, so they must land in the same driver window
    even when their latest-evidence rounds differ (the
    ``test_err_companions_share_their_windows`` contract).  Gluing makes
    the pair ADJACENT, but the 50-cut can still fall between them; the
    cut-repair pass below demotes a straddling pair past the cut and
    promotes the first following singleton in its place, so the window
    stays exactly ``WINDOW`` rows and no gate ever ships without its
    rows-only twin (first hit: r11, the four Q2/Q11/Q16/Q20 rows pushed
    ``sim_lsh_topk``/``_err`` onto positions 49/50)."""
    _ensure_loaded()
    ev = evidence_status(through_round)
    order = _canonical_order()
    idx = {n: i for i, n in enumerate(order)}

    def raw_key(name: str):
        if name in ev and ev[name][1]:  # driver-red at latest evidence
            return (0, False, 0, idx[name])
        if name not in ev:
            return (1, name in DEFERRED_TO_NEXT_WINDOW, 0, idx[name])
        return (2, False, ev[name][0], idx[name])

    keys = {n: raw_key(n) for n in order}
    for name in order:
        base = name[: -len("_err")] if name.endswith("_err") else None
        if base and base in REGISTRY and REGISTRY[base].oracle is None:
            glued = min(keys[base], keys[name])
            keys[base] = keys[name] = glued

    ordered = sorted(order, key=keys.__getitem__)
    if len(ordered) > WINDOW and _glued_pair(
        ordered[WINDOW - 1], ordered[WINDOW]
    ):
        head, pair, tail = (
            ordered[: WINDOW - 1],
            ordered[WINDOW - 1 : WINDOW + 1],
            ordered[WINDOW + 1 :],
        )
        singleton = next(
            (j for j, n in enumerate(tail) if not _pair_member(n)), None
        )
        if singleton is not None:
            # promote the singleton into the freed slot; the pair leads
            # the spill so it seats first next round
            ordered = (
                head + [tail.pop(singleton)] + pair + tail
            )
    return tuple(ordered)


# Output of `python tools/make_window.py` at basis round 17 —
# regenerate and re-paste each round after the driver lands
# CORRECTNESS_r{N}.json.
_PRIORITY: tuple[str, ...] = (
    "win_rownum_flag",
    "win_percent_rank",
    "setop_family",
    "sim_cosine_topk_np",
    "sim_cosine_topk_np_err",
    "sim_ivf_topk",
    "sim_ivf_topk_err",
    "sim_quantize",
    "sim_lsh_topk",
    "sim_lsh_topk_err",
    "mm_png_features",
    "mm_phash_dedup",
    "mm_video_frames",
    "mm_audio_spectral",
    "mm_audio_features",
    "mm_wav_formats",
    "evt_funnel",
    "evt_sessionize",
    "evt_retention",
    "join_asof",
    "join_range",
    "join_fuzzy",
    "join_overlap",
    "agg_hll_mergeable",
    "agg_quantile_mergeable",
    "agg_cms_counts",
    "src_roundtrip_family",
    "win_frame_agg",
    "win_rank_family",
    "proj_explode",
    "cond_when_chain",
    "cond_null_default",
    "src_schema_evolution",
    "src_csv_badrecords",
    "fn_surrogate_key",
    "txt_sentiment",
    "txt_keywords",
    "txt_perplexity",
    "txt_search_and",
    "txt_unigram_roundtrip",
    "txt_fix_mojibake",
    "dedup_substring",
    "dedup_substring_err",
    "dedup_substring_removal",
    "dedup_substring_removal_err",
    "dedup_minhash_incr",
    "dedup_minhash_incr_err",
    "dedup_normalized",
    "dedup_normalized_nfkc",
    "dedup_normalized_nfkc_err",
  # ---- window cut ----
    "dedup_semantic",
    "dedup_semantic_err",
    "dedup_cc_incremental",
    "sim_topk_incremental",
    "sim_ivf_persisted_err",
    "mm_augment",
    "mm_audio_augment",
    "mm_gif_features",
    "mm_jpeg_features",
    "mm_jpeg_arithmetic",
    "mm_transcode",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_attribution_join",
    "stream_dedup_first",
    "evt_dedup_window",
    "evt_paths",
    "ts_gapfill",
    "ts_rolling",
    "ts_rolling_distinct",
    "scd2_merge",
    "cdc_apply",
    "graph_pagerank",
    "samp_group_k",
    "snk_jdbc_roundtrip",
    "txt_html_to_text",
    "txt_html_main_text",
    "txt_url_normalize_family",
    "txt_readability",
    "txt_collocations",
    "txt_chunk_sentences",
    "txt_wordpiece_roundtrip",
    "dedup_bloom_incr",
    "dedup_cc_minhash",
    "dedup_cc_minhash_err",
    "dedup_substring_incr",
    "dedup_substring_incr_err",
    "dedup_semantic_incr",
    "dedup_semantic_incr_err",
    "sim_mmr",
    "sim_mmr_err",
    "sim_pq",
    "sim_pq_err",
    "mm_png_interlaced",
    "mm_png_palette",
    "evt_ab_lift",
    "evt_streaks",
    "evt_funnel_timing",
    "evt_cohort_ltv",
    "ts_ewma",
    "evt_attribution",
    "evt_markov",
    "ts_seasonal",
    "evt_funnel_window",
    "ts_ohlc",
    "evt_session_stats",
    "fn_winsorize",
    "src_warc_roundtrip",
    "dq_outlier_flag",
    "agg_heavy_hitters",
    "samp_temperature",
    "dq_psi_drift",
    "samp_kfold",
    "agg_bloom_join",
    "dq_expectations",
    "agg_corr_matrix",
    "samp_balance",
    "samp_dsir",
    "mart_llm_dataprep",
    "mart_rfm",
    "mart_mm_dataprep",
    "fil_conj",
    "fil_isnull",
    "join_left_equi",
    "join_right_equi",
    "join_inner_equi",
    "agg_groupby_single",
    "agg_groupby_multi",
    "agg_sum_expr",
    "agg_avg",
    "agg_histogram",
    "agg_approx_quantile",
    "agg_approx_quantile_err",
    "null_fillna_map",
    "fn_date_math",
    "fn_str_value",
    "dq_duplicate_gate",
    "dq_snapshot_stamp",
    "txt_quality_model",
    "txt_ccnet_buckets",
    "dedup_exact_survivor",
    "sim_random_projection",
    "sim_maxsim_topk",
    "evt_stickiness",
    "graph_triangles",
    "join_skew_salted",
    "layout_zorder",
    "layout_compaction_plan",
    "graph_kcore",
    "graph_kcore_err",
    "layout_zonemap_scan",
    "win_first_last",
    "samp_domain_mix",
    "dq_psi_categorical",
    "agg_kmv_family",
    "samp_mergeable",
    "dq_freshness",
    "samp_weighted",
    "sql_shipping_priority",
    "sql_local_supplier_volume",
    "sql_returned_items",
    "sql_promo_revenue",
    "sql_large_volume_customers",
    "sql_late_shipment_priority",
    "sql_disjunctive_revenue",
    "sql_top_supplier",
    "mart_crawl_prep",
    "mart_domain_curation",
    "mart_user_engagement",
    "mart_vector_curation",
    "sort_limit",
    "txt_token_count",
    "txt_quality",
    "txt_language_id",
    "txt_tfidf",
    "txt_chunk",
    "txt_gopher_filter",
    "txt_repetition",
    "txt_pii_scrub",
    "txt_bpe_roundtrip",
    "txt_char_entropy",
    "dedup_decontaminate",
    "dedup_incremental",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_cc_clusters",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_err",
    "dedup_simhash",
    "dedup_simhash_err",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_err",
    "sim_cosine_topk",
    "sim_cosine_pairs",
    "sim_group_centroid",
    "sim_maxsim_ann",
    "sim_maxsim_ann_err",
    "mm_binary_features",
    "mm_frame_sample",
    "mm_resize",
    "mm_png_trns",
    "mm_png_16bit",
    "mm_gif_interlaced",
    "mm_png_subbyte_family",
    "evt_rate_anomaly_family",
    "fn_json_extract",
    "proj_unpivot",
    "join_asof_directions",
    "fn_regexp_extract_all",
    "samp_deterministic",
    "samp_stratified",
    "agg_approx_distinct",
    "agg_approx_distinct_err",
    "agg_pivot",
    "dq_null_profile",
    "mart_paired_curation",
    "src_parquet_scan",
    "src_csv_infer",
    "sql_pricing_summary",
    "src_inline_schema",
    "src_rest_json",
    "snk_dual_write",
    "proj_family",
    "proj_normalize_names",
    "expr_arith",
    "expr_discount_amount",
    "proj_cast",
    "fil_scalar_family",
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
    "txt_fingerprint_family",
    "src_jsonl_quarantine",
    "samp_fixed_k",
    "agg_mode",
    "samp_interleave",
    "samp_epoch_order_family",
    "samp_pack",
    "agg_percentile",
    "dq_reconcile",
    "sql_waiting_orders",
    "sql_customer_distribution",
    "sql_small_qty_revenue",
    "sql_sales_opportunity",
    "sql_min_cost_supplier",
    "sql_part_value_share",
    "sql_part_supplier_counts",
    "sql_concentrated_suppliers",
    "sql_forecast_revenue",
    "sql_volume_shipping",
    "sql_market_share",
    "sql_product_profit",
    "sql_priority_lines",
    "mart_pretrain_batches",
    "mart_rag_context",
    "mart_streaming_quality",
    "mart_supplier_performance",
    "mart_product_performance",
    "mart_customer_sales_report",
)

# summary: 269 registered; 0 latest-red; 0 zero-evidence;
# window holds 0 red + 0 zero-evidence rows; spilled past the cut: []

# summary: 269 registered; 0 latest-red; 6 zero-evidence;
# window holds 0 red + 6 zero-evidence rows; spilled past the cut: []


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
