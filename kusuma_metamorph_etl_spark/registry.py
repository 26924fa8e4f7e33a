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
# ROUND-6 WINDOW (the rotation VERDICT r5 Next #1 ordered; the r5 window
# is all green as of CORRECTNESS_r05 and demoted below the cut):
#   1. the 11 rows whose latest evidence is round 2 — the rows-only
#      approx/ANN family plus the six cheap txt_* rows deferred from r5;
#   2. the 21 new round-6 registrations, all with zero prior evidence:
#      the `_err` recall companions that oracle-bind the rows-only family
#      (VERDICT r5 Next #2), the PNG/pHash/spectral/video multimodal
#      queries, containment + connected-components dedup, sessionize/
#      retention event analytics, char-entropy, fixed-k sampling, mode,
#      mergeable-HLL rollup, and the interval-overlap join;
#   3. oldest r4-window rows (events + streaming twins + r3 leftovers)
#      until the window holds exactly 50.
# Deferred to the r7 window: the remaining r4 rows (agg_count_star/
# global_count/rollup_cube/grouping_sets/stats, expr_*, the win_* block,
# sql_pricing_summary, stream_dedup_first, the src_*/snk_dual_write/
# join_broadcast/semi_anti/disambig/proj_* block) — all green in r4 and
# untouched since; they ceded slots to zero-evidence registrations.
_PRIORITY: tuple[str, ...] = (
    # (1) r2-only evidence
    "agg_approx_quantile",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ivf_topk",
    "sim_lsh_topk",
    "txt_chunk",
    "txt_fingerprint",
    "txt_rolling_fingerprint",
    "txt_repetition",
    "txt_token_count",
    "txt_language_id",
    # (2) new round-6 registrations: the rows-only family, oracle-bound
    "dedup_minhash_lsh_err",
    "dedup_simhash_err",
    "dedup_embedding_lsh_err",
    "sim_lsh_topk_err",
    "sim_ivf_topk_err",
    "sim_cosine_topk_np_err",
    "mm_png_features",
    "mm_phash_dedup",
    "mm_audio_spectral",
    "mm_video_frames",
    "dedup_containment",
    "dedup_cc_clusters",
    "dedup_cc_representatives",
    "evt_sessionize",
    "evt_retention",
    "txt_char_entropy",
    "samp_fixed_k",
    "agg_mode",
    "agg_hll_mergeable",
    "join_overlap",
    "txt_bpe_roundtrip",
    "agg_quantile_mergeable",
    "agg_cms_counts",
    "samp_interleave",
    "src_orc_roundtrip",
    "join_asof_forward",
    # (3) oldest r4-window rows: events + streaming twins + r3 leftovers
    "fn_json_extract",
    "agg_approx_distinct",
    "join_asof",
    "join_range",
    "txt_gopher_filter",
    "samp_shuffle",
    "samp_pack",
    "dedup_decontaminate",
    "dedup_embedding_lsh",
    "sim_quantize",
    "mm_audio_features",
    "evt_funnel",
    "join_fuzzy",
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
