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
# FIRST 50 registered queries per round, so the highest-value / least-
# recently-driver-checked queries go first: the two r1 failures (now
# fixed), the three flagship marts, the aggregates whose decimal-sum
# semantics changed this round, the r1-unchecked core tail, then the
# LLM-pipeline (dedup / similarity / text / sampling / multimodal)
# families.  Queries with strong independent pytest evidence (stream ==
# batch equality, np == JVM equality) and the r1-green trivia follow.
# Names not listed keep their module registration order at the end.
#
# ROTATION PLAN (r3+): once CORRECTNESS_r02 lands, demote its green rows
# and promote everything still driver-unchecked — the streaming five,
# sim_cosine_topk_np, scd2_merge, and the round-2 additions
# (samp_shuffle, samp_pack, dedup_decontaminate, dedup_embedding_lsh,
# join_fuzzy, evt_funnel, mm_audio_features) — so cumulative driver
# evidence reaches the whole registry by r3.
_PRIORITY: tuple[str, ...] = (
    # r1 driver failures, fixed this round
    "agg_groupby_single",
    "agg_approx_quantile",
    # flagship marts (reference's whole point; zero driver evidence yet)
    "mart_supplier_performance",
    "mart_product_performance",
    "mart_customer_sales_report",
    # aggregates rewritten onto exact decimal sums this round
    "agg_groupby_multi",
    "agg_sum_expr",
    "agg_avg",
    "agg_histogram",
    "null_fillna_map",
    # r1-unchecked core tail
    "fn_date_math",
    "fn_str_value",
    "fn_json_extract",
    "dq_duplicate_gate",
    "dq_snapshot_stamp",
    # real JDBC round-trip (embedded Derby; src_jdbc + snk_jdbc evidence)
    "snk_jdbc_roundtrip",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "sort_limit",
    # dedup family
    "dedup_exact",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    # similarity family
    "sim_cosine_topk",
    "sim_cosine_pairs",
    "sim_ivf_topk",
    "sim_lsh_topk",
    # text family
    "txt_token_count",
    "txt_quality",
    "txt_language_id",
    "txt_fingerprint",
    "txt_rolling_fingerprint",
    "txt_tfidf",
    "txt_chunk",
    "txt_repetition",
    "txt_pii_scrub",
    # sampling
    "samp_deterministic",
    "samp_stratified",
    # multimodal plumbing
    "mm_binary_features",
    "mm_resize",
    "mm_frame_sample",
    # remaining r1-unchecked batch queries
    "agg_approx_distinct",
    "agg_pivot",
    "proj_unpivot",
    "agg_percentile",
    "join_asof",
    "join_range",
    # past the 50-cut: driver evidence deferred; pytest holds the line
    # (test_scd.py for scd2_merge, np==JVM equality, stream==batch)
    "scd2_merge",
    "sim_cosine_topk_np",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_attribution_join",
    "stream_dedup_first",
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
