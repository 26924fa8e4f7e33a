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
# ROUND-5 WINDOW (the rotation VERDICT r4 Next #1 ordered; the r3/r4
# window — events fixes, never-checked r2 additions, streaming twins —
# is all green as of CORRECTNESS_r04 and demoted below the cut):
#   1. the 9 decimal_sum/decimal_avg consumers whose `_exact_sum` kernel
#      was rewritten in r3 (commit 48cf391) and re-guarded in r4 but last
#      oracle-checked in r2, on the old kernel;
#   2. new round-5 registrations (the oracle-bound approx companions);
#   3. the 13 rows whose only evidence is round 1;
#   4. r2-only oracle-bearing rows, oldest-first by family.
# Deferred to the r6 window (rows-only rechecks add least evidence, and
# the window is exactly 50): agg_approx_quantile, dedup_minhash_lsh,
# dedup_simhash, sim_ivf_topk, sim_lsh_topk (all rows-only by design)
# plus the six cheapest unchanged txt_* rows (chunk, fingerprint,
# rolling_fingerprint, repetition, token_count, language_id).  r6 should
# front-load those 11, then the oldest r4 rows.
_PRIORITY: tuple[str, ...] = (
    # (1) decimal-sum consumers — kernel changed r3+r4, evidence from r2
    "agg_groupby_single",
    "agg_groupby_multi",
    "agg_sum_expr",
    "agg_avg",
    "agg_histogram",
    "null_fillna_map",
    "mart_supplier_performance",
    "mart_product_performance",
    "mart_customer_sales_report",
    # (2) new round-5 registrations: approx family, now oracle-bound
    "agg_approx_distinct_err",
    "agg_approx_quantile_err",
    # (3) r1-only evidence
    "proj_select",
    "proj_rename",
    "proj_alias",
    "proj_drop",
    "expr_lit",
    "fil_neq",
    "fil_isin",
    "fil_cmp",
    "fil_conj",
    "fil_isnull",
    "join_left_equi",
    "join_right_equi",
    "join_inner_equi",
    # (4) r2-only evidence, oracle-bearing
    "agg_percentile",
    "agg_pivot",
    "proj_unpivot",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "sort_limit",
    "dq_duplicate_gate",
    "dq_snapshot_stamp",
    "fn_date_math",
    "fn_str_value",
    "snk_jdbc_roundtrip",
    "dedup_exact",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "sim_cosine_topk",
    "sim_cosine_pairs",
    "samp_deterministic",
    "samp_stratified",
    "mm_binary_features",
    "mm_resize",
    "mm_frame_sample",
    "txt_quality",
    "txt_pii_scrub",
    "txt_tfidf",
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
