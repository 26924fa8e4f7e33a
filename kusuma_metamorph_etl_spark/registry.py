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


def _ensure_loaded() -> None:
    """Import the query modules for their registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from kusuma_metamorph_etl_spark.queries import core, ext, marts  # noqa: F401

    _LOADED = True
