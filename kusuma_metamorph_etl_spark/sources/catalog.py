"""Parquet table catalog over a scale-factor directory.

Test data layout (TESTDATA.md): ``{sf_dir}/{table}.parquet`` for the TPC-H-ish
star schema plus ``events``/``documents``/``embeddings``.  Parquet scans are
the engine's canonical source: columnar, with predicate pushdown and column
pruning handled by Catalyst (`src_parquet_scan` in SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table.  Lazy — no job runs until an action."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several catalog tables at once."""
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}
