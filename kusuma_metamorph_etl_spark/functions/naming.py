"""Column-name canonicalization (`proj_normalize_names`, `proj_family`).

The reference's de-facto schema contract is trim + upper-case +
spaces→underscores over every source column, applied both as explicit
``withColumnRenamed`` chains and a generic loop
(``/root/reference/ETL-Airflow/dags/tasks/ingestion_task.py:8-12,29-34``).
The engine does it in one ``toDF`` (a single projection node in the plan,
instead of N chained renames — N analyzer passes on a wide table is real
planning overhead at 100+ columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_name(name: str) -> str:
    """trim → UPPER → spaces/dashes → underscores."""
    return name.strip().upper().replace(" ", "_").replace("-", "_")


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Apply :func:`normalize_name` to every column in one projection."""
    return df.toDF(*[normalize_name(c) for c in df.columns])


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename selected columns (single projection; order preserved)."""
    return df.toDF(*[mapping.get(c, c) for c in df.columns])


def surrogate_key(*cols, seed: str = "sk") -> "Column":
    """Deterministic surrogate key from natural-key columns: the first
    16 hex chars of md5(seed|col1|col2|...) as an uppercase string — the
    dimension-key generator for SCD pipelines where natural keys are
    composite or unstable across sources.  Content-derived, so the same
    entity gets the same key on any cluster, any engine, any re-run
    (monotonic ids — ``monotonically_increasing_id`` — are partition-
    dependent and unusable for reproducible dims).  NULL components are
    encoded as the sentinel string '<NULL>' so (NULL, 'x') and
    ('x', NULL) hash differently from each other and from the literal.
    64 bits of key space: collision probability ~n^2/2^65 (birthday) —
    negligible below ~10^8 distinct entities; widen the substring for
    larger dims.
    """
    from pyspark.sql import functions as F

    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit("<NULL>"),
        )
        for c in cols
    ]
    return F.upper(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), *parts)), 1, 16)
    )
