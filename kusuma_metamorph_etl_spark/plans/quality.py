"""Data-quality gates (`dq_duplicate_gate` + friends, SURVEY.md §2.9).

The reference's distinctive runtime check is a fail-fast primary-key
uniqueness gate: ``groupBy(pk).agg(count('*')).filter(cnt > 1)`` and raise
(``/root/reference/ETL-Airflow/dags/tasks/transform_utils.py:79-92``).  Its
error loses the offending keys (bug B5) and the full-aggregation plan keeps
every group even though the gate only needs *one* violation.  The engine:

* reports sample offending keys + counts in the exception,
* short-circuits with ``limit(sample)`` — Catalyst stops the scan early
  once enough violating groups are found (LocalLimit above the agg),
* leaves the input plan untouched (pure check, no caching side effects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DuplicateKeyError(Exception):
    """Primary-key uniqueness violated; carries sample keys + counts."""

    def __init__(self, keys: list[str], samples: list[dict]):
        self.keys = keys
        self.samples = samples
        preview = ", ".join(str(s) for s in samples[:5])
        super().__init__(
            f"duplicate primary key(s) on {keys}: {preview}"
            + (" …" if len(samples) > 5 else "")
        )


class SchemaMismatchError(Exception):
    pass


class NullPolicyError(Exception):
    pass


def find_duplicates(df: DataFrame, keys: list[str]) -> DataFrame:
    """Groups violating PK uniqueness, with their multiplicities.

    Scale note: a straight ``groupBy(pk).count()`` — partial (map-side)
    aggregation makes this one shuffle of already-collapsed groups.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("duplicate_count"))
        .filter(F.col("duplicate_count") > 1)
    )


def duplicate_gate(df: DataFrame, keys: list[str], sample: int = 20) -> DataFrame:
    """Raise :class:`DuplicateKeyError` if ``keys`` are not unique in ``df``.

    Returns ``df`` unchanged so it composes as a pipeline stage.
    """
    violations = find_duplicates(df, keys).limit(sample).collect()
    if violations:
        raise DuplicateKeyError(keys, [row.asDict() for row in violations])
    return df


def assert_schema(df: DataFrame, expected_columns: list[str]) -> DataFrame:
    """Fail fast when the frame's columns deviate from the declared contract
    (the reference's implicit contract is its rename-normalize step;
    SURVEY.md §1)."""
    actual = list(df.columns)
    if actual != list(expected_columns):
        raise SchemaMismatchError(
            f"schema contract violated: expected {list(expected_columns)}, got {actual}"
        )
    return df


def null_policy(df: DataFrame, not_null: list[str], sample: int = 20) -> DataFrame:
    """Raise :class:`NullPolicyError` if any NOT-NULL mart column holds
    nulls (test-strategy property 4, SURVEY.md §5)."""
    predicate = None
    for column in not_null:
        check = F.col(column).isNull()
        predicate = check if predicate is None else (predicate | check)
    if predicate is None:
        return df
    offenders = df.filter(predicate).limit(sample).collect()
    if offenders:
        raise NullPolicyError(
            f"null values in NOT-NULL columns {not_null}: "
            f"{[row.asDict() for row in offenders[:5]]}"
        )
    return df
