"""Skew mitigation: salted joins (SURVEY.md §4 scale notes).

AQE's skew-join split (enabled in session.py) handles sort-merge skew at
runtime, but a *hash* join on a hot key — one customer with 10% of all
events, the null key, a default value — still lands the hot partition on
one task.  Salting is the static fix: widen the join key with a salt in
[0, buckets) on the big side and replicate the small side once per salt
value, so the hot key spreads over ``buckets`` tasks.

The salt must be deterministic (task retries must re-derive the same
salt, or a retried partition joins differently): it is a hash of the
whole row, not a random number.

Cited parity: the reference has no skew handling (its joins are
dim-table-sized); this operator exists for the 100 TB target where fact ⋈
fact joins meet power-law keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, buckets: int, salt_col: str = SALT) -> DataFrame:
    """Deterministic per-row salt in [0, buckets): xxhash64 over the
    row's HASHABLE columns.  Identical rows share a salt — harmless,
    they'd land in the same task anyway.

    Map-typed columns are excluded from the hash: xxhash64 rejects
    MapType at analysis, so salting the wide event-fact schemas this
    operator exists for crashed outright (r8 review).  Spread quality is
    unaffected — any one distinct column already decorrelates the salt
    from the join key.  An all-map row (no hashable column at all) gets
    salt 0, the degenerate no-spread case, declared."""
    from pyspark.sql.types import MapType

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if hasattr(dt, "elementType"):
            return _has_map(dt.elementType)
        if hasattr(dt, "fields"):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    hashable = [
        f.name for f in df.schema.fields if not _has_map(f.dataType)
    ]
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(buckets))
        if hashable
        else F.lit(0)
    )
    return df.withColumn(salt_col, salt)


def replicate_salts(df: DataFrame, buckets: int, salt_col: str = SALT) -> DataFrame:
    """Replicate every row once per salt value (the small/broadcastless
    side of a salted join).  Fixed fan-out = ``buckets``."""
    return df.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the hot-key pressure spread
    over ``buckets`` tasks.

    Semantics match ``big.join(small, on, how)`` exactly for ``inner`` and
    ``left``: each big-side row carries ONE salt and the small side exists
    once per salt value, so multiplicities are unchanged.  ``right``/
    ``full`` would need the salting mirrored — rejected explicitly.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    salted_big = with_salt(big, buckets)
    salted_small = replicate_salts(small, buckets)
    return salted_big.join(salted_small, on=[*on, SALT], how=how).drop(SALT)
