"""[EXT] Reproducible sampling operators for training-data pipelines.

``DataFrame.sample`` is Bernoulli per-partition: the selected rows change
whenever partitioning, Spark version, or seed plumbing changes — useless
for a 100 TB pipeline that must re-produce the same held-out split across
reruns and engines.  The deterministic variants here key the decision on a
content hash (md5 of the row key), so the same row always lands on the
same side of the split, on any cluster, in any engine that has md5 —
which also makes them oracle-checkable in ANSI SQL.

All operators are narrow (filter on a hash expression — no shuffle) and
whole-stage-codegen'd; the filter is NOT parquet-pushable (expression on a
computed value), so at scale pair with partition pruning on real columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, seed: str = "42") -> Column:
    """First byte of md5(seed|key) as a lowercase 2-hex-char string.

    A uniform 256-way bucket usable for sampling (``< threshold``) and
    train/validation splits (disjoint hex ranges).  String comparison on
    the hex prefix is engine-portable (identical in Spark and ANSI SQL);
    no integer conversion needed.
    """
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(seed), key.cast("string"))), 1, 2
    )


def deterministic_sample(
    df: DataFrame, key: Column, rate: float = 0.1, seed: str = "42"
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``round(rate*256)`` — a
    reproducible ~``rate`` sample keyed on content, not partition layout."""
    threshold = format(max(0, min(256, round(rate * 256))), "02x")
    return df.filter(hash_bucket(key, seed) < F.lit(threshold))


def split_train_holdout(
    df: DataFrame, key: Column, holdout: float = 0.1, seed: str = "42"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, holdout) split on the same hash —
    the reproducible-split primitive for eval-set hygiene at scale."""
    threshold = format(max(0, min(256, round(holdout * 256))), "02x")
    bucket = hash_bucket(key, seed)
    return (
        df.filter(bucket >= F.lit(threshold)),
        df.filter(bucket < F.lit(threshold)),
    )
