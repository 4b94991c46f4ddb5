"""Deterministic sampling and splitting for training-data pipelines.

Random sampling (``df.sample``) is seed-dependent AND partitioning-
dependent — re-running on a repartitioned table yields a different sample.
These operators key the decision on a HASH of a stable column instead:
the same row lands in the same split on any cluster, any partitioning,
any day — the property training pipelines need for reproducible
train/eval splits and for sampling that survives incremental re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Stable bucket in [0, 1e6) from xxhash64(salt, key)."""
    return F.pmod(F.xxhash64(F.lit(salt), key), F.lit(_BUCKETS))


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by key hash — reproducible and
    consistent across keys: the same key is either always in or always out
    (useful for user-level sampling where all of a user's rows must move
    together — pass the user id as the key)."""
    return df.filter(_hash_bucket(F.col(key_col), salt) < int(rate * _BUCKETS))


def train_test_split(
    df: DataFrame,
    test_rate: float = 0.1,
    key_col: str = "doc_id",
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """(train, test) with disjoint, exhaustive, hash-stable membership."""
    bucket = _hash_bucket(F.col(key_col), salt)
    cut = int(test_rate * _BUCKETS)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%,
    keep all 'fr'): the rate is looked up per row from a literal CASE, the
    keep-decision stays hash-stable."""
    rate_col = None
    for value, rate in rates.items():
        cond = F.col(strata_col) == value
        branch = F.lit(int(rate * _BUCKETS))
        rate_col = F.when(cond, branch) if rate_col is None else rate_col.when(cond, branch)
    rate_col = (
        rate_col.otherwise(F.lit(int(default_rate * _BUCKETS)))
        if rate_col is not None
        else F.lit(int(default_rate * _BUCKETS))
    )
    return df.filter(_hash_bucket(F.col(key_col), salt) < rate_col)
