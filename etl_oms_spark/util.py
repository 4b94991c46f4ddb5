"""Small planning utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str, target: int | None = None) -> DataFrame:
    """Repartition up if the input has fewer partitions than the cluster can
    use — guards compute-heavy per-row stages (shingle explode, vector
    folds) against the small-file/single-row-group case where a parquet
    scan yields 1 partition and serializes onto one core.

    No-op when the source is already parallel (the common case at scale —
    a 100 TB table arrives in thousands of splits), so well-partitioned
    inputs pay nothing. ``key_cols`` make the redistribution deterministic
    (hash partitioning on the key) and pre-align a later groupBy on the
    same key.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
