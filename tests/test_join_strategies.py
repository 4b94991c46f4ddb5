"""Join-strategy control: hints are honored, and identical subtree
branches dedup via ReusedExchange (the rule SCALING.md's checkpoint
placement decisions are built on)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_hints_select_the_hinted_strategy(spark):
    a = spark.range(0, 50_000).select(F.col("id").alias("k"), F.col("id").alias("va"))
    b = spark.range(0, 5_000).select(F.col("id").alias("k"), F.col("id").alias("vb"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # no auto-broadcast: the strategy below is chosen by the HINT alone
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        j = a.join(b.hint("broadcast"), "k")
        j.collect()
        assert "BroadcastHashJoin" in _plan(j)

        j = a.join(b.hint("shuffle_hash"), "k")
        j.collect()
        assert "ShuffledHashJoin" in _plan(j)

        j = a.join(b.hint("merge"), "k")
        j.collect()
        assert "SortMergeJoin" in _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_identical_branches_reuse_one_exchange(spark):
    """Two branches built from the SAME aggregated subtree must show a
    ReusedExchange in the executed plan — the engine dedups the shuffle,
    which is why identical self-join branches need NO localCheckpoint
    (measured in SCALING.md: adding one there was slower)."""
    base = (
        spark.range(0, 20_000)
        .select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    left = base.select(F.col("k").alias("ka"), F.col("s").alias("sa"))
    right = base.select(F.col("k").alias("kb"), F.col("s").alias("sb"))
    j = left.join(right, F.col("ka") == F.col("kb")).select(
        F.count(F.lit(1)).alias("n")
    )
    assert j.collect()[0]["n"] == 100
    assert "ReusedExchange" in _plan(j)
