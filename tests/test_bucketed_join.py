"""Bucketed co-located joins: the pay-the-shuffle-once storage layout.

Two tables bucketed on the same key with the same bucket count must join
with ZERO Exchange in the physical plan — the 100 TB answer for repeated
fact-to-fact joins, asserted here at plan level, not just claimed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_oms_spark.sources.writers import write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("vb")
    )
    write_bucketed_table(a, "t_bucket_a", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed_table(b, "t_bucket_b", ["k"], num_buckets=8, sort_cols=["k"])
    yield "t_bucket_a", "t_bucket_b"
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        # force a sort-merge join so the shuffle would be visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(spark.table(tb), "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_results_match_plain_join(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = sorted(
        (r["k"], r["va"], r["vb"])
        for r in spark.table(ta).join(spark.table(tb), "k").collect()
    )
    want = sorted((k, k * 2, k + 7) for k in range(0, 1000, 3))
    assert got == want


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = spark.table(ta).groupBy("k").agg(F.sum("va").alias("s"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # groupBy on the bucket key reuses the bucketing — no shuffle either
    assert "Exchange" not in plan, plan[:2000]
