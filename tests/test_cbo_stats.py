"""Catalog-statistics-driven planning (CBO): ANALYZE TABLE's column
statistics make filter selectivity visible to the cost model, flipping a
selective-filter join from sort-merge to broadcast with NO hint — the
mechanism that lets a 100 TB deployment broadcast `dim WHERE key = ?`
subqueries automatically. Without column stats a Filter's estimated
size is its child's full size (file bytes), so the planner must assume
the filtered side is still huge; with ANALYZE ... FOR COLUMNS the
equality-selectivity estimate (≈ rows/NDV) drops the estimate below
`autoBroadcastJoinThreshold`. Plan-asserted on the static plan (AQE off
for the duration, restored after)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cbo_session(spark):
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.cbo.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql("DROP TABLE IF EXISTS cbo_probe")
    yield spark
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql("DROP TABLE IF EXISTS cbo_probe")
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _table_bytes(spark, name):
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    path = loc.removeprefix("file:")
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
    )


def _join_plan(spark, custkey):
    df = spark.sql(
        "SELECT p.o_orderkey FROM cbo_probe p JOIN "
        f"(SELECT * FROM cbo_fact WHERE o_custkey = {custkey}) f "
        "ON p.o_orderkey = f.o_orderkey"
    )
    return df, df._jdf.queryExecution().executedPlan().toString()


def test_column_stats_flip_selective_join_to_broadcast(cbo_session):
    spark = cbo_session
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    orders.write.mode("overwrite").saveAsTable("cbo_fact")
    lineitem.selectExpr("l_orderkey AS o_orderkey").write.mode(
        "overwrite"
    ).saveAsTable("cbo_probe")
    # threshold well below the column-pruned no-stats estimate (which
    # only scales file bytes by projected row width) but far above the
    # equality estimate rows/NDV(o_custkey) — so ONLY a
    # selectivity-aware planner can broadcast the filtered side
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold",
        str(max(_table_bytes(spark, "cbo_fact") // 20, 8192)),
    )
    custkey = orders.selectExpr("min(o_custkey) AS k").collect()[0]["k"]

    # no column stats: the Filter inherits the table's full size
    _, before = _join_plan(spark, custkey)
    assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before

    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
    spark.sql(
        "ANALYZE TABLE cbo_fact COMPUTE STATISTICS "
        "FOR COLUMNS o_custkey, o_orderkey"
    )
    df, after = _join_plan(spark, custkey)
    assert "BroadcastHashJoin" in after and "SortMergeJoin" not in after

    # strategy changed, semantics didn't
    expect = (
        lineitem.join(
            orders.filter(f"o_custkey = {custkey}").select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        ).count()
    )
    assert df.count() == expect > 0


def test_analyze_records_rowcount_and_column_stats(cbo_session):
    spark = cbo_session
    nation = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
    nation.write.mode("overwrite").saveAsTable("cbo_fact")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
    desc = spark.sql("DESCRIBE TABLE EXTENDED cbo_fact").collect()
    stats = [r for r in desc if r["col_name"] == "Statistics"]
    assert stats and "25 rows" in stats[0]["data_type"]

    spark.sql(
        "ANALYZE TABLE cbo_fact COMPUTE STATISTICS FOR COLUMNS n_nationkey"
    )
    kv = {
        r["info_name"]: r["info_value"]
        for r in spark.sql("DESCRIBE EXTENDED cbo_fact n_nationkey").collect()
    }
    assert kv.get("distinct_count") == "25"
    assert kv.get("min") == "0" and kv.get("max") == "24"
