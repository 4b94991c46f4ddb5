"""group_percentiles: two-phase exact lowering vs Spark's buffering
percentile — bit-identical results without any whole-group aggregation
buffer."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_oms_spark.operators.quantiles import group_percentiles


@pytest.fixture(scope="module")
def skewed(spark):
    # one dominant group (the 100 TB hazard shape) + a tiny one + dup values
    rng = random.Random(7)
    rows = [("big", rng.randint(0, 500)) for _ in range(20_000)]
    rows += [("small", v) for v in (1, 2, 2, 3, 100)]
    return spark.createDataFrame(rows, "g STRING, v INT").repartition(8)


def test_hist_matches_buffer_bitexact(skewed):
    probs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    a = group_percentiles(skewed, ["g"], "v", probs, mode="hist", count_col="n")
    b = group_percentiles(skewed, ["g"], "v", probs, mode="buffer", count_col="n")
    ra = {r["g"]: r.asDict() for r in a.collect()}
    rb = {r["g"]: r.asDict() for r in b.collect()}
    assert ra == rb  # exact float equality, not approx


def test_hist_small_group_interpolation(spark):
    # 4 values -> p50 position = 1.5: interpolate between 2 and 3
    df = spark.createDataFrame([("a", 1), ("a", 2), ("a", 3), ("a", 10)], "g STRING, v INT")
    out = group_percentiles(df, ["g"], "v", [0.5], names=["med"]).collect()[0]
    assert out["med"] == 2.5


def test_hist_ignores_nulls_and_counts(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3)], "g STRING, v INT"
    )
    out = group_percentiles(
        df, ["g"], "v", [0.5], names=["med"], count_col="n"
    ).collect()[0]
    assert out["med"] == 2.0 and out["n"] == 2


def test_global_no_groups(spark):
    df = spark.createDataFrame([(i,) for i in range(101)], "v INT")
    out = group_percentiles(df, [], "v", [0.5, 1.0], names=["med", "mx"]).collect()[0]
    assert out["med"] == 50.0 and out["mx"] == 100.0


def test_expression_value_and_approx(skewed):
    expr = F.col("v") * 2
    out = group_percentiles(
        skewed, ["g"], expr, [0.5], names=["med"], mode="approx"
    )
    got = {r["g"]: r["med"] for r in out.collect()}
    assert 400 <= got["big"] <= 600  # sketch of uniform(0,1000) median
    assert got["small"] == 4.0


def test_hist_plan_has_no_buffering_percentile(skewed):
    from etl_oms_spark.util import physical_plan

    plan = physical_plan(
        group_percentiles(skewed, ["g"], "v", [0.5], mode="hist")
    )
    assert "percentile(" not in plan


def test_grouped_ntile_matches_window_ntile(spark):
    """grouped_ntile must equal ntile() OVER (...) bit-for-bit, including
    uneven buckets, groups smaller than n_buckets, and NULL order keys."""
    import random as _random

    from pyspark.sql import Window

    from etl_oms_spark.operators.quantiles import grouped_ntile

    rng = _random.Random(11)
    rows = [("en", i, float(rng.randint(0, 50)) if i % 17 else None)
            for i in range(1000)]
    rows += [("fr", 10_000 + i, float(i % 7)) for i in range(101)]
    rows += [("tiny", 20_000 + i, 1.0) for i in range(2)]  # n < buckets
    df = spark.createDataFrame(rows, "g STRING, id LONG, v DOUBLE").repartition(7)

    order = [F.col("v").asc_nulls_first(), F.col("id").asc()]
    got = grouped_ntile(df, ["g"], order, 3)
    ref = df.withColumn(
        "bucket_ref", F.ntile(3).over(Window.partitionBy("g").orderBy(*order))
    )
    cmp = got.join(ref.select("g", "id", "bucket_ref"), ["g", "id"])
    assert cmp.filter(F.col("bucket") != F.col("bucket_ref")).count() == 0
    assert cmp.count() == df.count()


def test_grouped_ntile_plan_no_group_window(spark):
    """The plan must not contain a window partitioned ONLY by the group
    (the unsplittable shape); local windows carry __pid in their spec."""
    from etl_oms_spark.operators.quantiles import grouped_ntile
    from etl_oms_spark.util import physical_plan

    df = spark.createDataFrame([("a", 1, 1.0)], "g STRING, id LONG, v DOUBLE")
    plan = physical_plan(grouped_ntile(df, ["g"], ["v", "id"], 3))
    assert "ntile" not in plan.lower()
