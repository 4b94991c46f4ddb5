"""Incremental materialized-aggregate maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_refresh_aggregate_matches_full_recompute(spark, tmp_path):
    from etl_oms_spark.sources.merge_table import refresh_aggregate

    agg = str(tmp_path / "agg")

    def batch(rows):
        return spark.createDataFrame(rows, "day STRING, k STRING, v LONG")

    b1 = batch([("d1", "a", 1), ("d1", "a", 2), ("d1", "b", 5), ("d2", "a", 7)])
    refresh_aggregate(spark, agg, b1, ["day", "k"], ["v"], "day")
    got = {(r["day"], r["k"]): (r["v"], r["n_rows"])
           for r in spark.read.parquet(agg).collect()}
    assert got == {("d1", "a"): (3, 2), ("d1", "b"): (5, 1), ("d2", "a"): (7, 1)}

    # delta touches d1 only; d2 partition must be byte-identical (untouched)
    import os
    d2_files = sorted(os.listdir(os.path.join(agg, "day=d2")))
    b2 = batch([("d1", "a", 10), ("d1", "c", 1)])
    refresh_aggregate(spark, agg, b2, ["day", "k"], ["v"], "day")
    got = {(r["day"], r["k"]): (r["v"], r["n_rows"])
           for r in spark.read.parquet(agg).collect()}
    full = batch([("d1", "a", 1), ("d1", "a", 2), ("d1", "b", 5), ("d2", "a", 7),
                  ("d1", "a", 10), ("d1", "c", 1)])
    want = {(r["day"], r["k"]): (r["v"], r["n"]) for r in full.groupBy("day", "k")
            .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    assert sorted(os.listdir(os.path.join(agg, "day=d2"))) == d2_files
