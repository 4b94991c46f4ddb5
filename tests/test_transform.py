"""Transform-core semantics: tolerant casts, lag-diff, guards (F1-F9, W1, A4/A5)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_oms_spark.transform import (
    convert_rate_columns,
    derive_daily_columns,
    filter_min_date,
    lag_diff,
    map_lookup,
    round_geo,
    tolerant_long,
    tolerant_timestamp,
)


def test_tolerant_timestamp_formats_and_coerce(spark):
    df = spark.createDataFrame(
        [("2020-03-01",), ("03/15/2020",), ("garbage",), (None,)], ["d"]
    )
    out = df.select(tolerant_timestamp("d").alias("ts")).collect()
    assert out[0]["ts"] == datetime.datetime(2020, 3, 1)
    assert out[1]["ts"] == datetime.datetime(2020, 3, 15)
    assert out[2]["ts"] is None  # errors="coerce" parity
    assert out[3]["ts"] is None


def test_tolerant_long(spark):
    df = spark.createDataFrame([("12.0",), ("x",), (None,)], ["v"])
    vals = [r["v2"] for r in df.select(tolerant_long("v", default=0).alias("v2")).collect()]
    assert vals == [12, 0, 0]


def test_filter_min_date(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2018, 1, 1),), (datetime.datetime(2020, 1, 1),)], ["date"]
    )
    assert filter_min_date(df).count() == 1


def test_lag_diff_first_row_zero(spark):
    df = spark.createDataFrame(
        [
            ("FR", datetime.datetime(2020, 1, 1), 10),
            ("FR", datetime.datetime(2020, 1, 2), 15),
            ("FR", datetime.datetime(2020, 1, 3), 22),
            ("DE", datetime.datetime(2020, 1, 1), 5),
        ],
        ["country", "date", "confirmed"],
    )
    out = (
        df.withColumn("diff", lag_diff("confirmed", ["country"], ["date"]))
        .orderBy("country", "date")
        .collect()
    )
    assert [r["diff"] for r in out] == [0, 0, 5, 7]  # DE first, FR 0/5/7


def test_derive_daily_all_null_guard(spark):
    df = spark.createDataFrame(
        [
            ("FR", datetime.datetime(2020, 1, 1), 10, None),
            ("FR", datetime.datetime(2020, 1, 2), 15, None),
        ],
        "country string, date timestamp, confirmed long, new_cases long",
    )
    out = derive_daily_columns(df, {"confirmed": "new_cases"})
    vals = {r["date"].day: r["new_cases"] for r in out.collect()}
    assert vals == {1: 0, 2: 5}


def test_derive_daily_guard_respects_existing(spark):
    df = spark.createDataFrame(
        [
            ("FR", datetime.datetime(2020, 1, 1), 10, 99),
            ("FR", datetime.datetime(2020, 1, 2), 15, None),
        ],
        "country string, date timestamp, confirmed long, new_cases long",
    )
    # one non-null value → column NOT entirely null → keep as-is
    out = derive_daily_columns(df, {"confirmed": "new_cases"})
    vals = {r["date"].day: r["new_cases"] for r in out.collect()}
    assert vals == {1: 99, 2: None}


def test_derive_daily_all_zero_guard(spark):
    df = spark.createDataFrame(
        [
            ("FR", datetime.datetime(2020, 1, 1), 10, 0),
            ("FR", datetime.datetime(2020, 1, 2), 15, 0),
        ],
        "country string, date timestamp, confirmed long, new_cases long",
    )
    # all-zero → derive under v4 semantics, not under v1 semantics
    v4 = derive_daily_columns(df, {"confirmed": "new_cases"}, guard="all_zero")
    assert {r["new_cases"] for r in v4.collect()} == {0, 5}
    v1 = derive_daily_columns(df, {"confirmed": "new_cases"}, guard="all_null")
    assert {r["new_cases"] for r in v1.collect()} == {0}


def test_convert_rate_columns(spark):
    df = spark.createDataFrame(
        [("FR", 1000000, None, 2.5)],
        "country string, population long, deaths long, deaths_per_million double",
    )
    out = convert_rate_columns(df).first()
    assert out["deaths"] == 3  # round(2.5 * 1e6 / 1e6) = round(2.5) = 3 (HALF_UP)


def test_round_geo(spark):
    df = spark.createDataFrame([(1.23456789, -9.87654321)], "latitude double, longitude double")
    r = round_geo(df).first()
    assert r["latitude"] == 1.234568
    assert r["longitude"] == -9.876543


def test_map_lookup_default(spark):
    df = spark.createDataFrame([("confirmed",), ("weird",)], ["i"])
    out = df.select(map_lookup("i", {"confirmed": "cases"}).alias("u")).collect()
    assert [r["u"] for r in out] == ["cases", "unknown"]
