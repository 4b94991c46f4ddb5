"""Per-group cap sampling (domain balancing) and time-spine resample/ffill."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_per_group_cap_limits_and_determinism(spark):
    from etl_oms_spark.operators.sampling import per_group_cap

    rows = [(i, "big" if i < 94 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")

    out = per_group_cap(df, ["source"], "doc_id", cap=10)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["big"] == 10
    assert counts["small"] == 6  # under the cap: kept whole

    # deterministic: identical kept-set after an arbitrary repartition
    kept1 = sorted(r["doc_id"] for r in out.collect())
    kept2 = sorted(
        r["doc_id"]
        for r in per_group_cap(df.repartition(7), ["source"], "doc_id", cap=10).collect()
    )
    assert kept1 == kept2


def test_per_group_cap_md5_portable(spark):
    """md5 method reproduces the documented portable-bucket formula."""
    import hashlib

    from etl_oms_spark.operators.sampling import per_group_cap

    rows = [(i, "s") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    out = per_group_cap(df, ["source"], "doc_id", cap=5, method="md5")
    kept = sorted(r["doc_id"] for r in out.collect())

    def bucket(i: int) -> int:
        return int(hashlib.md5(f"cap|{i}".encode()).hexdigest()[:15], 16) % 1_000_000

    expect = sorted(sorted(range(50), key=lambda i: (bucket(i), i))[:5])
    assert kept == expect


@pytest.fixture()
def sparse_events(spark):
    rows = [
        (1, _ts("2024-01-01T03:00:00"), 10),
        (1, _ts("2024-01-01T09:00:00"), 30),  # same day: max wins
        (1, _ts("2024-01-04T00:30:00"), 7),   # 2-day gap before this
        (2, _ts("2024-01-02T12:00:00"), 5),
    ]
    return spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, v LONG")


def test_resample_ffill_spine_and_fill(sparse_events):
    from etl_oms_spark.operators.temporal import resample_ffill

    out = resample_ffill(sparse_events, "user_id", "ts", "v", step="1 day", agg="max")
    rows = {(r["user_id"], str(r["bucket_ts"])[:10]): r for r in out.collect()}
    # user 1 spans Jan 1..4 -> 4 buckets; user 2 a single bucket
    assert len(rows) == 5
    assert rows[(1, "2024-01-01")]["n_events"] == 2
    assert rows[(1, "2024-01-01")]["v_filled"] == 30  # per-bucket max
    # gap days: 0 events, value carried forward
    for day in ("2024-01-02", "2024-01-03"):
        assert rows[(1, day)]["n_events"] == 0
        assert rows[(1, day)]["v_filled"] == 30
    assert rows[(1, "2024-01-04")]["v_filled"] == 7
    assert rows[(2, "2024-01-02")]["n_events"] == 1 and rows[(2, "2024-01-02")]["v_filled"] == 5


def test_resample_ffill_multicount_step(spark):
    """Steps with count > 1 bucket on the epoch grid — observations landing
    between 1-unit truncation points must aggregate into the covering
    bucket, not silently vanish off the spine."""
    from etl_oms_spark.operators.temporal import resample_ffill

    rows = [
        (1, _ts("2024-01-01T00:10:00"), 1),
        (1, _ts("2024-01-01T03:00:00"), 5),   # falls in the 02:00 bucket
        (1, _ts("2024-01-01T07:59:00"), 9),   # 06:00 bucket
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, v LONG")
    out = resample_ffill(df, "user_id", "ts", "v", step="2 hours", agg="max")
    got = {str(r["bucket_ts"])[11:16]: (r["n_events"], r["v_filled"])
           for r in out.collect()}
    # spine 00:00..06:00 every 2h; every observation lands on a spine bucket
    assert got == {
        "00:00": (1, 1),
        "02:00": (1, 5),
        "04:00": (0, 5),   # gap: carried forward
        "06:00": (1, 9),
    }
    assert sum(n for n, _ in got.values()) == 3  # nothing dropped


def test_resample_ffill_multicount_calendar_raises(spark):
    import pytest as _pytest

    from etl_oms_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 1)], "user_id INT, ts TIMESTAMP, v LONG"
    )
    with _pytest.raises(ValueError, match="calendar unit"):
        resample_ffill(df, "user_id", "ts", "v", step="2 months")
