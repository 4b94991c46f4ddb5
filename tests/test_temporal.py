"""As-of join and range join semantics."""

from __future__ import annotations

import datetime

from etl_oms_spark.operators.temporal import asof_join, range_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(30), 200.0), (2, _ts(5), 50.0)],
        "sym int, ts timestamp, trade_px double",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(9), 99.0), (1, _ts(10), 101.0), (1, _ts(20), 150.0), (2, _ts(6), 51.0)],
        "sym int, ts timestamp, quote_px double",
    )
    out = asof_join(trades, quotes, on="ts", by=["sym"], value_cols=["quote_px"])
    got = {(r["sym"], r["ts"].minute): r["quote_px"] for r in out.collect()}
    # exact tie at :10 matches; :30 picks latest (:20); sym 2 has no quote <= :5
    assert got == {(1, 10): 101.0, (1, 30): 150.0, (2, 5): None}
    assert out.count() == trades.count()  # left-join cardinality


def test_asof_join_tolerance(spark):
    trades = spark.createDataFrame(
        [(1, _ts(30), 1.0)], "sym int, ts timestamp, v double"
    )
    quotes = spark.createDataFrame(
        [(1, _ts(10), 9.0)], "sym int, ts timestamp, quote_px double"
    )
    loose = asof_join(trades, quotes, "ts", ["sym"], ["quote_px"])
    tight = asof_join(trades, quotes, "ts", ["sym"], ["quote_px"], tolerance="600")
    assert loose.first()["quote_px"] == 9.0
    assert tight.first()["quote_px"] is None  # 20 min > 600 s tolerance


def test_asof_join_name_collision_suffix(spark):
    left = spark.createDataFrame([(1, _ts(10), 5.0)], "k int, ts timestamp, v double")
    right = spark.createDataFrame([(1, _ts(9), 7.0)], "k int, ts timestamp, v double")
    out = asof_join(left, right, "ts", ["k"], ["v"])
    row = out.first()
    assert row["v"] == 5.0 and row["v_right"] == 7.0


def test_range_join_point_in_interval(spark):
    points = spark.createDataFrame(
        [(1, 15), (2, 25), (3, 105), (4, 300)], "pid int, x long"
    )
    intervals = spark.createDataFrame(
        [(10, 0, 30), (11, 100, 110), (12, 20, 27)], "iid int, lo long, hi long"
    )
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=16)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 10), (2, 10), (2, 12), (3, 11)]


def test_range_join_timestamps(spark):
    points = spark.createDataFrame([(1, _ts(15))], "pid int, ts timestamp")
    intervals = spark.createDataFrame(
        [(7, _ts(10), _ts(20)), (8, _ts(30), _ts(40))],
        "iid int, lo timestamp, hi timestamp",
    )
    out = range_join(points, intervals, "ts", "lo", "hi", bucket_width=300)
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 7)]


def test_range_join_auto_bucket_width(spark):
    """bucket_width=None derives the median interval span and must produce
    the same matches as an explicit width."""
    import datetime

    from etl_oms_spark.operators.temporal import range_join, suggest_bucket_width

    base = datetime.datetime(2022, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + datetime.timedelta(minutes=7 * i)) for i in range(40)],
        "point_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, base + datetime.timedelta(minutes=30 * j),
             base + datetime.timedelta(minutes=30 * j + 20))
            for j in range(8)
        ],
        "iv_id long, start timestamp, end timestamp",
    )
    width = suggest_bucket_width(ivs, "start", "end")
    assert width == 20 * 60  # all spans are 20 minutes → median 1200s
    auto = range_join(pts, ivs, "ts", "start", "end").collect()
    explicit = range_join(pts, ivs, "ts", "start", "end", bucket_width=600).collect()
    key = lambda r: (r["point_id"], r["iv_id"])  # noqa: E731
    assert sorted(map(key, auto)) == sorted(map(key, explicit))
    assert len(auto) > 0


def test_asof_join_forward(spark):
    import datetime as dt

    from etl_oms_spark.operators.temporal import asof_join

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [("a", t("2024-01-01T00:10:00")), ("a", t("2024-01-01T02:00:00"))],
        "k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [("a", t("2024-01-01T00:30:00"), 1.0), ("a", t("2024-01-01T01:00:00"), 2.0)],
        "k STRING, ts TIMESTAMP, q DOUBLE",
    )
    out = asof_join(left, right, "ts", by=["k"], direction="forward")
    got = {r["ts"]: r["q"] for r in out.collect()}
    # 00:10 -> next quote at 00:30; 02:00 has no future quote
    assert got[t("2024-01-01T00:10:00")] == 1.0
    assert got[t("2024-01-01T02:00:00")] is None

    # tolerance: next quote must be within 10 minutes
    tight = asof_join(left, right, "ts", by=["k"], direction="forward", tolerance="600")
    got = {r["ts"]: r["q"] for r in tight.collect()}
    assert got[t("2024-01-01T00:10:00")] is None


def test_interval_overlap_join(spark):
    import datetime as dt

    from etl_oms_spark.operators.temporal import interval_overlap_join

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            ("a", t("2024-01-01T00:00:00"), t("2024-01-01T05:00:00")),
            ("a", t("2024-01-02T00:00:00"), t("2024-01-02T01:00:00")),
        ],
        "k STRING, start TIMESTAMP, end TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            ("a", t("2024-01-01T04:00:00"), t("2024-01-01T06:00:00")),  # overlaps #1
            ("a", t("2024-01-01T05:00:00"), t("2024-01-01T07:00:00")),  # touches #1 (inclusive)
            ("a", t("2024-01-03T00:00:00"), t("2024-01-03T01:00:00")),  # no overlap
            ("b", t("2024-01-01T00:00:00"), t("2024-01-01T09:00:00")),  # other key
        ],
        "k STRING, start TIMESTAMP, end TIMESTAMP",
    )
    out = interval_overlap_join(left, right, ["k"], bucket_seconds=1800)
    pairs = {(r["start"].hour, r["start_r"].hour) for r in out.collect()}
    assert pairs == {(0, 4), (0, 5)}
    # exactly one row per overlapping pair despite many shared buckets
    assert out.count() == 2
