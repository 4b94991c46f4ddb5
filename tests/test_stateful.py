"""Sessionization + grouped-map custom operators."""

from __future__ import annotations

import datetime

from etl_oms_spark.operators.stateful import (
    grouped_ema,
    running_distinct_users,
    sessionize,
)


def _events(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    rows = [
        # user 1: two sessions (gap > 10min between 3rd and 4th)
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + datetime.timedelta(minutes=5), 1, "click", 2.0, "{}"),
        (3, t0 + datetime.timedelta(minutes=9), 1, "view", 3.0, "{}"),
        (4, t0 + datetime.timedelta(minutes=40), 1, "click", 4.0, "{}"),
        # user 2: one session
        (5, t0, 2, "view", 5.0, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_sessionize_gap_semantics(spark):
    out = sessionize(_events(spark), gap="10 minutes")
    rows = sorted(
        ((r["user_id"], r["n_events"], r["session_value"]) for r in out.collect())
    )
    assert rows == [(1, 1, 4.0), (1, 3, 6.0), (2, 1, 5.0)]
    s1 = [r for r in out.collect() if r["user_id"] == 1 and r["n_events"] == 3][0]
    # session end = last event + gap
    assert s1["session_end"] - s1["session_start"] == datetime.timedelta(minutes=19)


def test_sessionize_without_value_column(spark):
    # frames without a 'value' column sessionize fine — the value aggregate
    # is skipped instead of failing to resolve
    ev = _events(spark).drop("value")
    out = sessionize(ev, gap="10 minutes")
    assert "session_value" not in out.columns
    rows = sorted((r["user_id"], r["n_events"]) for r in out.collect())
    assert rows == [(1, 1), (1, 3), (2, 1)]


def test_grouped_ema_recursion(spark):
    out = grouped_ema(_events(spark), alpha=0.5)
    u1 = sorted(
        ((r["ts"], r["ema"]) for r in out.collect() if r["user_id"] == 1)
    )
    emas = [e for _, e in u1]
    # ema: 1.0, 0.5*2+0.5*1=1.5, 0.5*3+0.5*1.5=2.25, 0.5*4+0.5*2.25=3.125
    assert emas == [1.0, 1.5, 2.25, 3.125]


def test_running_distinct_users(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 1),
        (2, dt.datetime(2024, 1, 1, 9), 2),
        (3, dt.datetime(2024, 1, 2, 5), 1),  # returning user — not new
        (4, dt.datetime(2024, 1, 2, 6), 3),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["day"].day: (r["new_users"], r["total_users"])
           for r in running_distinct_users(ev).collect()}
    assert out == {1: (2, 2), 2: (1, 3)}


def test_funnel_ordered_stages(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0)

    def m(mins):
        return t0 + datetime.timedelta(minutes=mins)

    from etl_oms_spark.operators.stateful import funnel

    rows = [
        # u1: full ordered funnel
        (1, m(0), 1, "view", 0.0, "{}"),
        (2, m(1), 1, "click", 0.0, "{}"),
        (3, m(2), 1, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE view/click → only stage 1 (view) counts later
        (4, m(0), 2, "purchase", 0.0, "{}"),
        (5, m(1), 2, "view", 0.0, "{}"),
        # u3: click simultaneous with view — strict > means click not counted
        (6, m(0), 3, "view", 0.0, "{}"),
        (7, m(0), 3, "click", 0.0, "{}"),
        # u4: noise event types ignored; later click counts
        (8, m(0), 4, "view", 0.0, "{}"),
        (9, m(1), 4, "scroll", 0.0, "{}"),
        (10, m(2), 4, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r["user_id"]: r
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out[1]["stage"] == 3 and out[1]["t_purchase"] == m(2)
    assert out[2]["stage"] == 1 and out[2]["t_click"] is None
    assert out[3]["stage"] == 1  # simultaneous events never chain
    assert out[4]["stage"] == 2 and out[4]["t_click"] == m(2)


def test_funnel_first_qualifying_timestamp(spark):
    # The FIRST click after the first view is kept, not a later one.
    t0 = datetime.datetime(2024, 1, 1)

    def m(mins):
        return t0 + datetime.timedelta(minutes=mins)

    from etl_oms_spark.operators.stateful import funnel

    ev = spark.createDataFrame(
        [(1, m(0), 1, "view"), (2, m(5), 1, "click"), (3, m(9), 1, "click")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    row = funnel(ev, ["view", "click"]).collect()[0]
    assert row["t_click"] == m(5) and row["stage"] == 2
