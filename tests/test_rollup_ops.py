"""Algebraic rollup-state maintenance (incremental MV merge)."""

from __future__ import annotations


def test_merge_rollup_state(spark):
    from etl_oms_spark.operators.rollup import merge_rollup_state

    state = spark.createDataFrame(
        [("a", 1, 10, 100), ("b", 1, 5, 50)],
        "k1 string, k2 int, n long, s long",
    )
    delta = spark.createDataFrame(
        [("a", 1, 2, 20), ("c", 2, 7, 70)],
        "k1 string, k2 int, n long, s long",
    )
    out = {
        (r["k1"], r["k2"]): (r["n"], r["s"])
        for r in merge_rollup_state(state, delta, ["k1", "k2"], ["n", "s"]).collect()
    }
    # matched keys sum, state-only and delta-only pass through
    assert out == {("a", 1): (12, 120), ("b", 1): (5, 50), ("c", 2): (7, 70)}
