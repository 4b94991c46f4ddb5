"""Fuzzy value pairs, cohort retention, CDC snapshot replay, histogram."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_fuzzy_value_pairs_blocked(spark):
    from etl_oms_spark.reconcile import fuzzy_value_pairs

    df = spark.createDataFrame(
        [("red bolt",), ("red bol",), ("red widget",), ("blue bolt",), (None,)],
        "name STRING",
    )
    out = fuzzy_value_pairs(df, "name", max_dist=2)
    pairs = {(r["value_a"], r["value_b"]): r["dist"] for r in out.collect()}
    # within the "red" block: bolt/bol at dist 1; widget too far
    assert pairs == {("red bol", "red bolt"): 1}
    # "blue bolt" is in another block — never compared against "red bolt"


def test_retention_matrix_offsets(spark):
    from etl_oms_spark.operators.rollup import retention_matrix

    day = 86400
    rows = [
        (1, _ts("2024-01-01T10:00:00")),  # cohort week w0
        (1, _ts("2024-01-09T10:00:00")),  # returns in w1
        (1, _ts("2024-01-09T11:00:00")),  # same week: counted once
        (2, _ts("2024-01-01T12:00:00")),  # cohort w0, never returns
        (3, _ts("2024-01-10T00:00:00")),  # cohort w1
    ]
    ev = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    out = retention_matrix(ev, unit_seconds=7 * day)
    m = {(r["cohort_period"], r["period_offset"]): r["n_users"] for r in out.collect()}
    c0 = min(k[0] for k in m)
    assert m[(c0, 0)] == 2          # users 1 and 2 active in their cohort week
    assert m[(c0, 1)] == 1          # only user 1 returned
    assert m[(c0 + 1, 0)] == 1      # user 3's own cohort


def test_cdc_snapshot_replay(spark):
    from etl_oms_spark.merge import cdc_snapshot

    rows = [
        (1, _ts("2024-01-01T00:00:00"), "I", 10),
        (1, _ts("2024-01-02T00:00:00"), "U", 20),   # latest for user 1
        (2, _ts("2024-01-01T00:00:00"), "I", 5),
        (2, _ts("2024-01-03T00:00:00"), "D", 0),    # user 2 deleted
        (3, _ts("2024-01-01T00:00:00"), "D", 0),
        (3, _ts("2024-01-02T00:00:00"), "I", 7),    # re-created after delete
    ]
    log = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, op STRING, v INT")
    out = cdc_snapshot(log, ["user_id"], "ts", "op", ["v"])
    snap = {r["user_id"]: (r["op"], r["v"]) for r in out.collect()}
    assert snap == {1: ("U", 20), 3: ("I", 7)}
    # idempotent on repartitioned input
    out2 = cdc_snapshot(log.repartition(5), ["user_id"], "ts", "op", ["v"])
    assert {r["user_id"]: (r["op"], r["v"]) for r in out2.collect()} == snap


def test_fixed_width_histogram_edges(spark):
    from etl_oms_spark.transform import fixed_width_histogram

    df = spark.createDataFrame([(v,) for v in range(100)], "x LONG")
    out = fixed_width_histogram(df, "x", n_buckets=10).orderBy("bucket")
    rows = out.collect()
    assert [r["bucket"] for r in rows] == list(range(10))
    assert all(r["n_rows"] == 10 for r in rows)
    assert rows[0]["bucket_lo"] == 0 and rows[0]["bucket_hi"] == 9
    assert rows[-1]["bucket_lo"] == 90 and rows[-1]["bucket_hi"] == 99
    # total preserved
    assert sum(r["n_rows"] for r in rows) == 100


def test_constraint_report_checks(spark):
    from etl_oms_spark.operators.validate import (
        constraint_report,
        fk_orphans,
        pk_violations,
    )

    child = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20), (3, 99)], "id INT, parent_id INT"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid INT")
    dup = pk_violations(child, ["id"])
    assert {(r["id"], r["n_rows"]) for r in dup.collect()} == {(1, 2)}
    orph = fk_orphans(child, parent, "parent_id", "pid")
    assert [r["id"] for r in orph.collect()] == [3]
    rep = constraint_report({"dup_ids": dup, "orphans": orph})
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    assert got == {"dup_ids": 1, "orphans": 1}


def test_perplexity_buckets_tiles(spark):
    from etl_oms_spark.operators.domain import perplexity_buckets

    scores = spark.createDataFrame(
        [(i, 10, -i * 1_000_000, float(-i)) for i in range(1, 7)],
        "doc_id LONG, n_bigrams LONG, logprob_q LONG, avg_logprob DOUBLE",
    )
    docs = spark.createDataFrame([(i, "en") for i in range(1, 7)], "doc_id LONG, lang STRING")
    out = perplexity_buckets(scores, docs, n_buckets=3)
    rows = {r["bucket"]: (r["n_docs"], r["sum_logprob_q"]) for r in out.collect()}
    # ascending avg_logprob: docs 6,5 (worst) -> tile 1; 4,3 -> 2; 2,1 -> 3
    assert rows[1] == (2, -11_000_000)
    assert rows[2] == (2, -7_000_000)
    assert rows[3] == (2, -3_000_000)


def test_psi_drift_zero_on_identical(spark):
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.validate import psi_drift

    df = spark.createDataFrame([(v,) for v in range(200)], "v LONG")
    out = psi_drift(df, df, "v", n_buckets=5)
    rows = out.collect()
    # identical distributions: every per-bucket contribution is exactly 0
    assert all(r["psi_q9"] == 0 for r in rows)
    assert sum(r["n_base"] for r in rows) == 200

    # shifted distribution drifts: total PSI well above the 0.2 threshold
    shifted = spark.createDataFrame([(v + 150,) for v in range(200)], "v LONG")
    drifted = psi_drift(df, shifted, "v", n_buckets=5)
    total = sum(r["psi_q9"] for r in drifted.collect()) / 1e9
    assert total > 0.2


def test_fk_orphans_null_semantics(spark):
    """SQL FK semantics: NULL child keys are never violations; NULL parent
    keys match nothing (and must not poison the probe side)."""
    from etl_oms_spark.operators.validate import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id INT, parent_id INT"
    )
    parent = spark.createDataFrame([(10,), (None,)], "pid INT")
    orph = fk_orphans(child, parent, "parent_id", "pid")
    assert [r["id"] for r in orph.collect()] == [3]


def test_lr1_slope_matches_numpy_polyfit(spark):
    """lr1's closed-form OLS from integer sums must agree with numpy's
    least squares on the same monthly series (independent method)."""
    import numpy as np

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["lr1_revenue_trend"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 25  # every nation has a trend line
    # rebuild one nation's series straight from the tables and polyfit it
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    name = rows[0]["n_name"]
    x = (F.year("o_orderdate") - F.lit(1992)) * 12 + F.month("o_orderdate") - 1
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == name)
        .groupBy(x.alias("x"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("long").alias("y"))
        .collect()
    )
    xs = np.array([r["x"] for r in monthly], dtype=float)
    ys = np.array([r["y"] for r in monthly], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    got = rows[0]
    assert abs(got["slope_cents_per_month"] - slope) < abs(slope) * 1e-9 + 1e-6
    assert abs(got["intercept_cents"] - intercept) < abs(intercept) * 1e-9 + 1e-3


def test_auc_and_ks_match_numpy_reference(spark):
    """auc1/ks1's histogram-rank forms vs direct numpy computations on
    the same quantized scores (independent method, tie handling incl.)."""
    import numpy as np

    import __spark_entry__ as entry_mod
    from etl_oms_spark.operators.text import quality_score
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = d.select(
        F.coalesce(
            F.floor(quality_score("text") * 1e6 + F.lit(0.5)).cast("long"),
            F.lit(-1),
        ).alias("sq"),
        (F.col("lang") == "en").cast("int").alias("pos"),
    ).collect()
    s = np.array([r["sq"] for r in rows], dtype=np.int64)
    y = np.array([r["pos"] for r in rows], dtype=np.int64)
    pos, neg = s[y == 1], s[y == 0]
    # brute-force pairwise AUC with half-credit ties
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc_ref = (wins + 0.5 * ties) / (len(pos) * len(neg))
    # brute-force KS over the union of thresholds
    thr = np.unique(s)
    cdf_p = (pos[:, None] <= thr[None, :]).mean(axis=0)
    cdf_n = (neg[:, None] <= thr[None, :]).mean(axis=0)
    ks_ref = np.abs(cdf_p - cdf_n).max()

    a = entry_mod.queries()["auc1_quality_auc"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    k = entry_mod.queries()["ks1_score_ks"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert a["n_pos"] == len(pos) and a["n_neg"] == len(neg)
    assert abs(a["auc"] - auc_ref) < 1e-12
    assert abs(k["ks"] - ks_ref) < 1e-12
    assert 0.0 <= a["auc"] <= 1.0 and 0.0 <= k["ks"] <= 1.0
