"""Round-3 batch 2: physical-layout operators (z-order, compaction
planning) and event-stream analytics (gaps-and-islands, transition
matrix, time-weighted average, n-gram novelty)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_morton_interleave_known_bits(spark):
    from etl_oms_spark.operators.layout import morton_interleave

    df = spark.createDataFrame([(0b101, 0b011)], "x LONG, y LONG")
    got = df.select(morton_interleave("x", "y", bits=3).alias("z")).first()["z"]
    # x bits at even positions: 1_0_1 -> 0b010001; y at odd: 0_1_1 -> 0b001010
    assert got == 0b011011


def test_morton_sql_twin_matches(spark):
    """The generated ANSI twin must equal the Column form on random input."""
    from etl_oms_spark.operators.layout import morton_interleave, morton_sql

    df = spark.range(500).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("x"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0xFFFF))).alias("y"),
    )
    both = df.select(
        morton_interleave("x", "y", 16).alias("a"),
        F.expr(morton_sql("x", "y", 16)).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_zorder_by_skips_on_both_dimensions(spark):
    """Data-skipping effectiveness: with per-partition min/max stats, count
    how many partitions a point filter must scan, probing BOTH dimensions.
    An x-only sort is perfect on x but scans everything for a y filter;
    the z-order layout must beat it on the combined total — that is the
    whole point of the curve."""
    from etl_oms_spark.operators.layout import zorder_by

    n = 4096
    df = spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(255))).alias("x"),
        (F.xxhash64("id", F.lit(7)).bitwiseAND(F.lit(255))).alias("y"),
    )

    def touched(frame):
        stats = (
            frame.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()
        )
        probes = range(8, 256, 16)
        hit_x = sum(
            1 for v in probes for r in stats if r["x0"] <= v <= r["x1"]
        )
        hit_y = sum(
            1 for v in probes for r in stats if r["y0"] <= v <= r["y1"]
        )
        return hit_x + hit_y

    z = touched(zorder_by(df, "x", "y", bits=8, n_partitions=16))
    linear = touched(df.repartitionByRange(16, "x").sortWithinPartitions("x"))
    # linear: ~1/16 of partitions per x probe but ALL 16 per y probe
    # (~272 total); z-order: ~sqrt(16)=4 quadrant rows/cols per probe on
    # EITHER axis (~128 + boundary slack)
    assert z < linear * 0.75


def test_compaction_plan_packs_and_isolates_oversized(spark):
    from etl_oms_spark.operators.layout import compaction_plan

    sizes = spark.createDataFrame(
        [("a", 40), ("b", 40), ("c", 40), ("d", 250), ("e", 10), ("f", 10)],
        "unit STRING, bytes LONG",
    )
    got = {
        r["unit"]: r["out_file"]
        for r in compaction_plan(sizes, "bytes", ["unit"], 100).collect()
    }
    # exclusive cumsum: a@0 b@40 c@80 d@120 e@370 f@380
    assert got == {"a": 0, "b": 0, "c": 0, "d": 1, "e": 3, "f": 3}
    # order preserved: file ids are monotone in unit order
    files = [got[u] for u in sorted(got)]
    assert files == sorted(files)


def test_compaction_plan_partitioning_invariant(spark):
    from etl_oms_spark.operators.layout import compaction_plan

    sizes = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("bytes")
    )
    a = {r["k"]: r["out_file"]
         for r in compaction_plan(sizes, "bytes", ["k"], 500).collect()}
    b = {r["k"]: r["out_file"]
         for r in compaction_plan(sizes.repartition(11), "bytes", ["k"], 500).collect()}
    assert a == b


def test_activity_islands_hand_case(spark):
    from etl_oms_spark.operators.temporal import activity_islands

    rows = [
        # user 1: 1-2 jan (streak 2), 5 jan (streak 1); duplicate day events
        (1, dt.datetime(2024, 1, 1, 9)), (1, dt.datetime(2024, 1, 1, 17)),
        (1, dt.datetime(2024, 1, 2, 3)), (1, dt.datetime(2024, 1, 5, 1)),
        # user 2: one long streak crossing a month boundary
        (2, dt.datetime(2024, 1, 31)), (2, dt.datetime(2024, 2, 1)),
        (2, dt.datetime(2024, 2, 2)),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    got = sorted(
        (r["user_id"], str(r["streak_start"]), r["streak_days"])
        for r in activity_islands(df).collect()
    )
    assert got == [
        (1, "2024-01-01", 2), (1, "2024-01-05", 1), (2, "2024-01-31", 3),
    ]


def test_transition_matrix_counts_and_probs(spark):
    from etl_oms_spark.operators.temporal import transition_matrix

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),   # a>b b>a a>c
        (2, 1, "a"), (2, 2, "b"),                              # a>b
    ]
    df = spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, m), e, float(m)) for u, m, e in rows],
        "user_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE",
    ).withColumn("event_id", F.monotonically_increasing_id())
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["p"])
        for r in transition_matrix(df).collect()
    }
    assert got[("a", "b")] == (2, 2 / 3)
    assert got[("a", "c")] == (1, 1 / 3)
    assert got[("b", "a")] == (1, 1.0)
    assert ("c",) not in {k[:1] for k in got}  # terminal state emits nothing


def test_time_weighted_avg_steps(spark):
    from etl_oms_spark.operators.temporal import time_weighted_avg

    # value 10 held 1h, value 20 held 3h -> twa = (10*1 + 20*3) / 4 = 17.5
    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 10.0, 1),
        (1, dt.datetime(2024, 1, 1, 1), 20.0, 2),
        (1, dt.datetime(2024, 1, 1, 4), 99.0, 3),  # last: zero weight
        (2, dt.datetime(2024, 1, 1, 0), 5.0, 4),   # single event: absent
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE, event_id LONG")
    got = {r["user_id"]: r["tw_avg"]
           for r in time_weighted_avg(df, tiebreak_col="event_id").collect()}
    assert got == {1: 17.5}


def test_ngram_novelty_first_doc_wins(spark):
    from etl_oms_spark.operators.dedup import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4"),           # shingles (k=3): w1w2w3, w2w3w4 - all novel
            (2, "w1 w2 w3 w4"),           # exact repeat - novelty 0
            (3, "w1 w2 w3 zz"),           # shares w1w2w3; w2w3zz is new -> 1/2
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: (r["n_shingles"], r["novelty"])
           for r in ngram_novelty(df, k=3).collect()}
    assert got == {1: (2, 1.0), 2: (2, 0.0), 3: (2, 0.5)}


def test_morton_roundtrip_property(spark):
    """Interleave then decode must be the identity on [0, 2^bits) — checked
    over a pseudo-random sample of the full 16-bit domain."""
    from etl_oms_spark.operators.layout import morton_decode, morton_interleave

    df = spark.range(2000).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("x"),
        (F.xxhash64("id", F.lit(3)).bitwiseAND(F.lit(0xFFFF))).alias("y"),
    )
    dx, dy = morton_decode(morton_interleave("x", "y", 16), 16)
    bad = df.select("x", "y", dx.alias("rx"), dy.alias("ry")).filter(
        (F.col("x") != F.col("rx")) | (F.col("y") != F.col("ry"))
    )
    assert bad.count() == 0


def test_morton_is_monotone_on_each_axis(spark):
    """Fixing one coordinate, the code must be strictly increasing in the
    other — the property that makes min/max stats selective."""
    from etl_oms_spark.operators.layout import morton_interleave

    df = spark.range(256).select(F.col("id").alias("x"), F.lit(77).alias("y"))
    rows = df.select("x", morton_interleave("x", "y", 8).alias("z")).orderBy("x").collect()
    zs = [r["z"] for r in rows]
    assert all(a < b for a, b in zip(zs, zs[1:]))


def test_compaction_plan_bin_property(spark):
    """Every output file except possibly those holding a single oversized
    unit stays under target + max_unit bytes (greedy next-fit bound)."""
    from etl_oms_spark.operators.layout import compaction_plan

    sizes = spark.range(300).select(
        F.col("id").alias("k"), (F.xxhash64("id").bitwiseAND(F.lit(399)) + 1).alias("bytes")
    )
    target = 1000
    out = compaction_plan(sizes, "bytes", ["k"], target)
    per_file = out.groupBy("out_file").agg(F.sum("bytes").alias("b")).collect()
    max_unit = 400
    assert all(r["b"] <= target + max_unit for r in per_file)
    # and the plan uses roughly ceil(total/target) files, not 1 per unit
    total = sizes.agg(F.sum("bytes")).first()[0]
    assert len(per_file) <= total // target + 2


def test_plan_shapes_of_round3_ops(spark, sf_dir):
    """Plan-level scale assertions for the batch: no corpus-global window
    anywhere, and nv1 carries exactly one shingle-keyed exchange."""
    import re

    from etl_oms_spark.operators.dedup import ngram_novelty
    from etl_oms_spark.operators.layout import compaction_plan
    from etl_oms_spark.operators.temporal import activity_islands

    from etl_oms_spark.util import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # nv1: every Window node must be partitioned (none present at all,
    # in fact), and the only wide exchanges are hashpartitioning on the
    # shingle hash / doc id — no rangepartitioning, no global sort
    plan = physical_plan(ngram_novelty(docs))
    assert "Window" not in plan
    assert "SinglePartition" not in plan

    # islands: both windows partition by the user key
    ev = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1))],
        "user_id LONG, ts TIMESTAMP",
    )
    plan = physical_plan(activity_islands(ev), "simple")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "user_id" in line, line
    assert "SinglePartition" not in plan

    # compaction: the only single-partition window runs over the tiny
    # per-partition totals frame (__pid/__pt), never over the data
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("bytes"))
    plan = physical_plan(
        compaction_plan(sizes, "bytes", ["source"], 1000), "simple"
    )
    wins = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert wins  # offsets window exists
    assert all("__pt" in w or "__pid" in w for w in wins)
