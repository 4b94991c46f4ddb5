"""Round-12 operators: exactness replays and equivalence pins."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- sps1
def test_streaming_psi_equals_batch(spark):
    """The streamed daily value histogram, summed per side of the cut,
    must reproduce dr1's batch value rollup exactly (watermark > span:
    nothing late, nothing dropped; the sentinel dance flushes every real
    day's histogram), so sps1 == dr1 row-for-row — same bucket edges,
    same Laplace smoothing, same quantized contributions."""
    import __spark_entry__ as entry_mod

    got = entry_mod.sps1_streaming_psi(spark, SF).collect()
    want = (
        entry_mod.dr1_drift_psi(spark, SF).orderBy("bucket").collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_windowed_value_counts_batch_equals_raw_rollup(spark):
    """windowed_value_counts in BATCH mode must equal the hand-built
    (day, value) rollup — the plan is identical batch/streaming, which
    is what the sps1 exactness argument leans on."""
    from pyspark.sql import functions as F

    from etl_oms_spark.streaming.events import windowed_value_counts

    rows = [
        ("2024-01-01 10:00:00", 5),
        ("2024-01-01 11:00:00", 5),
        ("2024-01-01 12:00:00", 7),
        ("2024-01-02 09:00:00", 5),
    ]
    df = spark.createDataFrame(rows, "ts_s string, cents long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "cents"
    )
    got = {
        (str(r["window_start"]), r["v"]): r["n"]
        for r in windowed_value_counts(df, "cents").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 5): 2,
        ("2024-01-01 00:00:00", 7): 1,
        ("2024-01-02 00:00:00", 5): 1,
    }
