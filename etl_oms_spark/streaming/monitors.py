"""Fused streaming monitors: ONE maintained histogram stream, N
domain-sized rollups.

Adopted in round 13 from the measured shared-harness experiment
(`tools/retime_streaming.py`, SCALING.md round-13 section): ~80% of a
class-A streaming monitor's wall is availableNow/state-store/checkpoint
machinery that is IDENTICAL for every monitor reading the same source,
so running the sps1 (PSI drift) and scs1 (CUSUM level-shift) monitors
as two standalone streams pays that fixed cost twice. One streamed
(day, value)-histogram is a sufficient statistic for BOTH: PSI reads
the value marginal per side of the cut; CUSUM reads the day marginal.
Measured: 17.8-20.1 s for the standalone pair at sf0.1 vs 8.5-9.1 s
fused, with bit-identical results (asserted in-run and in pytest).

The standalone contract queries stay untouched — the driver calls each
query independently, so per-query fixed cost is the documented
headline floor; this module is the production deployment shape (one
monitoring stream per source, rollups hanging off the emitted frame).

Scale shape: streaming state is keyed on (day window, value) — value
domains are bounded (cents histograms, token counts), so state is
domain-sized, never corpus-sized; the emitted frame the rollups read
is day×value-domain-sized. Adding a monitor adds ONE domain-sized
rollup, zero streaming cost.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fused_value_histogram_monitors(
    spark: SparkSession,
    events: DataFrame,
    value_col: str = "cents",
    ts_col: str = "ts",
    cut: str = "2024-01-08",
) -> tuple[DataFrame, DataFrame]:
    """Run ONE exact (day, value)-histogram stream over ``events`` and
    return BOTH monitor results: ``(psi_df, cusum_df)``.

    ``psi_df`` equals `operators.validate.psi_from_value_counts` over
    the value marginal split at ``cut`` (the sps1 contract result);
    ``cusum_df`` equals `operators.temporal.cusum_from_daily` over the
    day marginal (the scs1 contract result). Exactness uses the
    ssw1/scs1 sentinel dance: watermark delay > span (nothing is
    late), two far-future sentinel appends + availableNow restarts on
    the same checkpoint flush every real day exactly once, sentinel
    windows filtered by the real max timestamp. Both results are
    materialized eagerly (the temp source/checkpoint dirs are removed
    on return).
    """
    from etl_oms_spark.operators.temporal import cusum_from_daily
    from etl_oms_spark.operators.validate import psi_from_value_counts
    from etl_oms_spark.streaming.events import windowed_value_counts

    ev = events.select(
        F.col(ts_col).alias("ts"), F.col(value_col).alias("cents")
    )
    tmp = tempfile.mkdtemp(prefix="fusedmon_")
    try:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "hist")
        ckpt = os.path.join(tmp, "ckpt")
        ev.write.mode("overwrite").parquet(src)
        src_schema = spark.read.parquet(src).schema
        bounds = (
            spark.read.parquet(src)
            .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
            .collect()[0]
        )
        span_sec = int((bounds["mx"] - bounds["mn"]).total_seconds())
        delay_sec = span_sec + 3600

        def run_phase() -> None:
            stream = spark.readStream.schema(src_schema).parquet(src)
            q = (
                windowed_value_counts(
                    stream,
                    "cents",
                    window="1 day",
                    watermark=f"{delay_sec} seconds",
                )
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_phase()
        for extra in (delay_sec + 86400 + 3600, delay_sec + 86400 + 7200):
            spark.range(1).select(
                (F.lit(bounds["mx"]) + F.make_interval(secs=F.lit(extra)))
                .cast(src_schema["ts"].dataType)
                .alias("ts"),
                F.lit(0).cast(src_schema["cents"].dataType).alias("cents"),
            ).write.mode("append").parquet(src)
            run_phase()

        emitted = spark.read.parquet(out).filter(
            F.col("window_start") <= F.lit(bounds["mx"])
        )
        cut_ts = F.lit(cut).cast("timestamp")
        vcounts = emitted.groupBy("v").agg(
            F.sum(
                F.when(F.col("window_start") < cut_ts, F.col("n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_base"),
            F.sum(
                F.when(F.col("window_start") >= cut_ts, F.col("n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_cur"),
        )
        psi = psi_from_value_counts(vcounts).orderBy("bucket")
        daily = emitted.groupBy(
            F.to_date("window_start").alias("day")
        ).agg(F.sum("n").cast("long").alias("x"))
        cusum = cusum_from_daily(daily)
        return (
            spark.createDataFrame(psi.collect(), psi.schema),
            spark.createDataFrame(cusum.collect(), cusum.schema),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
