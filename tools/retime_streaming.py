"""Wall decomposition for the class-A streaming monitors (VERDICT r12
item 3): extend the sj1/ssw1 stage tables to scs1/sps1, and measure the
ONE shared-harness variant — a single 3-phase (day, value)-histogram
stream feeding BOTH monitors' rollups — against the two standalone
queries, verifying result equality before reporting the saving.

Usage: python tools/retime_streaming.py [sf_dir] [reps]
Prints one JSON line per rep plus a summary; exact-equality of the
fused variant's outputs vs the standalone queries is asserted.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _stage(timings, name, fn):
    t0 = time.perf_counter()
    out = fn()
    timings[name] = round(time.perf_counter() - t0, 3)
    return out


def decompose_monitor(spark, sf_dir: str, which: str) -> dict:
    """Stage-timed replay of scs1/sps1: src write, 3 streaming phases,
    rollup, plus the batch twin (same rollup, no streaming)."""
    import __spark_entry__ as m
    from etl_oms_spark.operators.temporal import cusum_from_daily
    from etl_oms_spark.operators.validate import psi_from_value_counts
    from etl_oms_spark.streaming.events import (
        windowed_total_counts,
        windowed_value_counts,
    )

    t: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix=f"retime_{which}_")
    try:
        src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ck"))
        if which == "scs1":
            ev = m._events(spark, sf_dir).select("event_id", "ts")
        else:
            ev = m._events(spark, sf_dir).select(
                "ts", m._cents(F.col("value")).alias("cents")
            )
        _stage(t, "src_write", lambda: ev.write.mode("overwrite").parquet(src))
        src_schema = spark.read.parquet(src).schema
        bounds = (
            spark.read.parquet(src)
            .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
            .collect()[0]
        )
        span = int((bounds["mx"] - bounds["mn"]).total_seconds())
        delay = span + 3600

        def agg_stream(stream):
            if which == "scs1":
                return windowed_total_counts(
                    stream, window="1 day", watermark=f"{delay} seconds"
                )
            return windowed_value_counts(
                stream, "cents", window="1 day", watermark=f"{delay} seconds"
            )

        def run_phase():
            stream = spark.readStream.schema(src_schema).parquet(src)
            q = (
                agg_stream(stream)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        def sentinel(extra):
            cols = [
                (
                    F.lit(bounds["mx"]) + F.make_interval(secs=F.lit(extra))
                ).cast(src_schema["ts"].dataType).alias("ts")
            ]
            if which == "scs1":
                cols.insert(
                    0,
                    F.lit(-1)
                    .cast(src_schema["event_id"].dataType)
                    .alias("event_id"),
                )
            else:
                cols.append(
                    F.lit(0).cast(src_schema["cents"].dataType).alias("cents")
                )
            spark.range(1).select(*cols).write.mode("append").parquet(src)

        _stage(t, "phase1_stream", run_phase)
        _stage(
            t,
            "phase2_sentinel_restart",
            lambda: (sentinel(delay + 86400 + 3600), run_phase()),
        )
        _stage(
            t,
            "phase3_sentinel_restart",
            lambda: (sentinel(delay + 86400 + 7200), run_phase()),
        )

        def rollup():
            emitted = spark.read.parquet(out).filter(
                F.col("window_start") <= F.lit(bounds["mx"])
            )
            if which == "scs1":
                daily = emitted.select(
                    F.to_date("window_start").alias("day"),
                    F.col("n").cast("long").alias("x"),
                )
                return cusum_from_daily(daily).collect()
            cut = F.lit("2024-01-08").cast("timestamp")
            vc = emitted.groupBy("v").agg(
                F.sum(
                    F.when(F.col("window_start") < cut, F.col("n")).otherwise(
                        F.lit(0)
                    )
                ).cast("long").alias("n_base"),
                F.sum(
                    F.when(F.col("window_start") >= cut, F.col("n")).otherwise(
                        F.lit(0)
                    )
                ).cast("long").alias("n_cur"),
            )
            return psi_from_value_counts(vc).orderBy("bucket").collect()

        rows = _stage(t, "rollup_collect", rollup)

        def batch_twin():
            b = spark.read.parquet(src).filter(
                F.col("ts") <= F.lit(bounds["mx"])
            )
            if which == "scs1":
                daily = b.groupBy(
                    F.to_date(F.date_trunc("day", "ts")).alias("day")
                ).agg(F.count(F.lit(1)).cast("long").alias("x"))
                return cusum_from_daily(daily).collect()
            cut = F.lit("2024-01-08").cast("timestamp")
            vc = b.groupBy(F.col("cents").alias("v")).agg(
                F.sum(
                    F.when(F.col("ts") < cut, F.lit(1)).otherwise(F.lit(0))
                ).cast("long").alias("n_base"),
                F.sum(
                    F.when(F.col("ts") >= cut, F.lit(1)).otherwise(F.lit(0))
                ).cast("long").alias("n_cur"),
            )
            return psi_from_value_counts(vc).orderBy("bucket").collect()

        twin_rows = _stage(t, "batch_twin", batch_twin)
        assert [r.asDict() for r in rows] == [
            r.asDict() for r in twin_rows
        ], f"{which}: streamed rollup != batch twin"
        t["total"] = round(sum(v for k, v in t.items() if k != "total"), 3)
        return t
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def fused_shared_harness(spark, sf_dir: str) -> dict:
    """The shared-harness variant: ONE (day, value)-histogram stream —
    one src write, one checkpoint, 3 phases — whose emitted frame feeds
    BOTH the PSI rollup (sps1) and, summed over values, the daily CUSUM
    (scs1). Returns timings plus both result sets for equality checks."""
    import __spark_entry__ as m
    from etl_oms_spark.operators.temporal import cusum_from_daily
    from etl_oms_spark.operators.validate import psi_from_value_counts
    from etl_oms_spark.streaming.events import windowed_value_counts

    t: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="retime_fused_")
    try:
        src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "out", "ck"))
        ev = m._events(spark, sf_dir).select(
            "ts", m._cents(F.col("value")).alias("cents")
        )
        _stage(t, "src_write", lambda: ev.write.mode("overwrite").parquet(src))
        src_schema = spark.read.parquet(src).schema
        bounds = (
            spark.read.parquet(src)
            .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
            .collect()[0]
        )
        span = int((bounds["mx"] - bounds["mn"]).total_seconds())
        delay = span + 3600

        def run_phase():
            stream = spark.readStream.schema(src_schema).parquet(src)
            q = (
                windowed_value_counts(
                    stream, "cents", window="1 day",
                    watermark=f"{delay} seconds",
                )
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        def sentinel(extra):
            spark.range(1).select(
                (
                    F.lit(bounds["mx"]) + F.make_interval(secs=F.lit(extra))
                ).cast(src_schema["ts"].dataType).alias("ts"),
                F.lit(0).cast(src_schema["cents"].dataType).alias("cents"),
            ).write.mode("append").parquet(src)

        _stage(t, "phase1_stream", run_phase)
        _stage(
            t,
            "phase2_sentinel_restart",
            lambda: (sentinel(delay + 86400 + 3600), run_phase()),
        )
        _stage(
            t,
            "phase3_sentinel_restart",
            lambda: (sentinel(delay + 86400 + 7200), run_phase()),
        )

        def rollups():
            emitted = spark.read.parquet(out).filter(
                F.col("window_start") <= F.lit(bounds["mx"])
            ).localCheckpoint(eager=False)
            cut = F.lit("2024-01-08").cast("timestamp")
            vc = emitted.groupBy("v").agg(
                F.sum(
                    F.when(F.col("window_start") < cut, F.col("n")).otherwise(
                        F.lit(0)
                    )
                ).cast("long").alias("n_base"),
                F.sum(
                    F.when(F.col("window_start") >= cut, F.col("n")).otherwise(
                        F.lit(0)
                    )
                ).cast("long").alias("n_cur"),
            )
            psi_rows = psi_from_value_counts(vc).orderBy("bucket").collect()
            daily = emitted.groupBy(
                F.to_date("window_start").alias("day")
            ).agg(F.sum("n").cast("long").alias("x"))
            cusum_rows = cusum_from_daily(daily).collect()
            return psi_rows, cusum_rows

        psi_rows, cusum_rows = _stage(t, "rollups_collect", rollups)
        t["total"] = round(sum(v for k, v in t.items() if k != "total"), 3)
        return {"timings": t, "psi": psi_rows, "cusum": cusum_rows}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    import __spark_entry__ as m
    from etl_oms_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "retime_streaming", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # reference results from the UNCHANGED standalone queries
    ref_psi = [
        r.asDict() for r in m.sps1_streaming_psi(spark, sf_dir).collect()
    ]
    ref_cusum = [
        r.asDict() for r in m.scs1_streaming_cusum(spark, sf_dir).collect()
    ]

    for rep in range(reps):
        out = {"rep": rep, "sf_dir": sf_dir}
        out["scs1"] = decompose_monitor(spark, sf_dir, "scs1")
        out["sps1"] = decompose_monitor(spark, sf_dir, "sps1")
        fused = fused_shared_harness(spark, sf_dir)
        assert [r.asDict() for r in fused["psi"]] == ref_psi, (
            "fused PSI != standalone sps1"
        )
        assert [r.asDict() for r in fused["cusum"]] == ref_cusum, (
            "fused CUSUM != standalone scs1"
        )
        out["fused"] = fused["timings"]
        out["fused_exact_match"] = True
        standalone = out["scs1"]["total"] + out["sps1"]["total"]
        out["standalone_total"] = round(standalone, 3)
        out["fused_saving_sec"] = round(standalone - out["fused"]["total"], 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
