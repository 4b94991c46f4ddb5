"""VERDICT r11 item 2: adjudicate the pj1 idle-bench drift (26.14 s
committed idle vs 18.89 s driver payload) with a clean, stage-attributed
retime at HEAD.

Methodology = bench.py's exactly (fresh session, noop sink, gc between
reps, steal/loadavg recorded) but pj1-focused: 1 cold + 5 warm reps of
the full query, then 5 warm reps of the PAIR stage alone
(prefix_filtered_jaccard_pairs → select ids) so full − pairs ≈ the CC
consumption. SCALING.md:902 applies: pj1 must be timed in a fresh
bench-like session, not mid-battery, because accumulated localCheckpoint
blocks from other queries inflate it.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_jiffies  # noqa: E402


def main() -> None:
    import __spark_entry__ as entry_mod
    from etl_oms_spark.operators.dedup import prefix_filtered_jaccard_pairs
    from etl_oms_spark.session import get_spark

    loadavg_start = round(os.getloadavg()[0], 2)
    j0 = _cpu_jiffies()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "retime_pj1", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # JVM/session warm-up, same as bench.py
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def reps(make_df, n):
        out = []
        for _ in range(n):
            s0 = _cpu_jiffies().get("steal", 0)
            t0 = time.perf_counter()
            make_df().write.format("noop").mode("overwrite").save()
            out.append(
                (
                    round(time.perf_counter() - t0, 3),
                    _cpu_jiffies().get("steal", 0) - s0,
                )
            )
            gc.collect()
        return out

    full = reps(lambda: qs["pj1_prefix_jaccard"](spark, sf_dir), 6)

    def pairs_df():
        from __spark_entry__ import _t

        return prefix_filtered_jaccard_pairs(
            _t(spark, sf_dir, "documents"), threshold=0.9
        ).select("id_a", "id_b")

    pair_stage = reps(pairs_df, 5)

    def med(rs):
        return sorted(t for t, _ in rs)[len(rs) // 2]

    payload = {
        "query": "pj1_prefix_jaccard",
        "sf_dir": sf_dir,
        "loadavg_start_1m": loadavg_start,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "full_cold_sec": full[0][0],
        "full_warm_runs": full[1:],
        "full_warm_median_sec": med(full[1:]),
        "pair_stage_warm_runs": pair_stage,
        "pair_stage_warm_median_sec": med(pair_stage),
        "cc_stage_approx_sec": round(med(full[1:]) - med(pair_stage), 3),
        "steal_jiffies_delta": _cpu_jiffies().get("steal", 0)
        - j0.get("steal", 0),
    }
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
