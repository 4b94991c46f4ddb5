"""Time a subset of headline queries with bench.py's exact methodology
(1 cold + 3 warm runs, median of warm, noop sink) without running the
full 135-query battery — the measure/re-measure loop of an optimization
round needs per-query before/after numbers in seconds, not minutes.

Usage: python tools/bench_subset.py <sf_dir> <query> [query ...]
Prints one JSON line: {"queries": {name: warm_median}, "cold": {...}}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry_mod
    from etl_oms_spark.session import get_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-subset", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    # same warmup as bench.py: one untimed query so the first timed one
    # doesn't pay session startup
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    colds: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench-subset:{name}")
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        colds[name] = round(runs[0], 3)
        timings[name] = round(sorted(runs[1:])[1], 3)
        gc.collect()
    print(json.dumps({"queries": timings, "cold": colds}))


if __name__ == "__main__":
    main()
