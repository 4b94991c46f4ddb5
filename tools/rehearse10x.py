"""10x scale rehearsal: time contract queries at sf0.1 vs /tmp/sfsynth1
(tools/make_sfsynth.py's 10x synthetic of sf0.1) and print the ratio
table for SCALING.md. Warm timings (median of 3 after one cold run per
dataset), one query at a time, one SparkSession — the SCALING.md
methodology. NOT an oracle check: correctness always runs on the
driver's own parquet via tools/check.py.

Usage: python tools/rehearse10x.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import __spark_entry__ as E
    from etl_oms_spark.session import get_spark

    base = os.environ.get("R10_BASE", "/root/testdata/sf0.1")
    synth = os.environ.get("R10_SYNTH", "/tmp/sfsynth1")
    names = sys.argv[1:]
    if not names:
        print("usage: python tools/rehearse10x.py query [query ...]")
        return 2

    spark = get_spark("rehearse10x", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def median3(fn, sf_dir):
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return sorted(runs[1:])[1]

    print(f"| query | sf0.1 | synth1 (10x) | ratio |")
    print(f"|---|---|---|---|")
    for name in names:
        fn = qs[name]
        t_base = median3(fn, base)
        t_syn = median3(fn, synth)
        print(
            f"| {name} | {t_base:.2f}s | {t_syn:.2f}s | "
            f"{t_syn / t_base:.1f}x |",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
