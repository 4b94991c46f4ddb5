"""Plan-shape audit: `plan_stats` (exchanges / broadcasts / scans / sorts
/ single-partition exchanges) for every contract query, written as JSON.

Usage: python tools/plan_audit.py [sf_dir] [out.json]

Commit the output as PLAN_STATS.json and diff it next round: a query
whose exchange count grew acquired a new shuffle — catch it at review
time, not at 100 TB. Plans are built (analyzed + optimized), never
executed, so the audit runs in seconds.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_STATS.json"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from etl_oms_spark.util import plan_stats

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    stats: dict[str, dict] = {}
    for name, fn in entry_mod.queries().items():
        try:
            stats[name] = plan_stats(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 - audit must cover the rest
            stats[name] = {"error": str(exc)[:200]}
    with open(out_path, "w") as fh:
        json.dump(stats, fh, indent=1, sort_keys=True)
    bad = [n for n, s in stats.items() if "error" in s]
    print(f"audited {len(stats)} queries -> {out_path}; errors: {bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
