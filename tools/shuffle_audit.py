"""Measured shuffle audit: execute each headline query and record its
ACTUAL shuffle volume from the executed plan's SQLMetrics (not
estimates) — shuffle bytes/records written, scan rows/bytes, and spill.

This is the evidence behind every "shuffle bounded by NDV / domain, not
corpus" claim: run it at two scales and the ratio column shows which
queries move data proportional to the corpus and which stay flat.

Usage: python tools/shuffle_audit.py [sf_dir] [out.json] [query ...]
Default: /root/testdata/sf0.1 -> SHUFFLE_STATS.json over bench.HEADLINE.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _walk(node, out):
    out.append(node)
    nn = node.nodeName()
    if nn == "AdaptiveSparkPlan":
        _walk(node.executedPlan(), out)
        return
    if "QueryStage" in nn:
        _walk(node.plan(), out)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out)


def _metric(node, key):
    mets = node.metrics()
    if mets.contains(key):
        return int(mets.apply(key).value())
    return 0


def audit(df) -> dict[str, int]:
    """Execute `df` and aggregate its executed-plan SQLMetrics."""
    df.collect()
    nodes: list = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    out = {
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "scan_rows": 0,
        "scan_bytes": 0,
        "spill_bytes": 0,
        "exchanges_executed": 0,
    }
    for n in nodes:
        nn = n.nodeName()
        if nn == "Exchange":
            out["exchanges_executed"] += 1
            out["shuffle_bytes"] += _metric(n, "shuffleBytesWritten")
            out["shuffle_records"] += _metric(n, "shuffleRecordsWritten")
        elif nn.startswith("Scan "):
            out["scan_rows"] += _metric(n, "numOutputRows")
            out["scan_bytes"] += _metric(n, "filesSize")
        out["spill_bytes"] += _metric(n, "spillSize")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SHUFFLE_STATS.json"

    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from etl_oms_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "shuffle-audit", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = sys.argv[3:] or [n for n in HEADLINE if n in qs]
    stats: dict[str, dict] = {}
    for name in names:
        try:
            stats[name] = audit(qs[name](spark, sf_dir))
        except Exception as e:  # record, don't abort the sweep
            stats[name] = {"error": str(e).splitlines()[0][:200]}
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                # Plan-scope caveat: these metrics come from the FINAL
                # action's executed plan. Queries that materialize work in
                # separate jobs first (eager localCheckpoints — pj1/cc1/
                # er1/csd1's edge lists, stp1/sj1's sinks) under-report
                # here; their whole-app numbers (REST /stages sum) are in
                # SCALING.md.
                "caveat": "final-plan metrics only; checkpoint/sink jobs "
                          "excluded - see SCALING.md for whole-app numbers "
                          "on pj1/cc1/er1/csd1/stp1/sj1",
                "queries": stats,
            },
            f, indent=1, sort_keys=True)
    errs = [n for n, s in stats.items() if "error" in s]
    print(f"audited {len(stats)} queries -> {out_path}; errors: {errs or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
