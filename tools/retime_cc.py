"""CC-stage scale rehearsal (VERDICT r12 item 4): the connected-
components loop owns pj1's contention sensitivity (SCALING.md:1198) and
underlies cc2/er1 dup clustering, so treat it as a first-class scale
subject: pin the ITERATION COUNT and PER-ROUND SHUFFLE VOLUME at both
decades, and compare the current pointer-jumping min-label loop
(operators/graph.py:23) against the alternating large-star/small-star
edge-contraction formulation (Kiveris et al., "Connected Components in
MapReduce and Beyond", 2014) on the SAME dup graphs, asserting label
equality before reporting any timing.

Usage: python tools/retime_cc.py [dataset_dir ...]
Default datasets: /root/testdata/sf0.1 /tmp/sfsynth1 (the 10x decade).
Prints one JSON line per (dataset, variant) with per-round wall +
shuffle bytes/records, then a summary per dataset.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from tools.shuffle_audit import _metric, _walk  # noqa: E402


def _plan_shuffle(df) -> tuple[int, int]:
    """Sum shuffle bytes/records over an EXECUTED DataFrame's plan."""
    nodes: list = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    b = r = 0
    for n in nodes:
        if n.nodeName() == "Exchange":  # the shuffle_audit.py convention
            b += _metric(n, "shuffleBytesWritten")
            r += _metric(n, "shuffleRecordsWritten")
    return b, r


def build_edges(spark, sf_dir: str) -> DataFrame:
    """pj1's pair stage: PPJoin exact Jaccard >= 0.9 over documents."""
    import __spark_entry__ as m
    from etl_oms_spark.operators.dedup import prefix_filtered_jaccard_pairs

    return prefix_filtered_jaccard_pairs(
        m._t(spark, sf_dir, "documents"), threshold=0.9
    ).select("id_a", "id_b")


def cc_current_instrumented(edges: DataFrame, max_iterations: int = 20):
    """The PRE-round-13 connected_components loop (pointer-jumping
    min-label propagation), with per-round wall + shuffle capture —
    the comparison subject that motivated adopting large-star/
    small-star in operators/graph.py; kept runnable so the adopt
    decision stays re-measurable. Labels must still equal the
    library's (both algorithms are exact) — asserted in main()."""
    directed = edges.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).localCheckpoint(eager=True)
    both = directed.union(
        directed.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nodes = both.select(F.col("u").alias("id")).distinct()
    labels = nodes.withColumn("component", F.col("id")).localCheckpoint(
        eager=True
    )
    rounds = []
    for it in range(max_iterations):
        t0 = time.perf_counter()
        neighbor_min = (
            both.join(labels, both["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        jump = updated.select(
            F.col("id").alias("__jid"), F.col("component").alias("__jcomp")
        )
        updated = (
            updated.join(jump, updated["component"] == jump["__jid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__jcomp"), F.col("component")),
                ).alias("component"),
            )
        )
        updated = updated.localCheckpoint(eager=False)
        changed_df = (
            updated.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
        )
        changed = changed_df.count()
        b1, r1 = _plan_shuffle(updated)
        b2, r2 = _plan_shuffle(changed_df)
        rounds.append(
            {
                "round": it,
                "wall_s": round(time.perf_counter() - t0, 3),
                "shuffle_mb": round((b1 + b2) / 1e6, 2),
                "shuffle_records": r1 + r2,
            }
        )
        labels = updated
        if changed == 0:
            break
    return labels, rounds


def cc_star_instrumented(edges: DataFrame, max_rounds: int = 40):
    """Alternating large-star/small-star (Kiveris et al. 2014, Alg. 2),
    instrumented the same way.

    large-star(u): m = min(N(u) + {u}); emit (v, m) for v in N(u), v > u.
    small-star(u): over edges oriented (hi=u, lo): m = min(N(u));
    emit (u, m) and (lo, m) for lo != m.
    Fixpoint when the (count, hash-sum) edge-set signature repeats after
    a small-star round; the surviving edges are stars (child, root).
    """
    e = (
        edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = []
    prev_sig = None
    for it in range(max_rounds):
        t0 = time.perf_counter()
        if it % 2 == 0:  # large-star
            sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            mins = sym.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m")
            )
            out = (
                sym.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
        else:  # small-star
            hi_lo = e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            mins = hi_lo.groupBy("u").agg(F.min("v").alias("m"))
            out = (
                hi_lo.join(mins, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(mins.select(F.col("u"), F.col("m").alias("v")))
            )
        nxt = (
            out.filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        sig_df = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        )
        sig = tuple(sig_df.collect()[0])
        b1, r1 = _plan_shuffle(nxt)
        rounds.append(
            {
                "round": it,
                "star": "large" if it % 2 == 0 else "small",
                "edges": int(sig[0]),
                "wall_s": round(time.perf_counter() - t0, 3),
                "shuffle_mb": round(b1 / 1e6, 2),
                "shuffle_records": r1,
            }
        )
        e = nxt
        # fixpoint test only after a small-star round: the alternation
        # is the unit, and a large-star fixpoint need not be final
        if it % 2 == 1 and sig == prev_sig:
            break
        if it % 2 == 1:
            prev_sig = sig
    # star edges are (child, root); roots label themselves
    labels = e.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    ).union(
        e.select(F.col("v").alias("id"), F.col("v").alias("component"))
    ).distinct()
    return labels, rounds


def main() -> int:
    from etl_oms_spark.operators.graph import connected_components
    from etl_oms_spark.session import get_spark

    datasets = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfsynth1"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "retime_cc", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    for ds in datasets:
        t0 = time.perf_counter()
        pairs = build_edges(spark, ds).localCheckpoint(eager=True)
        n_pairs = pairs.count()
        pair_wall = round(time.perf_counter() - t0, 3)

        # reference labels from the LIBRARY function (unchanged)
        ref = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }

        gc.collect()
        t0 = time.perf_counter()
        lbl_cur, rounds_cur = cc_current_instrumented(pairs)
        wall_cur = round(time.perf_counter() - t0, 3)
        got_cur = {r["id"]: r["component"] for r in lbl_cur.collect()}
        assert got_cur == ref, f"{ds}: instrumented current != library CC"

        gc.collect()
        t0 = time.perf_counter()
        lbl_star, rounds_star = cc_star_instrumented(pairs)
        wall_star = round(time.perf_counter() - t0, 3)
        got_star = {r["id"]: r["component"] for r in lbl_star.collect()}
        assert got_star == ref, f"{ds}: large/small-star != library CC"

        print(
            json.dumps(
                {
                    "dataset": ds,
                    "n_pairs": n_pairs,
                    "pair_stage_wall_s": pair_wall,
                    "current": {
                        "wall_s": wall_cur,
                        "n_rounds": len(rounds_cur),
                        "rounds": rounds_cur,
                    },
                    "large_small_star": {
                        "wall_s": wall_star,
                        "n_rounds": len(rounds_star),
                        "rounds": rounds_star,
                    },
                    "labels_equal": True,
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
