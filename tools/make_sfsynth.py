"""Synthesize a larger scale factor from an existing driver-generated one
for PERFORMANCE REHEARSAL (scaling-curve measurement, SCALING.md) — not
for correctness: oracles always run on the driver's own parquet.

K shifted copies of every fact table with keys remapped into disjoint id
spaces (so join fan-outs scale like real data, not like a key collision
storm); dims (region/nation) stay fixed, as they would at any scale.
Text copies get a per-copy 8-token suffix — copies stay realistic
NEAR-duplicates (web-crawl recrawl behavior) instead of exact clones, so
dedup/LSH workloads scale with honest candidate structure. Embedding
copies rotate the vector by the copy index — norm-preserving but
direction-changing, so ANN buckets don't degenerate into 10-way ties.

Usage: python tools/make_sfsynth.py [src_sf_dir] [out_dir] [K]
Default: /root/testdata/sf0.1 -> /tmp/sfsynth1 (x10 ~= sf1).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# one shared id-space stride per key family keeps FKs consistent across
# tables (orders.o_custkey shifts by the same stride as customer.c_custkey)
STRIDE = {
    "c_custkey": 1_000_000, "o_custkey": 1_000_000,
    "s_suppkey": 1_000_000, "l_suppkey": 1_000_000,
    "p_partkey": 10_000_000, "l_partkey": 10_000_000,
    "o_orderkey": 100_000_000, "l_orderkey": 100_000_000,
    "event_id": 100_000_000, "user_id": 1_000_000,
    "doc_id": 10_000_000, "vec_id": 10_000_000,
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfsynth1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from etl_oms_spark.session import get_spark

    spark = get_spark("make_sfsynth", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for t in ["region", "nation"]:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    for t, keys in SHIFTS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(k):
            c = base
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(i * STRIDE[key]))
            if t == "documents" and i > 0:
                suffix = " ".join(f"cvar{i}tok{j}" for j in range(8))
                c = c.withColumn("text", F.concat_ws(" ", F.col("text"), F.lit(suffix)))
                c = c.withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and i > 0:
                dim = 64
                r = i % dim
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", r + 1, dim - r),
                        F.slice("embedding", 1, r),
                    ),
                )
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionAll(c)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, "->", f"{out}/{t}.parquet")


if __name__ == "__main__":
    main()
