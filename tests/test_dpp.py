"""Dynamic partition pruning: plan-level proof that a dim-side filter
prunes fact partitions at RUNTIME.

Static partition pruning handles literal predicates; at warehouse scale
the common shape is fact ⋈ filtered-dim, where the fact partitions to
read are only known after the dim filter runs. Spark injects a
`dynamicpruning` subquery into the fact scan — pinned here against a
date-partitioned fact, the layout zo1/cp1 maintain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    fact_path = str(tmp_path / "fact_part")
    # fact partitioned by region key (the typical date/tenant partition)
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 8).alias("rk"), F.col("id").alias("m")
    )
    fact.write.mode("overwrite").partitionBy("rk").parquet(fact_path)
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(8)], "rk long, tag string"
    )

    confs = {
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
        # let the pruning path win even though the dim is broadcast-small
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        f = spark.read.parquet(fact_path)
        q = f.join(dim.filter(F.col("tag") == "keep"), "rk").agg(
            F.count(F.lit(1)).alias("n"), F.sum("m").alias("s")
        )
        row = q.collect()[0]
        want = [i for i in range(20_000) if i % 8 < 2]
        assert row["n"] == len(want) and row["s"] == sum(want)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
