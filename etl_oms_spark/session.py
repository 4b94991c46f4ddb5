"""SparkSession factory with scale-aware defaults.

The reference (ETL_OMS) is single-process pandas with no execution config at
all; here we centralize the Spark session so every pipeline gets the same
scale-oriented settings:

- AQE on (runtime shuffle-partition coalescing, broadcast-join conversion,
  skew-join splitting) — the knobs that make a fixed plan survive a 100x
  scale-up without retuning.
- Arrow enabled for the few pandas-UDF operators (embeddings, multimodal).
- `spark.sql.shuffle.partitions` is only a pre-AQE ceiling; AQE coalesces
  down for small inputs and the initialPartitionNum can be raised for a real
  cluster via `shuffle_partitions`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # tolerant casts (try_cast / try_to_timestamp) are used explicitly where
    # the reference relied on errors="coerce"; keep ANSI off so plain casts
    # also behave tolerantly like pandas.
    "spark.sql.ansi.enabled": "false",
    # parquet vectorized reader + pushdown are on by default; stated for
    # documentation value only.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.session.timeZone": "UTC",
}


def _ensure_driver_memory() -> None:
    """Size the local-mode driver heap before the JVM launches.

    In ``local[*]`` the driver JVM *is* the executor; Spark's 1g default
    heap GC-thrashes on multi-million-row shuffle/join state long before
    the machine's memory is used. ``spark.driver.memory`` is only honored
    at JVM launch, so it must travel via ``PYSPARK_SUBMIT_ARGS``. No-op
    when a gateway already exists (too late) or the user set their own
    submit args. Override with ``SPARK_GRAFT_DRIVER_MEM``. On a real
    cluster this is irrelevant — executor memory comes from spark-submit.
    """
    from pyspark import SparkContext

    if SparkContext._gateway is not None or "PYSPARK_SUBMIT_ARGS" in os.environ:
        return
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"


def get_spark(
    app_name: str = "etl-oms-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when the env var is
    set, else whatever the environment provides (spark-submit / existing
    session). ``shuffle_partitions`` defaults to the local core count for
    local mode; on a real cluster, pass ~2-3x total executor cores.
    """
    _ensure_driver_memory()
    builder = SparkSession.builder.appName(app_name)
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None and cpus:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
