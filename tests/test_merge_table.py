"""Partition-pruned parquet merge: upsert cost O(touched partitions)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_oms_spark.sources.merge_table import compact_partitions, merge_into_parquet


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, day string, v long")


def test_merge_into_parquet_upserts_only_touched(spark, tmp_path):
    target = str(tmp_path / "warehouse")
    merge_into_parquet(
        spark, target,
        _batch(spark, [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30)]),
        keys=["id", "day"], partition_col="day",
    )
    # snapshot the untouched partition's files to prove it isn't rewritten
    d2_dir = os.path.join(target, "day=d2")
    d2_before = sorted(os.listdir(d2_dir))

    merge_into_parquet(
        spark, target,
        _batch(spark, [(2, "d1", 99), (4, "d1", 40)]),  # update + insert, d1 only
        keys=["id", "day"], partition_col="day",
    )
    out = {(r["id"]): (r["day"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert out == {1: ("d1", 10), 2: ("d1", 99), 3: ("d2", 30), 4: ("d1", 40)}
    assert sorted(os.listdir(d2_dir)) == d2_before  # d2 untouched on disk


def test_merge_into_parquet_idempotent(spark, tmp_path):
    target = str(tmp_path / "idem")
    batch = _batch(spark, [(1, "d1", 1), (2, "d2", 2)])
    merge_into_parquet(spark, target, batch, keys=["id", "day"], partition_col="day")
    merge_into_parquet(spark, target, batch, keys=["id", "day"], partition_col="day")
    df = spark.read.parquet(target)
    assert df.count() == 2


def test_compact_partitions(spark, tmp_path):
    target = str(tmp_path / "compact")
    # accrete several small files per partition
    for i in range(4):
        _batch(spark, [(i * 10 + 1, "d1", i), (i * 10 + 2, "d2", i)]).repartition(3) \
            .write.partitionBy("day").mode("append").parquet(target)
    d1_dir = os.path.join(target, "day=d1")
    n_before = len([f for f in os.listdir(d1_dir) if f.endswith(".parquet")])
    assert n_before >= 4
    before = spark.read.parquet(target).count()
    compact_partitions(spark, target, "day")
    n_after = len([f for f in os.listdir(d1_dir) if f.endswith(".parquet")])
    assert n_after == 1
    assert spark.read.parquet(target).count() == before


def test_merge_partition_pruning_plan(spark, tmp_path):
    """The merge's target-side scan must partition-prune to touched values."""
    from etl_oms_spark.util import physical_plan

    target = str(tmp_path / "pruned")
    _batch(spark, [(1, "d1", 1), (2, "d2", 2), (3, "d3", 3)]).write \
        .partitionBy("day").mode("overwrite").parquet(target)
    existing = spark.read.parquet(target)
    pruned = existing.filter(F.col("day").isin(["d1"]))
    plan = physical_plan(pruned)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:120]


def test_warehouse_to_parquet_end_to_end(spark, tmp_path):
    from etl_oms_spark.plans.pipelines import warehouse_to_parquet
    from etl_oms_spark.sources.readers import read_csv

    p = tmp_path / "mp.csv"
    p.write_text(
        "location,date,total_cases,total_deaths,new_cases,new_deaths\n"
        "France,2022-05-01,10,1,10,1\n"
        "France,2022-05-02,15,2,5,1\n"
        "Spain,2022-05-01,7,0,7,0\n"
    )
    target = str(tmp_path / "statistique")
    df = read_csv(spark, str(p))
    warehouse_to_parquet(df, "Monkeypox", target)
    out = spark.read.parquet(target)
    assert out.count() == 3
    # idempotent re-run: same rows, values stable
    warehouse_to_parquet(df, "Monkeypox", target)
    out2 = {(r["id_region"], str(r["date"])): r["nouveau_cas"]
            for r in spark.read.parquet(target).collect()}
    assert len(out2) == 3 and out2[(1, "2022-05-02")] == 5


def test_cdc_merge_into_parquet_deletes_and_idempotence(spark, tmp_path):
    import datetime as dt

    from etl_oms_spark.sources.merge_table import cdc_merge_into_parquet

    target = str(tmp_path / "cdc_target")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)

    def read():
        return {
            r["id"]: (r["op"], r["v"])
            for r in spark.read.parquet(target).collect()
        }

    batch1 = spark.createDataFrame(
        [(1, "p0", t0, "I", 10), (2, "p0", t0, "I", 20), (3, "p1", t0, "I", 30)],
        "id INT, part STRING, ts TIMESTAMP, op STRING, v INT",
    )
    cdc_merge_into_parquet(spark, target, batch1, ["id"], "part")
    assert read() == {1: ("I", 10), 2: ("I", 20), 3: ("I", 30)}

    # update 1, delete 2, leave p1 untouched (partition never read)
    batch2 = spark.createDataFrame(
        [(1, "p0", t1, "U", 11), (2, "p0", t1, "D", 0)],
        "id INT, part STRING, ts TIMESTAMP, op STRING, v INT",
    )
    cdc_merge_into_parquet(spark, target, batch2, ["id"], "part")
    assert read() == {1: ("U", 11), 3: ("I", 30)}

    # re-applying the same batch is a no-op
    cdc_merge_into_parquet(spark, target, batch2, ["id"], "part")
    assert read() == {1: ("U", 11), 3: ("I", 30)}


def test_cdc_merge_empties_whole_partition(spark, tmp_path):
    """A batch deleting every remaining row of a partition must remove the
    partition directory — dynamic overwrite alone would leave it stale."""
    import datetime as dt

    from etl_oms_spark.sources.merge_table import cdc_merge_into_parquet

    target = str(tmp_path / "cdc_empty")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    batch1 = spark.createDataFrame(
        [(1, "p0", t0, "I", 10), (2, "p1", t0, "I", 20), (3, "p1", t0, "I", 30)],
        "id INT, part STRING, ts TIMESTAMP, op STRING, v INT",
    )
    cdc_merge_into_parquet(spark, target, batch1, ["id"], "part")

    # delete BOTH p1 rows: p1 emits zero output rows and must disappear
    batch2 = spark.createDataFrame(
        [(2, "p1", t1, "D", 0), (3, "p1", t1, "D", 0)],
        "id INT, part STRING, ts TIMESTAMP, op STRING, v INT",
    )
    cdc_merge_into_parquet(spark, target, batch2, ["id"], "part")
    rows = {r["id"] for r in spark.read.parquet(target).collect()}
    assert rows == {1}
    assert not os.path.exists(os.path.join(target, "part=p1"))
    # idempotent: re-applying the emptying batch is a no-op
    cdc_merge_into_parquet(spark, target, batch2, ["id"], "part")
    assert {r["id"] for r in spark.read.parquet(target).collect()} == {1}


def test_vacuum_table_removes_debris_keeps_data(spark, tmp_path):
    import os

    from etl_oms_spark.sources.merge_table import vacuum_table

    path = str(tmp_path / "t")
    spark.range(10).selectExpr("id", "id % 2 AS p").write.partitionBy(
        "p"
    ).parquet(path)
    # simulate an aborted write + an emptied partition
    os.makedirs(os.path.join(path, "_temporary", "0"), exist_ok=True)
    os.makedirs(os.path.join(path, "p=9"), exist_ok=True)

    stats = vacuum_table(path)
    assert stats["temp_dirs"] == 1 and stats["empty_dirs"] >= 1
    assert not os.path.exists(os.path.join(path, "_temporary"))
    assert not os.path.exists(os.path.join(path, "p=9"))
    # committed data intact
    assert spark.read.parquet(path).count() == 10
