"""Export sharding and incremental file-ledger ingest."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_export_jsonl_shards_sizes_and_parity(spark, tmp_path):
    from etl_oms_spark.sources.writers import export_jsonl_shards

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string"),
                 F.lit(" " * 50)).alias("text"),
    )
    out = str(tmp_path / "shards")
    export_jsonl_shards(df, out, target_bytes=20_000, order_cols=["doc_id"])

    shards = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shards) > 3  # actually sharded, not one file
    back = spark.read.json(out)
    assert back.count() == 2000
    assert set(back.columns) == {"doc_id", "text", "shard"}
    # round-trip parity on content
    assert back.select("doc_id").distinct().count() == 2000
    # each shard stays within target + one max row (next-fit bound)
    sizes = (
        back.groupBy("shard")
        .agg(F.sum(F.length(F.to_json(F.struct("doc_id", "text"))) + 1).alias("b"))
        .collect()
    )
    assert all(r["b"] < 20_000 + 200 for r in sizes)
    # shards are contiguous in doc_id order
    rngs = sorted(
        (r["lo"], r["hi"])
        for r in back.groupBy("shard")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    assert all(a[1] < b[0] for a, b in zip(rngs, rngs[1:]))


def test_ingest_new_files_ledger_cycle(spark, tmp_path):
    from etl_oms_spark.sources.readers import ingest_new_files, record_ingested

    src = tmp_path / "in"
    src.mkdir()
    ledger = str(tmp_path / "ledger")
    (src / "a.csv").write_text("id,v\n1,x\n2,y\n")
    (src / "b.csv").write_text("id,v\n3,z\n")

    rows, files = ingest_new_files(spark, str(src), ledger, fmt="csv", header=True)
    assert rows.count() == 3 and len(files) == 2
    record_ingested(spark, files, ledger)

    # re-run: nothing new
    rows2, files2 = ingest_new_files(spark, str(src), ledger, fmt="csv", header=True)
    assert rows2.count() == 0 and files2 == []

    # drop a new file: only its rows come through
    (src / "c.csv").write_text("id,v\n4,w\n5,q\n")
    rows3, files3 = ingest_new_files(spark, str(src), ledger, fmt="csv", header=True)
    assert rows3.count() == 2 and len(files3) == 1 and files3[0].endswith("c.csv")
    record_ingested(spark, files3, ledger)
    rows4, _ = ingest_new_files(spark, str(src), ledger, fmt="csv", header=True)
    assert rows4.count() == 0
