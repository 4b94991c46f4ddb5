"""Custom Python DataSource: partitioned DB-API reads (Spark 4 API)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_dbapi_source_partitioned_read(spark, tmp_path):
    from etl_oms_spark.sources.dbapi_source import register_dbapi_source

    db = str(tmp_path / "dim.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE dim AS SELECT i AS id, 'name_' || i AS name,"
        " CAST(i * 1.5 AS DOUBLE) AS score FROM range(0, 1000) t(i)"
    )
    con.close()

    register_dbapi_source(spark)
    df = (
        spark.read.format("dbapi")
        .schema("id BIGINT, name STRING, score DOUBLE")
        .option("connect", "etl_oms_spark.sources.dbapi_source:duckdb_readonly")
        .option("connect_arg", db)
        .option("query", "SELECT id, name, score FROM dim")
        .option("partition_column", "id")
        .option("num_partitions", "4")
        .option("lower_bound", "0")
        .option("upper_bound", "999")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    got = df.orderBy("id").limit(3).collect()
    assert [r["name"] for r in got] == ["name_0", "name_1", "name_2"]
    assert got[1]["score"] == 1.5
    # no dupes / no drops across partition edges
    assert df.select("id").distinct().count() == 1000
    # broadcast-join the dim against a fact, the reference's S5 use
    fact = spark.range(500).select((F.col("id") % 1000).alias("id"))
    joined = fact.join(F.broadcast(df), "id", "left")
    assert joined.filter(F.col("name").isNull()).count() == 0


def test_dbapi_source_unpartitioned(spark, tmp_path):
    from etl_oms_spark.sources.dbapi_source import register_dbapi_source

    db = str(tmp_path / "d2.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t AS SELECT 1 AS a UNION ALL SELECT 2")
    con.close()
    register_dbapi_source(spark)
    df = (
        spark.read.format("dbapi")
        .schema("a INT")
        .option("connect", "etl_oms_spark.sources.dbapi_source:duckdb_readonly")
        .option("connect_arg", db)
        .option("query", "SELECT a FROM t")
        .load()
    )
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_dbapi_stream_source_incremental(spark, tmp_path):
    """Polling stream: batch 1 sees the initial rows, appended rows arrive
    in the next batch, nothing is re-read (hwm offsets)."""
    import time

    from etl_oms_spark.sources.dbapi_source import register_dbapi_stream_source

    db = str(tmp_path / "cdc.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE log(seq BIGINT, payload VARCHAR)")
    con.execute("INSERT INTO log VALUES (1, 'a'), (2, 'b')")
    con.close()

    register_dbapi_stream_source(spark)
    stream = (
        spark.readStream.format("dbapi_stream")
        .schema("seq BIGINT, payload STRING")
        .option("connect", "etl_oms_spark.sources.dbapi_source:duckdb_readonly")
        .option("connect_arg", db)
        .option("query", "SELECT seq, payload FROM log")
        .option("offset_column", "seq")
        .load()
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["seq"]: r["payload"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "b"}

    # append; a second availableNow run picks up ONLY the new row
    con = duckdb.connect(db)
    con.execute("INSERT INTO log VALUES (3, 'c')")
    con.close()
    q2 = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert {r["seq"]: r["payload"] for r in rows} == {1: "a", 2: "b", 3: "c"}
    assert len(rows) == 3  # no duplicates: offsets advanced


def test_dbapi_write_source_parallel_partitions(spark, tmp_path):
    from etl_oms_spark.sources.dbapi_source import register_dbapi_write_source

    db = str(tmp_path / "sink.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE sink(id BIGINT, v VARCHAR)")
    con.close()

    register_dbapi_write_source(spark)
    df = spark.range(200).selectExpr("id", "concat('v', id) AS v").repartition(4)
    (
        df.write.format("dbapi_write")
        .option("connect", "etl_oms_spark.sources.dbapi_source:duckdb_writable")
        .option("connect_arg", db)
        .option("table", "sink")
        .mode("append")
        .save()
    )
    con = duckdb.connect(db)
    n, distinct = con.execute("SELECT COUNT(*), COUNT(DISTINCT id) FROM sink").fetchone()
    con.close()
    assert n == 200 and distinct == 200
