"""End-to-end pipelines (EP1/EP2/EP3 equivalents) + I/O roundtrips."""

from __future__ import annotations

import os

from etl_oms_spark.plans.pipelines import (
    long_format_pipeline,
    pivot_report,
    star_schema_pipeline,
    warehouse_pipeline,
)
from etl_oms_spark.sources.readers import read_csv, read_json, scan_dataset_directory
from etl_oms_spark.sources.writers import upsert_sql, write_csv, write_json


def _wide_csv(tmp_path) -> str:
    p = tmp_path / "covid_test.csv"
    p.write_text(
        "Country/Region,Date,TotalCases,TotalDeaths\n"
        "France,2020-03-01,100,5\n"
        "France,2020-03-02,150,7\n"
        "France,bad-date,160,8\n"
        "Germany,2020-03-01,80,2\n"
    )
    return str(p)


def test_long_format_pipeline(spark, tmp_path):
    df = read_csv(spark, _wide_csv(tmp_path))
    out = long_format_pipeline(df, "COVID-19")
    rows = out.collect()
    assert set(out.columns) == {"country", "date", "pandemic", "indicator", "value", "unit"}
    # bad-date row dropped; derived new_cases present (confirmed all non-null,
    # new_cases absent → completed as NULL → derived)
    fr = {
        (r["indicator"], r["date"].day): r["value"]
        for r in rows
        if r["country"] == "France"
    }
    assert fr[("confirmed", 1)] == 100.0
    assert fr[("new_cases", 2)] == 50.0  # lag diff
    assert fr[("new_cases", 1)] == 0.0  # first row → 0
    assert all(r["pandemic"] == "COVID-19" for r in rows)


def test_pivot_report_roundtrip(spark, tmp_path):
    df = read_csv(spark, _wide_csv(tmp_path))
    long = long_format_pipeline(df, "COVID-19")
    wide = pivot_report(long)
    fr = {r["date"].day: r for r in wide.collect() if r["country"] == "France"}
    assert fr[2]["confirmed"] == 150.0
    assert fr[2]["recovered"] == 0.0  # fillna(0) parity (ETL_OMS_V2.py:36)


def test_star_schema_pipeline(spark, tmp_path):
    df = read_csv(spark, _wide_csv(tmp_path))
    tables = star_schema_pipeline(df, "COVID-19")
    pays = {r["country"]: r["id_pays"] for r in tables["Pays"].collect()}
    assert pays == {"France": 1, "Germany": 2}
    fact = tables["Statistique"].collect()
    assert len(fact) == 3
    assert tables["Maladie"].first()["nom_maladie"] == "COVID-19"


def test_warehouse_pipeline_merge(spark, tmp_path):
    df = read_csv(spark, _wide_csv(tmp_path))
    first = warehouse_pipeline(df, "COVID-19")
    assert first.count() == 3
    # re-run with existing fact → idempotent upsert, same rowcount
    again = warehouse_pipeline(df, "COVID-19", existing_fact=first)
    assert again.count() == 3


def test_csv_json_roundtrip(spark, tmp_path):
    df = read_csv(spark, _wide_csv(tmp_path))
    cpath, jpath = str(tmp_path / "out_csv"), str(tmp_path / "out_json")
    write_csv(df, cpath, single_file=True)
    write_json(df, jpath, single_file=True)
    assert read_csv(spark, cpath).count() == 4
    assert spark.read.json(jpath).count() == 4


def test_scan_dataset_directory(spark, tmp_path):
    _wide_csv(tmp_path)
    (tmp_path / "notes.txt").write_text("ignored")
    (tmp_path / "mp.json").write_text('[{"location": "France", "date": "2020-01-01"}]')
    frames = scan_dataset_directory(spark, str(tmp_path))
    assert len(frames) == 2  # txt filtered out (case-insensitive ext filter)
    names = {os.path.basename(p) for p in frames}
    assert names == {"covid_test.csv", "mp.json"}
    json_df = frames[str(tmp_path / "mp.json")]
    assert json_df.first()["_source_file"] == "mp.json"


def test_upsert_sql_shape():
    sql = upsert_sql("statistique", "tmp_stat", ["id_region", "date"], ["total_mort"])
    assert "ON CONFLICT (id_region, date) DO UPDATE" in sql
    assert "total_mort = EXCLUDED.total_mort" in sql


def test_catalog_sql_surface(spark, sf_dir):
    from etl_oms_spark.catalog import register_dataset, sql

    names = register_dataset(spark, sf_dir)
    assert "lineitem" in names and "events" in names
    out = sql(
        spark,
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    )
    rows = out.collect()
    assert [r["l_returnflag"] for r in rows] == ["A", "N", "R"]
    # events view has a proper timestamp despite the nanos source
    ts_type = sql(spark, "SELECT ts FROM events LIMIT 1").schema["ts"].dataType.simpleString()
    assert ts_type == "timestamp"


def test_read_csv_robust_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from etl_oms_spark.sources.readers import read_csv_robust, split_corrupt

    p = tmp_path / "dirty.csv"
    p.write_text(
        "country,date,confirmed\n"
        "France,2020-03-01,100\n"
        'Germany,2020-03-02,"unclosed\n'  # malformed: unclosed quote
        "Spain,2020-03-03,50\n"
    )
    schema = T.StructType([
        T.StructField("country", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("confirmed", T.LongType()),
    ])
    df = read_csv_robust(spark, str(p), schema=schema)
    clean, bad = split_corrupt(df)
    assert clean.count() == 2
    assert {r["country"] for r in clean.collect()} == {"France", "Spain"}
    assert bad.count() == 1  # quarantined, raw text preserved
    assert "unclosed" in bad.first()["_corrupt_record"]


def test_read_write_any_roundtrip(spark, tmp_path):
    from etl_oms_spark.sources.readers import read_any
    from etl_oms_spark.sources.writers import write_any

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    for fmt in ("csv", "json", "parquet", "orc"):
        path = str(tmp_path / f"rt_{fmt}")
        write_any(df, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt)
        rows = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
        assert rows == [(1, "a", 1.5), (2, "b", 2.5)], fmt
    # partitioned columnar layout prunes by partition column
    ppath = str(tmp_path / "rt_part")
    write_any(df, ppath, fmt="orc", partition_by=["s"])
    pruned = read_any(spark, ppath, fmt="orc").filter("s = 'a'")
    assert pruned.count() == 1


def test_read_csv_tolerant_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_oms_spark.sources.readers import read_csv_tolerant

    p = tmp_path / "dirty.csv"
    p.write_text(
        "country,confirmed\n"
        "France,100\n"
        "Spain,not_a_number\n"
        "Italy,50\n"
    )
    schema = T.StructType(
        [
            T.StructField("country", T.StringType()),
            T.StructField("confirmed", T.LongType()),
        ]
    )
    df = read_csv_tolerant(spark, str(p), schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["country"]: r["confirmed"] for r in good.collect()} == {
        "France": 100,
        "Italy": 50,
    }
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_a_number" in bad_rows[0]["_corrupt_record"]
    df.unpersist()


def test_write_sorted_parquet_global_order(spark, tmp_path):
    import glob as globmod

    from etl_oms_spark.sources.writers import write_sorted_parquet

    target = str(tmp_path / "sorted")
    df = spark.createDataFrame([(v,) for v in range(1000)], "x LONG").repartition(13)
    write_sorted_parquet(df, target, ["x"], n_files=4)

    files = sorted(globmod.glob(target + "/part-*.parquet"))
    assert len(files) == 4
    prev_max = None
    total = 0
    for f in files:
        vals = [r["x"] for r in spark.read.parquet(f).collect()]
        assert vals == sorted(vals)          # ordered within file
        if prev_max is not None and vals:
            assert vals[0] > prev_max        # disjoint, increasing ranges
        if vals:
            prev_max = vals[-1]
        total += len(vals)
    assert total == 1000


def test_curate_single_frame_matches_two_frame(spark):
    """split-column pipeline must produce identical membership to the
    two-frame train_test_split form."""
    from pyspark.sql import functions as F

    from etl_oms_spark.plans.training_pipeline import (
        curate_documents,
        curate_documents_with_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train, test = curate_documents(docs, min_tokens=10, test_rate=0.2)
    single = curate_documents_with_split(docs, min_tokens=10, test_rate=0.2)
    want_train = {r["doc_id"] for r in train.select("doc_id").collect()}
    want_test = {r["doc_id"] for r in test.select("doc_id").collect()}
    got_train = {r["doc_id"] for r in
                 single.filter(F.col("split") == "train").select("doc_id").collect()}
    got_test = {r["doc_id"] for r in
                single.filter(F.col("split") == "test").select("doc_id").collect()}
    assert got_train == want_train and got_test == want_test


def test_write_json_records_byte_parity(spark, tmp_path):
    """write_json_records must produce the reference's exact byte layout:
    one JSON array, compact separators, ISO dates
    (to_json(orient='records', date_format='iso'))."""
    import datetime

    import pandas as pd

    from etl_oms_spark.sources.writers import write_json_records

    df = spark.createDataFrame(
        [(1, "France", datetime.date(2020, 1, 5), 3.5),
         (2, "Germany", datetime.date(2020, 1, 6), None)],
        "id int, pays string, date date, taux double",
    )
    out = str(tmp_path / "stat.json")
    write_json_records(df, out)
    expected = str(tmp_path / "expected.json")
    pd.DataFrame(
        {"id": pd.array([1, 2], dtype="int32"),
         "pays": ["France", "Germany"],
         "date": pd.to_datetime(["2020-01-05", "2020-01-06"]),
         "taux": [3.5, None]}
    ).to_json(expected, orient="records", date_format="iso")
    got = open(out, "rb").read()
    assert got == open(expected, "rb").read()
    assert got.startswith(b"[{") and got.endswith(b"}]")  # one array, not lines


def test_write_json_records_row_count_gate(spark, tmp_path):
    """The driver-side collect is gated: above max_rows the call must
    fail fast with a pointer to the distributed write_json path, and
    must NOT write the file (VERDICT r05: an unguarded toPandas() lets
    a 100 GB caller OOM the driver)."""
    import pytest

    from etl_oms_spark.sources.writers import write_json_records

    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "big.json")
    with pytest.raises(ValueError, match="write_json"):
        write_json_records(df, out, max_rows=5)
    assert not (tmp_path / "big.json").exists()
    write_json_records(df, out, max_rows=10)  # at the limit is allowed
    assert (tmp_path / "big.json").exists()


def test_orc_roundtrip_with_schema_evolution(spark, tmp_path):
    """ORC roundtrip incl. mergeSchema across evolving file schemas and
    partition pruning on the partitioned layout."""
    from etl_oms_spark.sources.readers import read_orc
    from etl_oms_spark.sources.writers import write_orc

    p = str(tmp_path / "orc1")
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 3.0)], "id long, tag string, v double"
    )
    write_orc(df, p, partition_by=["tag"])
    back = read_orc(spark, p)
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }

    # second write adds a column; mergeSchema reconciles
    p2 = str(tmp_path / "orc2")
    write_orc(df.select("id", "v"), p2, mode="overwrite")
    write_orc(
        spark.createDataFrame([(3, 4.0, "x")], "id long, v double, extra string"),
        p2,
        mode="append",
    )
    merged = read_orc(spark, p2, merge_schema=True)
    assert set(merged.columns) == {"id", "v", "extra"}
    assert merged.count() == 3
    assert merged.filter("extra IS NOT NULL").count() == 1
