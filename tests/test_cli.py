"""CLI entry points (python -m etl_oms_spark) — 1:1 with the reference's
four scripts (EP1 long / V2 pivot / EP2 star / EP3 warehouse)."""

from __future__ import annotations

import glob

from etl_oms_spark.__main__ import main

CSV = """Country/Region,Date,Confirmed,Deaths,Recovered
France,2021-01-01,100,5,20
France,2021-01-02,150,8,30
Germany,2021-01-01,80,2,10
Germany,notadate,999,9,99
"""


def _write_input(tmp_path):
    data = tmp_path / "data"
    data.mkdir(exist_ok=True)
    (data / "covid_sample.csv").write_text(CSV)
    return data


def test_cli_long_and_pivot(spark, tmp_path):
    data = _write_input(tmp_path)
    assert main([
        "long", "--file", str(data / "covid_sample.csv"),
        "--pandemic-name", "COVID-19", "--out", str(tmp_path / "long"),
        "--single-file",
    ]) == 0
    long_csv = glob.glob(str(tmp_path / "long" / "final_csv" / "*.csv"))
    assert long_csv
    lines = open(long_csv[0]).read().splitlines()
    assert lines[0] == "country,date,pandemic,indicator,value,unit"
    # 3 rows dropped the bad date; 3 countries-days x 5 non-null indicators
    assert len(lines) - 1 == 15

    assert main([
        "pivot", "--file", str(tmp_path / "long" / "final_csv"),
        "--out", str(tmp_path / "pivot"), "--single-file",
    ]) == 0
    wide = glob.glob(str(tmp_path / "pivot" / "visual_csv" / "*.csv"))
    assert wide and "confirmed" in open(wide[0]).read().splitlines()[0]


def test_cli_star_and_warehouse(spark, tmp_path):
    data = _write_input(tmp_path)
    assert main([
        "star", "--file", str(data / "covid_sample.csv"),
        "--pandemic-name", "COVID-19", "--out", str(tmp_path / "star"),
        "--single-file",
    ]) == 0
    pays = glob.glob(str(tmp_path / "star" / "COVID-19" / "Pays_csv" / "*.csv"))
    assert sorted(open(pays[0]).read().splitlines()[1:]) == ["France,1", "Germany,2"]

    target = tmp_path / "wh"
    assert main([
        "warehouse", "--directory", str(data), "--target", str(target),
        "--min-date", "2019-01-01",
    ]) == 0
    fact = spark.read.parquet(str(target))
    assert fact.count() == 3  # 2 countries x 2 days minus the dropped bad date
    # re-run is idempotent (the ON CONFLICT property of the merge table)
    assert main([
        "warehouse", "--directory", str(data), "--target", str(target),
    ]) == 0
    assert spark.read.parquet(str(target)).count() == 3


MPOX_CSV = """Country/Region,Date,Confirmed,Deaths
Belgium,2021-01-01,10,1
France,2021-01-01,20,2
"""

INCREMENTAL_CSV = """Country/Region,Date,Confirmed,Deaths
Spain,2021-01-03,5,0
France,2021-01-03,200,9
"""


def test_warehouse_shared_dims_stable(spark, tmp_path):
    """id_region/id_maladie are stable across pandemics AND across runs:
    dims persist next to the fact and grow anti-join style, so two
    diseases reporting the same country-day never overwrite each other
    and incremental batches never re-map existing ids."""
    data = tmp_path / "data"
    data.mkdir()
    (data / "covid_sample.csv").write_text(CSV)
    (data / "monkeypox_sample.csv").write_text(MPOX_CSV)
    target = str(tmp_path / "wh")

    assert main(["warehouse", "--directory", str(data), "--target", target]) == 0
    pays = {r["country"]: r["id_pays"]
            for r in spark.read.parquet(target + "__dims/pays").collect()}
    assert len(pays) == 3 and len(set(pays.values())) == 3
    maladie = {r["nom_maladie"]: r["id_maladie"]
               for r in spark.read.parquet(target + "__dims/maladie").collect()}
    assert set(maladie) == {"COVID-19", "Monkeypox"}

    fact = spark.read.parquet(target)
    # France/2021-01-01 appears for BOTH diseases under the SAME id_region
    fr = fact.filter(fact.id_region == pays["France"])
    assert fr.select("id_maladie").distinct().count() == 2
    n_first = fact.count()

    # re-run: idempotent fact, identical ids
    assert main(["warehouse", "--directory", str(data), "--target", target]) == 0
    pays2 = {r["country"]: r["id_pays"]
             for r in spark.read.parquet(target + "__dims/pays").collect()}
    assert pays2 == pays
    assert spark.read.parquet(target).count() == n_first

    # incremental batch with a new country: dim grows, old ids untouched
    inc = tmp_path / "inc"
    inc.mkdir()
    (inc / "covid_more.csv").write_text(INCREMENTAL_CSV)
    assert main(["warehouse", "--directory", str(inc), "--target", target]) == 0
    pays3 = {r["country"]: r["id_pays"]
             for r in spark.read.parquet(target + "__dims/pays").collect()}
    assert {k: pays3[k] for k in pays} == pays
    assert pays3["Spain"] == max(pays.values()) + 1
    merged = spark.read.parquet(target)
    assert merged.count() == n_first + 2  # France day-3 + Spain day-3


def test_cli_curate(spark, tmp_path):
    out = str(tmp_path / "curated")
    assert main([
        "curate", "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--out", out, "--test-rate", "0.1",
    ]) == 0
    curated = spark.read.parquet(out)
    n_in = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert {r["split"] for r in curated.select("split").distinct().collect()} <= {"train", "test"}
    assert 0 < curated.count() < n_in  # gate+dedup dropped some, kept most
    # annotation columns materialized for downstream training jobs
    for col in ("quality", "lang_pred", "fingerprint"):
        assert col in curated.columns


def test_cli_profile_and_validate(spark, tmp_path, capsys):
    from etl_oms_spark.__main__ import main

    src = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, 10), (1, 20), (2, None)], "id INT, v INT"
    ).write.parquet(src)

    assert main(["profile", "--table", src]) == 0
    out = capsys.readouterr().out
    assert "n_distinct" in out and "id" in out

    # duplicate id=1 -> nonzero violations -> exit code 2
    assert main(["validate", "--table", src, "--pk", "id"]) == 2
    out = capsys.readouterr().out
    assert "pk_duplicate_keys" in out

    parent = str(tmp_path / "p.parquet")
    spark.createDataFrame([(10,), (20,)], "pid INT").write.parquet(parent)
    clean = str(tmp_path / "c.parquet")
    spark.createDataFrame([(1, 10), (2, 20)], "id INT, v INT").write.parquet(clean)
    rc = main(["validate", "--table", clean, "--pk", "id",
               "--fk", f"v:{parent}:pid"])
    assert rc == 0


def test_cli_export_and_ingest(spark, tmp_path):
    from etl_oms_spark.__main__ import main

    src = tmp_path / "t"
    spark.range(50).selectExpr("id", "concat('v', id) AS v").write.parquet(str(src))
    out = tmp_path / "shards"
    assert main(["export", "--table", str(src), "--out", str(out),
                 "--target-mb", "1"]) == 0
    assert spark.read.json(str(out)).count() == 50

    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "a.csv").write_text("id,v\n1,x\n")
    ledger = str(tmp_path / "ledger")
    tgt = str(tmp_path / "ingested")
    assert main(["ingest", "--directory", str(ind), "--ledger", ledger,
                 "--out", tgt]) == 0
    assert spark.read.parquet(tgt).count() == 1
    # second run: no new files, target unchanged
    assert main(["ingest", "--directory", str(ind), "--ledger", ledger,
                 "--out", tgt]) == 0
    assert spark.read.parquet(tgt).count() == 1


def test_cli_curate_config_file(spark, tmp_path):
    import json

    from etl_oms_spark.__main__ import main

    cfg = tmp_path / "pipeline.json"
    cfg.write_text(json.dumps({
        "min_tokens": 5, "near_dup_threshold": 0.9, "test_rate": 0.5,
    }))
    out = str(tmp_path / "curated_cfg")
    assert main([
        "curate", "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--out", out, "--config", str(cfg),
    ]) == 0
    curated = spark.read.parquet(out)
    splits = {r["split"] for r in curated.select("split").distinct().collect()}
    assert splits == {"train", "test"}  # 50% test rate -> both populated


def test_cli_search(spark, tmp_path, capsys):
    from etl_oms_spark.__main__ import main

    src = tmp_path / "docs"
    rows = [
        (1, "spark joins the hash table fast"),
        (2, "window functions over streams"),
        (3, "nothing relevant here at all"),
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(str(src))
    assert main(["search", "--table", str(src), "--terms", "spark hash",
                 "--k", "2"]) == 0
    out = capsys.readouterr().out
    # doc 1 matches both terms and must surface; doc 3 must not
    assert "1" in out.split("doc_id", 1)[1]
    assert "score" in out


def test_cli_decontaminate(spark, tmp_path, capsys):
    import __main__  # noqa: F401 (ensure no module-name clash)
    from etl_oms_spark.__main__ import main

    shared = " ".join(f"b{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "src0", "some unique corpus document with plenty of words here"),
            (2, "src0", shared + " trailing content after the benchmark run"),
            (3, "src1", "another clean document that should survive intact ok"),
            (4, "src1", "another clean document that should survive intact ok"),
            (5, "src1", "prefix words " + shared + " and a suffix"),
        ],
        "doc_id long, source string, text string",
    )
    bench = spark.createDataFrame(
        [(100, shared)], "doc_id long, text string"
    )
    dpath, bpath, out = (
        str(tmp_path / "docs"),
        str(tmp_path / "bench"),
        str(tmp_path / "released"),
    )
    docs.write.parquet(dpath)
    bench.write.parquet(bpath)
    rc = main(
        [
            "--master", "local[2]",
            "decontaminate",
            "--documents", dpath,
            "--benchmark", bpath,
            "--out", out,
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.collect()}
    # docs 2 and 5 share 5-shingles with the benchmark -> decontaminated;
    # doc 4 is an exact dup of 3 -> deduped; 1 and 3 survive
    assert ids == {1, 3}
    assert "released 2/5 docs" in capsys.readouterr().out
