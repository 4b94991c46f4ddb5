"""Golden-output parity against the reference's committed run artifacts.

The reference repo commits its EP2 star-schema outputs under
``Résultat de l'ETL/Monkeypox/`` (SURVEY §5: de-facto golden outputs, 33,666
fact rows from DATASETS/monkeypox_report.csv). This test runs OUR pipeline
on THEIR input and requires value-identical dims and facts — the strongest
behavioral-parity evidence available. Reference tree is read-only input.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

REF = "/root/reference"
GOLDEN = os.path.join(REF, "Résultat de l'ETL", "Monkeypox")
INPUT = os.path.join(REF, "DATASETS", "monkeypox_report.csv")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN) and os.path.exists(INPUT)),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def star_tables(spark):
    from etl_oms_spark.plans.pipelines import star_schema_pipeline
    from etl_oms_spark.sources.readers import read_csv

    return star_schema_pipeline(read_csv(spark, INPUT), "Monkeypox")


def test_pays_dim_identical(star_tables):
    golden = pd.read_csv(os.path.join(GOLDEN, "Pays.csv"))
    ours = star_tables["Pays"].toPandas()
    merged = golden.merge(ours, on="country", how="outer", suffixes=("_g", "_o"))
    assert len(merged) == len(golden) == len(ours) == 118
    assert (merged["id_pays_g"] == merged["id_pays_o"]).all()


def test_region_dim_identical(star_tables):
    golden = pd.read_csv(os.path.join(GOLDEN, "Region.csv"))
    ours = star_tables["Region"].toPandas()
    merged = golden.merge(ours, on="nom_region", how="outer", suffixes=("_g", "_o"))
    assert len(merged) == len(golden)
    assert (merged["id_region_g"] == merged["id_region_o"]).all()
    assert (merged["id_pays_g"] == merged["id_pays_o"]).all()


def test_maladie_dim(star_tables):
    golden = pd.read_csv(os.path.join(GOLDEN, "Maladie.csv"))
    ours = star_tables["Maladie"].toPandas()
    assert ours["nom_maladie"].tolist() == golden["nom_maladie"].tolist()


def test_statistique_fact_identical(star_tables):
    golden = pd.read_csv(os.path.join(GOLDEN, "Statistique.csv"))
    ours = star_tables["Statistique"].toPandas()
    assert len(ours) == len(golden) == 33666
    key = ["id_region", "date"]
    g = golden.assign(date=golden["date"].astype(str)).sort_values(key + ["nouveau_cas"]).reset_index(drop=True)
    o = ours.assign(date=ours["date"].astype(str)).sort_values(key + ["nouveau_cas"]).reset_index(drop=True)
    for col in ["id_maladie", "id_region", "nouveau_mort", "nouveau_cas", "total_mort"]:
        gv = pd.to_numeric(g[col], errors="coerce").fillna(-1)
        ov = pd.to_numeric(o[col], errors="coerce").fillna(-1)
        assert (gv == ov).all(), f"column {col} diverges from golden output"
    assert (g["date"] == o["date"]).all()


def test_directory_etl_over_reference_datasets(spark):
    """EP3-style single-pass run over the reference's full heterogeneous
    DATASETS directory: 7 files, day_wise ignored (no country column),
    snapshot files contribute no rows (no date column -> all dropped, the
    v4 rule), the three dated panels survive with correct disease tags."""
    from etl_oms_spark.plans.pipelines import run_directory_etl

    df, bilan = run_directory_etl(spark, os.path.join(REF, "DATASETS"))
    assert bilan == {"files_seen": 7, "processed": 6, "ignored": 1}
    by_disease = {r["pandemic"]: r["count"] for r in df.groupBy("pandemic").count().collect()}
    assert by_disease == {"COVID-19": 49068, "Monkeypox": 147448}
    sources = {r["_source_file"] for r in df.select("_source_file").distinct().collect()}
    assert sources == {
        "covid_global_3.csv", "monkeypox_report.csv", "monkeypox_report_2.csv",
    }
