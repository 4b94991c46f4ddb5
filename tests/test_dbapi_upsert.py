"""End-to-end staging + ON CONFLICT upsert against a REAL database
connection (embedded DuckDB), matching the reference's
``INSERT ... ON CONFLICT (id_region, date) DO UPDATE``
(ETL_OMS_FINAL_Upgraded.py:129-137, ETL_OMS_OPERATIONNEL.py:202-211):
idempotent re-runs, NULL-overwriting matched rows, and semantic parity
with the in-engine merge_dataframes twin."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from etl_oms_spark.merge import merge_dataframes
from etl_oms_spark.sources.writers import upsert_sql, upsert_via_dbapi

DDL = """
CREATE TABLE statistique (
    id_region INT,
    date DATE,
    nouveau_cas BIGINT,
    nouveau_mort BIGINT,
    PRIMARY KEY (id_region, date)
)
"""


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "id_region int, date date, nouveau_cas long, nouveau_mort long"
    )


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "wh.duckdb")
    con = duckdb.connect(path)
    con.execute(DDL)
    con.close()
    return path


def test_upsert_sql_shape():
    sql = upsert_sql("t", "s", ["id_region", "date"], ["nouveau_cas"])
    assert "ON CONFLICT (id_region, date) DO UPDATE" in sql
    assert "nouveau_cas = EXCLUDED.nouveau_cas" in sql


def test_dbapi_upsert_insert_update_idempotent(spark, db):
    d = datetime.date(2022, 5, 1)
    first = _frame(spark, [(1, d, 10, 1), (2, d, 20, 2)])
    n = upsert_via_dbapi(
        first, lambda: duckdb.connect(db), "statistique",
        ["id_region", "date"], ["nouveau_cas", "nouveau_mort"],
    )
    assert n == 2

    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM statistique").fetchone()[0] == 2

    # re-run the same batch: the reference's bilan property — row count
    # unchanged, values unchanged (idempotent ON CONFLICT)
    upsert_via_dbapi(
        first, lambda: duckdb.connect(db), "statistique",
        ["id_region", "date"], ["nouveau_cas", "nouveau_mort"],
    )
    rows = con.execute(
        "SELECT id_region, nouveau_cas FROM statistique ORDER BY id_region"
    ).fetchall()
    assert rows == [(1, 10), (2, 20)]

    # update one key, insert a new one
    second = _frame(spark, [(2, d, 25, 3), (3, d, 30, 4)])
    upsert_via_dbapi(
        second, lambda: duckdb.connect(db), "statistique",
        ["id_region", "date"], ["nouveau_cas", "nouveau_mort"],
    )
    rows = con.execute(
        "SELECT id_region, nouveau_cas, nouveau_mort FROM statistique ORDER BY id_region"
    ).fetchall()
    assert rows == [(1, 10, 1), (2, 25, 3), (3, 30, 4)]
    con.close()


def test_dbapi_upsert_null_overwrites(spark, db):
    d = datetime.date(2022, 5, 1)
    upsert_via_dbapi(
        _frame(spark, [(1, d, 10, 1)]), lambda: duckdb.connect(db),
        "statistique", ["id_region", "date"], ["nouveau_cas", "nouveau_mort"],
    )
    # DO UPDATE SET c = EXCLUDED.c overwrites with NULL — the DB path and
    # merge_dataframes must agree on this
    upsert_via_dbapi(
        _frame(spark, [(1, d, None, 7)]), lambda: duckdb.connect(db),
        "statistique", ["id_region", "date"], ["nouveau_cas", "nouveau_mort"],
    )
    con = duckdb.connect(db)
    assert con.execute(
        "SELECT nouveau_cas, nouveau_mort FROM statistique"
    ).fetchall() == [(None, 7)]
    con.close()


def test_dbapi_upsert_matches_in_engine_merge(spark, db):
    """The DB ON CONFLICT path and the in-engine merge_dataframes twin
    produce identical tables for the same existing/updates inputs."""
    d1, d2 = datetime.date(2022, 5, 1), datetime.date(2022, 5, 2)
    existing = _frame(spark, [(1, d1, 10, 1), (2, d1, 20, 2), (2, d2, 21, 3)])
    updates = _frame(spark, [(2, d1, None, 9), (3, d1, 30, 4)])

    keys = ["id_region", "date"]
    vals = ["nouveau_cas", "nouveau_mort"]
    upsert_via_dbapi(existing, lambda: duckdb.connect(db), "statistique", keys, vals)
    upsert_via_dbapi(updates, lambda: duckdb.connect(db), "statistique", keys, vals)

    con = duckdb.connect(db)
    db_rows = sorted(
        con.execute(
            "SELECT id_region, date, nouveau_cas, nouveau_mort FROM statistique"
        ).fetchall()
    )
    con.close()

    merged = merge_dataframes(existing, updates, keys)
    engine_rows = sorted(
        (r["id_region"], r["date"], r["nouveau_cas"], r["nouveau_mort"])
        for r in merged.collect()
    )
    assert db_rows == engine_rows


def test_dbapi_dim_read_broadcast_join_grow_cycle(spark, tmp_path):
    """S5 seam closed end-to-end: read a dim from a REAL embedded DB,
    broadcast-join it into a fact, grow it with unseen members
    (grow_dimension), write the grown dim back, and read it again —
    the reference's SELECT-dims / INSERT-new-members cycle
    (ETL_OMS_OPERATIONNEL.py:229-234, 276-284)."""
    from pyspark.sql import functions as F

    from etl_oms_spark.sources.readers import read_dbapi_dim
    from etl_oms_spark.star import grow_dimension

    path = str(tmp_path / "dims.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE region (id_region INT, nom_region VARCHAR)")
    con.execute("INSERT INTO region VALUES (1, 'France'), (2, 'Spain')")
    con.close()

    dim = read_dbapi_dim(spark, lambda: duckdb.connect(path), "region")
    assert dim.columns == ["id_region", "nom_region"]

    fact = spark.createDataFrame(
        [("France", 10), ("Spain", 7), ("Italy", 3)], "nom_region STRING, cases INT"
    )
    joined = fact.join(F.broadcast(dim), "nom_region", "left")
    got = {r["nom_region"]: r["id_region"] for r in joined.collect()}
    assert got == {"France": 1, "Spain": 2, "Italy": None}

    grown = grow_dimension(dim, fact.select("nom_region"), "nom_region", "id_region")
    new = {r["nom_region"]: r["id_region"] for r in grown.collect()}
    assert new == {"France": 1, "Spain": 2, "Italy": 3}

    # write the new member back and re-read: the cycle is stable
    con = duckdb.connect(path)
    con.execute("INSERT INTO region VALUES (3, 'Italy')")
    con.close()
    again = read_dbapi_dim(
        spark, lambda: duckdb.connect(path),
        "SELECT id_region, nom_region FROM region ORDER BY id_region",
    )
    assert {r["nom_region"]: r["id_region"] for r in again.collect()} == new

    # explicit schema path (needed for empty dims)
    empty = read_dbapi_dim(
        spark, lambda: duckdb.connect(path),
        "SELECT id_region, nom_region FROM region WHERE 1=0",
        schema="id_region INT, nom_region STRING",
    )
    assert empty.count() == 0 and empty.columns == ["id_region", "nom_region"]
