"""Live-PostgreSQL integration for the S8/S9 COPY + ON CONFLICT path
(`upsert_via_copy`), asserting the exact semantics the embedded-DuckDB
DB-API test pins (reference ETL_OMS_OPERATIONNEL.py:170-211): insert,
NULL-overwriting update, and idempotent re-runs.

Gated twice: skipped unless psycopg2 is importable AND POSTGRES_DSN is
set (e.g. ``POSTGRES_DSN=postgresql://user:pw@host:5432/db pytest``).
Neither ships in this container, so CI records a skip — the test is the
deployment-time contract check.
"""

from __future__ import annotations

import datetime
import os

import pytest

psycopg2 = pytest.importorskip("psycopg2")

DSN = os.environ.get("POSTGRES_DSN")
pytestmark = pytest.mark.skipif(
    not DSN, reason="POSTGRES_DSN not set; live-Postgres integration only"
)

TABLE = "spark_graft_upsert_it"


@pytest.fixture()
def pg_table():
    conn = psycopg2.connect(DSN)
    conn.autocommit = True
    with conn.cursor() as cur:
        cur.execute(f"DROP TABLE IF EXISTS {TABLE}")
        cur.execute(
            f"""CREATE TABLE {TABLE} (
                id_region INT,
                date DATE,
                nouveau_cas BIGINT,
                nouveau_mort BIGINT,
                PRIMARY KEY (id_region, date)
            )"""
        )
    yield conn
    with conn.cursor() as cur:
        cur.execute(f"DROP TABLE IF EXISTS {TABLE}")
    conn.close()


def _rows(conn):
    with conn.cursor() as cur:
        cur.execute(
            f"SELECT id_region, nouveau_cas, nouveau_mort FROM {TABLE} "
            "ORDER BY id_region"
        )
        return cur.fetchall()


def test_upsert_via_copy_insert_update_null_idempotent(spark, pg_table):
    from etl_oms_spark.sources.writers import upsert_via_copy

    d = datetime.date(2022, 5, 1)
    keys = ["id_region", "date"]
    upd = ["nouveau_cas", "nouveau_mort"]

    def frame(rows):
        return spark.createDataFrame(
            rows, "id_region int, date date, nouveau_cas long, nouveau_mort long"
        )

    upsert_via_copy(frame([(1, d, 10, 1), (2, d, 20, 2)]), DSN, TABLE, keys, upd)
    assert _rows(pg_table) == [(1, 10, 1), (2, 20, 2)]

    # matched row updates (NULL overwrites, Postgres EXCLUDED semantics);
    # unmatched inserts
    upsert_via_copy(frame([(2, d, 25, None), (3, d, 30, 3)]), DSN, TABLE, keys, upd)
    assert _rows(pg_table) == [(1, 10, 1), (2, 25, None), (3, 30, 3)]

    # idempotent re-run of the same batch
    upsert_via_copy(frame([(2, d, 25, None), (3, d, 30, 3)]), DSN, TABLE, keys, upd)
    assert _rows(pg_table) == [(1, 10, 1), (2, 25, None), (3, 30, 3)]
