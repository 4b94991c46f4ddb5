"""Upsert / merge semantics (J5/S9/S10) as pure DataFrame algebra.

The reference upserts into Postgres with ``INSERT ... ON CONFLICT (id_region,
date) DO UPDATE`` (ETL_OMS_FINAL_Upgraded.py:129-137,
ETL_OMS_OPERATIONNEL.py:202-211). Spark has no JDBC MERGE, so the engine
offers:

1. `merge_dataframes` — in-engine merge: ``full_outer`` join on the key +
   per-column ``coalesce(new, old)``. This is the semantics used for
   lakehouse-style sinks and for the correctness oracle (plain SQL FULL
   JOIN). One shuffle on the merge key; with both sides bucketed/partitioned
   on the key it becomes shuffle-free.
2. `upsert_coalesce_nulls` — the S10 "fill only where NULL" batch update
   (ETL_OMS_OPERATIONNEL.py:337-352): ``coalesce(old, new)`` instead.
3. The JDBC staging + ``ON CONFLICT`` path lives in sources.writers
   (network sink, not algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_dataframes(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``existing`` on ``keys`` (J5).

    WHEN MATCHED → take the update's values; WHEN NOT MATCHED → insert; rows
    only in ``existing`` are kept. Exactly ``ON CONFLICT DO UPDATE``.
    """
    update_cols = update_cols or [c for c in existing.columns if c not in keys]
    e = existing.alias("e")
    # presence marker instead of per-column coalesce: Postgres DO UPDATE
    # SET c = EXCLUDED.c overwrites with the update row's value even when
    # that value is NULL — coalesce(u.c, e.c) would silently keep the old
    # non-NULL value. The marker distinguishes "update row matched" from
    # "update column is NULL".
    u = updates.withColumn("__hit", F.lit(1)).alias("u")
    joined = e.join(u, keys, "full_outer")
    hit = F.col("u.__hit").isNotNull()
    cols = [
        # key columns: coalesce across sides (full-outer may null one side)
        *[F.coalesce(F.col(f"u.{k}"), F.col(f"e.{k}")).alias(k) for k in keys],
        *[
            F.when(hit, F.col(f"u.{c}")).otherwise(F.col(f"e.{c}")).alias(c)
            if c in updates.columns and c in update_cols
            else F.col(f"e.{c}").alias(c)
            for c in existing.columns
            if c not in keys
        ],
    ]
    return joined.select(*cols)


def upsert_coalesce_nulls(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    fill_cols: list[str],
) -> DataFrame:
    """S10: update columns only where the existing value is NULL.

    The reference batches this as one CASE-WHEN UPDATE statement
    (ETL_OMS_OPERATIONNEL.py:337-352); in-engine it is a left join +
    ``coalesce(old, new)`` — old wins when present.
    """
    u = updates.select(*keys, *fill_cols)
    renamed = u.select(
        *keys, *[F.col(c).alias(f"__new_{c}") for c in fill_cols]
    )
    joined = existing.join(F.broadcast(renamed), keys, "left")
    out_cols = []
    for c in existing.columns:
        if c in fill_cols:
            out_cols.append(F.coalesce(F.col(c), F.col(f"__new_{c}")).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def cdc_snapshot(
    log: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str,
    value_cols: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """Replay an insert/update/delete change log into its final snapshot:
    per key, the latest operation wins; a latest-op delete removes the key.

    The batch twin of streaming foreach_batch_upsert and the generalization
    of the reference's ON CONFLICT upserts (ETL_OMS_FINAL_Upgraded.py:
    129-137) to logs that carry deletes. One shuffle on the key for the
    keep-last window; ties on ``ts_col`` break deterministically on
    (op, values) so replays are idempotent on any partitioning.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(op_col).desc(), *[F.col(c).desc() for c in value_cols]
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .select(*key_cols, ts_col, op_col, *value_cols)
    )
