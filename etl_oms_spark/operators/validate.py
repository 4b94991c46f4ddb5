"""Constraint validation: the declarative twin of the reference's DDL.

The reference enforces integrity in PostgreSQL — UNIQUE constraints and
sequences declared in `GENERATION de la BDD/BDD Création.txt:4-29`, upserts
keyed on (id_region, date). A lakehouse has no engine-enforced constraints,
so every load validates them explicitly instead: primary-key uniqueness,
foreign-key closure, and not-null checks as ordinary aggregates over the
loaded data.

Each check is one key-bounded shuffle (groupBy on the key or a left-anti
probe); the report is checks-sized, never data-sized. At 100 TB run the
checks on the same scan as the load (they are plain DataFrame plans — union
them into the write job) rather than as separate passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows-per-duplicated-key beyond the first: groupBy(key) HAVING n>1.
    Returns (key..., n_rows) per violating key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Child rows whose key has no parent — left-anti join (broadcast when
    the parent is dim-sized, shuffle otherwise; Catalyst decides)."""
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(p, child_key, "left_anti")


def constraint_report(checks: dict[str, DataFrame]) -> DataFrame:
    """Fold named violation frames into one (check_name, n_violations)
    report — a union of count aggregates, one tiny row per check."""
    parts = []
    for name, df in checks.items():
        parts.append(
            df.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).cast("long").alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
