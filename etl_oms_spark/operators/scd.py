"""Slowly-changing-dimension (Type 2) maintenance.

The reference maintains Type-1 dims (ON CONFLICT DO UPDATE overwrites in
place — ETL_OMS_FINAL_Upgraded.py:129-137); SCD2 is the standard warehouse
extension when history must survive: instead of overwriting an attribute,
the current row is closed (``valid_to`` set) and a new version row opens.

Two operators:

- `scd2_history`: build a version table from an ordered change log (CDC
  events) in one pass — per-key change-point detection with lag/lead
  windows, no iteration. (key, attrs, valid_from, valid_to, is_current).
- `scd2_apply`: apply a batch of updates to an existing SCD2 dimension —
  close changed current rows, insert new versions, pass history through.
  Pure DataFrame algebra: one broadcast-or-shuffle join on the business
  key + a union; at scale the dim should be bucketed/partitioned by key.

Scale: both shuffle once on the business key; per-key state is bounded by
that key's version count (windows, not collect_list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Version table from a change log: one row per (key, attr-state
    episode), ``valid_from`` = first ts of the episode, ``valid_to`` = next
    episode's start (NULL while current), ``is_current`` flag.

    Change-point = any tracked attribute differs from the previous event
    of the same key (null-safe compare); consecutive duplicate states
    collapse into one version. Ties on ts break deterministically on the
    attribute values.
    """
    order = Window.partitionBy(key_col).orderBy(ts_col, *attr_cols)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(order))
    first = F.row_number().over(order) == 1
    episodes = df.select(key_col, ts_col, *attr_cols).withColumn(
        "__new_version", first | changed
    ).filter(F.col("__new_version"))
    seq = Window.partitionBy(key_col).orderBy(ts_col, *attr_cols)
    return (
        episodes.select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(seq).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Apply one update batch (key, attrs, ts) to an SCD2 dimension.

    - new key → insert as current (valid_from = ts).
    - changed attrs vs the key's current row → close that row
      (valid_to = ts) and insert the new version as current.
    - unchanged attrs → no-op (idempotent re-runs).
    - historical (already-closed) rows pass through untouched.

    ``updates`` must carry one row per key (keep-last upstream if not).
    """
    u = updates.select(
        F.col(key_col),
        *[F.col(a).alias(f"__u_{a}") for a in attr_cols],
        F.col(ts_col).alias("__u_ts"),
    )
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    joined = cur.join(u, key_col, "full_outer")
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col(a).eqNullSafe(F.col(f"__u_{a}"))
    has_cur = F.col("valid_from").isNotNull()
    has_upd = F.col("__u_ts").isNotNull()

    # existing current rows: keep open unless the update changed the attrs
    kept = joined.filter(has_cur).select(
        key_col,
        *attr_cols,
        F.col("valid_from"),
        F.when(has_upd & ~same, F.col("__u_ts")).alias("valid_to"),
    )
    # new versions: brand-new keys, or changed attrs
    opened = joined.filter(has_upd & (~has_cur | ~same)).select(
        key_col,
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.col("__u_ts").alias("valid_from"),
        F.lit(None).cast(joined.schema["valid_from"].dataType).alias("valid_to"),
    )
    out = kept.unionByName(opened).withColumn(
        "is_current", F.col("valid_to").isNull()
    )
    return hist.select(*out.columns).unionByName(out)


def scd2_pit_join(
    history: DataFrame,
    probes: DataFrame,
    key_col: str,
    probe_ts: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: each probe row picks up the SCD2 version that
    was valid at its timestamp — ``valid_from <= probe_ts < valid_to``
    (half-open; the open-ended current version matches everything from
    its ``valid_from`` on). Probes before a key's first version keep NULL
    attributes under the default left join — the "state unknown yet"
    answer, not a dropped row.

    Execution shape: an equi-join on the key with the range predicate as
    a post-join filter — Spark hash/sort-merge joins on the key, so the
    cost is key-partitioned and each probe meets only its own key's
    (short) version chain, never the whole history. Returns all probe
    columns plus the history's attribute columns, `valid_from`, and
    `valid_to`.
    """
    h = history.alias("__h")
    p = probes.alias("__p")
    ts = F.col(f"__p.{probe_ts}")
    cond = (
        (F.col(f"__h.{key_col}") == F.col(f"__p.{key_col}"))
        & (ts >= F.col("__h.valid_from"))
        & (F.col("__h.valid_to").isNull() | (ts < F.col("__h.valid_to")))
    )
    hist_cols = [
        c for c in history.columns if c not in (key_col, "is_current")
    ]
    return p.join(h, cond, how).select(
        *[F.col(f"__p.{c}") for c in probes.columns],
        *[F.col(f"__h.{c}") for c in hist_cols],
    )
