"""Grouped percentiles with scale-safe lowerings.

Spark's exact ``percentile`` aggregate buffers EVERY value of a group in a
single task's aggregation buffer (an in-memory array inside one
``ObjectHashAggregate`` buffer). With a handful of coarse groups — exactly
the shape of per-source/per-returnflag analytics — a 100 TB corpus puts
billions of values into one buffer: an OOM, not a slowdown. The reference
(pandas ``quantile`` in notebook exploration) has the same single-node
semantics; this module re-expresses them with three lowerings:

- ``mode="hist"`` (default): **two-phase exact**. Phase 1 collapses the
  corpus to a per-(group, value) histogram — an ordinary map-side-combined
  count shuffle bounded by per-group *distinct* values, not rows. Phase 2
  walks ranks over the histogram with a per-group ordered window (sort-based
  and spillable, never an in-memory array) and reproduces Spark's exact
  interpolation formula ``(hi - pos) * v_lo + (pos - lo) * v_hi``
  (see Spark's Percentile.scala) bit-for-bit, so oracle compares stay exact.
- ``mode="buffer"``: Spark's native ``percentile(...)`` — the literal
  reference semantics, kept for oracle twins and small data.
- ``mode="approx"``: ``approx_percentile`` (KLL-style sketch), the 100 TB
  default when rank error is acceptable; single scan, constant memory.

Reference parity: ETL_OMS_FINAL_Upgraded.py's ad-hoc ``describe()``/quantile
exploration, generalized to grouped form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def group_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value: str | Column,
    probs: list[float],
    names: list[str] | None = None,
    mode: str = "hist",
    accuracy: int = 10000,
    count_col: str | None = None,
) -> DataFrame:
    """One row per group with a double column per requested percentile.

    ``value`` may be a column name or an expression Column (numeric).
    ``names`` defaults to ``p{int(100*prob)}``. ``count_col`` (optional)
    adds the non-null value count per group. NULL values are ignored, as
    with Spark's ``percentile``.
    """
    if names is None:
        names = [f"p{int(round(100 * p))}" for p in probs]
    if len(names) != len(probs):
        raise ValueError("names and probs must have equal length")
    vcol = F.col(value) if isinstance(value, str) else value

    if mode == "buffer":
        aggs = [
            F.expr(f"percentile(__v, {p!r})").alias(nm)
            for p, nm in zip(probs, names)
        ]
        if count_col:
            aggs.append(F.count("__v").cast("long").alias(count_col))
        return (
            df.select(*group_cols, vcol.alias("__v"))
            .groupBy(*group_cols)
            .agg(*aggs)
        )

    if mode == "approx":
        base = df.select(*group_cols, vcol.cast("double").alias("__v"))
        aggs = [
            F.percentile_approx("__v", p, accuracy).alias(nm)
            for p, nm in zip(probs, names)
        ]
        if count_col:
            aggs.append(F.count("__v").cast("long").alias(count_col))
        return base.groupBy(*group_cols).agg(*aggs)

    if mode != "hist":
        raise ValueError(f"unknown mode {mode!r}: expected hist|buffer|approx")

    # -- two-phase exact -------------------------------------------------
    hist = (
        df.select(*group_cols, vcol.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy(*group_cols, "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_ord = Window.partitionBy(*group_cols).orderBy("__v")
    w_all = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "__v",
        "__c",
        F.sum("__c").over(w_ord).alias("__cum"),  # values <= __v
        F.sum("__c").over(w_all).alias("__n"),
    )
    # sorted 0-based index range covered by value __v: [__cum-__c, __cum-1]
    first_idx = F.col("__cum") - F.col("__c")
    last_idx = F.col("__cum") - 1

    aggs = []
    post = []
    for p, nm in zip(probs, names):
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        lo = F.floor(pos)
        hi = F.ceil(pos)
        v_lo = F.max(
            F.when((first_idx <= lo) & (lo <= last_idx), F.col("__v"))
        ).alias(f"__lo_{nm}")
        v_hi = F.max(
            F.when((first_idx <= hi) & (hi <= last_idx), F.col("__v"))
        ).alias(f"__hi_{nm}")
        # pos/lo/hi are per-group constants (functions of __n); carry one copy
        aggs += [
            v_lo,
            v_hi,
            F.max(pos).alias(f"__pos_{nm}"),
        ]
        lo_v = F.col(f"__lo_{nm}").cast("double")
        hi_v = F.col(f"__hi_{nm}").cast("double")
        pos_c = F.col(f"__pos_{nm}")
        lo_c = F.floor(pos_c).cast("double")
        hi_c = F.ceil(pos_c).cast("double")
        # Spark Percentile.scala: lower == higher -> exact value, else
        # (higher - pos) * v_lo + (pos - lower) * v_hi
        post.append(
            F.when(lo_c == hi_c, lo_v)
            .otherwise((hi_c - pos_c) * lo_v + (pos_c - lo_c) * hi_v)
            .alias(nm)
        )
    if count_col:
        aggs.append(F.max("__n").cast("long").alias(count_col))
        post.append(F.col(count_col))
    return cum.groupBy(*group_cols).agg(*aggs).select(*group_cols, *post)


def _grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
) -> DataFrame:
    """Distributed exact per-group 0-based rank: the shared core of
    `grouped_ntile` / `grouped_percent_rank`.

    1. range-partition on (group, order) — disjoint sorted key ranges, so
       for any group, rows in partition p all precede rows in p+1;
    2. per-(partition, group) counts → a partitions×groups-sized frame;
       cumulative offsets per group over ascending partition id (a window
       over that TINY frame) give each partition its group-rank base;
    3. local ``row_number`` per (partition, group) — bounded by partition
       size, sort-based, spillable — plus the broadcast offset.

    Returns the input plus ``__r`` (0-based per-group rank in row_number
    semantics: ties broken by position, so ``order_cols`` must be a TOTAL
    order within each group for determinism), ``__n`` (group size), and
    ``__pid``. Callers consume and drop the bookkeeping columns.
    """
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # lazy barrier: ranged feeds both the per-(partition, group) counts
    # and the final rank join. Without it each branch re-ran the whole
    # upstream (chained ntile passes compounded to 8 scans in rfm1's
    # round-13 executed-plan audit), and — worse — repartitionByRange
    # draws range bounds from a SAMPLE, so the two branches relied on
    # exchange reuse for consistent __pid assignment; one materialization
    # makes the partitioning shared by construction.
    ranged = df.repartitionByRange(
        *[F.col(g) for g in group_cols], *order_exprs
    ).withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=False)
    counts = ranged.groupBy("__pid", *group_cols).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*group_cols)
    meta = counts.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__offset"),
        F.sum("__c").over(w_tot).alias("__n"),
    )
    w_local = Window.partitionBy("__pid", *group_cols).orderBy(*order_exprs)
    r = (F.row_number().over(w_local) - 1 + F.col("__offset")).cast("long")
    return (
        ranged.join(F.broadcast(meta), ["__pid", *group_cols])
        .withColumn("__r", r)
        .drop("__offset")
    )


def grouped_ntile(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    n_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact per-group ``ntile(n)`` WITHOUT a per-group corpus-wide window.

    ``ntile() OVER (PARTITION BY g ORDER BY ...)`` cannot split a window
    partition: the dominant group of a skewed corpus (50%+ English in web
    data) sorts in ONE task. This lowering reproduces ntile's exact bucket
    assignment from `_grouped_rank`'s distributed rank plus Spark's NTile
    arithmetic on (rank, group size): the first ``n % nb`` buckets take
    ``n div nb + 1`` rows, the rest ``n div nb``.

    ``order_cols`` accepts names or sort Columns (e.g.
    ``F.col("x").asc_nulls_first()``) and must be a TOTAL order within
    each group (include a tiebreak id) for deterministic assignment.
    """
    bsize = F.expr(f"__n DIV {n_buckets}")
    rem = F.col("__n") % n_buckets
    cutoff = rem * (bsize + 1)
    ranked = _grouped_rank(df, group_cols, order_cols)
    bucket = (
        F.when(
            F.col("__r") < cutoff,
            F.expr(f"__r DIV (__n DIV {n_buckets} + 1)") + 1,
        )
        .otherwise(
            rem
            + F.floor(
                (F.col("__r") - cutoff) / F.greatest(bsize, F.lit(1))
            )
            + 1
        )
        .cast("int")
    )
    return ranked.withColumn(bucket_col, bucket).drop("__pid", "__n", "__r")


def grouped_percent_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    rank_col: str = "pct_rank",
) -> DataFrame:
    """Exact per-group ``percent_rank()``-style CDF normalization without a
    corpus-wide window — rank-normalize a quality/fluency score per group
    so thresholds compare across groups (the CDF/quantile-normalization
    step of score-calibrated curation).

    Semantics = ``(row_number - 1) / (n - 1)`` over a TOTAL per-group
    order (supply a tiebreak id; with one, row_number ≡ rank and this IS
    SQL ``percent_rank``). Single-row groups get 0.0. The rank comes from
    `_grouped_rank` — every sort stays partition-bounded.
    """
    ranked = _grouped_rank(df, group_cols, order_cols)
    pr = F.when(F.col("__n") == 1, F.lit(0.0)).otherwise(
        F.col("__r").cast("double") / (F.col("__n") - 1).cast("double")
    )
    return ranked.withColumn(rank_col, pr).drop("__pid", "__n", "__r")
