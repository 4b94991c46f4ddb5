"""Sessionization and custom stateful/grouped operators.

Two tiers, per the engine's UDF policy (built-ins first, Arrow second):

- `sessionize` — native ``session_window`` (gap-based sessions). Batch AND
  Structured Streaming (with watermark) share the plan; state eviction is
  handled by the engine. No Python.
- `grouped_ema` — exponential moving average per group: genuinely
  recursive (each value depends on the previous smoothed value), not
  expressible as a window aggregate → Arrow-batched ``applyInPandas``
  (grouped-map). The template for any custom per-group sequential
  operator: one shuffle on the group key, pandas inside, vectorized
  math inside each group.
- `running_distinct_users` — example of a stateful streaming-style metric
  done natively: distinct accumulation via window rank.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(
    events: DataFrame,
    gap: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based sessions per user: native ``session_window`` — sessions
    close after ``gap`` of inactivity. Streaming-ready: pass ``watermark``
    and the same plan runs under readStream with bounded state.

    ``value_col`` names the column summed into ``session_value``; when the
    frame has no such column (or ``value_col=None``) the aggregate is
    skipped instead of failing to resolve."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    aggs = [F.count(F.lit(1)).alias("n_events")]
    has_value = value_col is not None and value_col in events.columns
    if has_value:
        aggs.append(
            (F.sum(F.round(F.col(value_col) * 100).cast("long")) / F.lit(100.0)).alias(
                "session_value"
            )
        )
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(*aggs)
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            *(["session_value"] if has_value else []),
        )
    )


def grouped_ema(
    df: DataFrame,
    alpha: float = 0.3,
    group_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """Per-group exponential moving average (grouped-map applyInPandas).

    ``ema_t = alpha*x_t + (1-alpha)*ema_{t-1}`` is recursive — no window
    frame expresses it — so this is the legitimate Arrow escape hatch.

    Implementation note: NOT ``groupBy().applyInPandas`` — that ships one
    Arrow frame per group, and with many small groups the per-group
    exchange overhead dominates (~5× slower here). Instead: hash-
    repartition on the group key, sort within partitions, and run ONE
    ``mapInPandas`` over each partition with a pandas groupby inside —
    dozens of Arrow streams instead of thousands. Constraint: a partition
    must fit in worker memory (size ``spark.sql.shuffle.partitions``
    accordingly); groups never straddle partitions because the partitioner
    is hash-on-key.
    """
    from collections.abc import Iterator

    order_list = list(order_cols)
    schema = T.StructType(
        [df.schema[group_col]]
        + [df.schema[c] for c in order_list]
        + [T.StructField("ema", T.DoubleType())]
    )
    cols = [group_col, *order_list]

    def ema_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # concat the partition's Arrow batches: a group may straddle batch
        # boundaries within the partition, never across partitions
        pdf = pd.concat(list(batches), ignore_index=True)
        if pdf.empty:
            return
        out = pdf[cols].copy()
        out["ema"] = (
            pdf.groupby(group_col, sort=False)[value_col]
            .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
        )
        yield out

    prepared = (
        df.select(*cols, value_col)
        .repartition(group_col)
        .sortWithinPartitions(*cols)
    )
    return prepared.mapInPandas(ema_partition, schema=schema)


def running_distinct_users(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cumulative distinct-user count over event-time days — the batch twin
    of a streaming distinct-count metric, done natively: first-seen rank
    then a running sum over days."""
    first_seen = (
        events.groupBy("user_id")
        .agg(F.min(F.col(ts_col)).alias("first_ts"))
        .select(F.date_trunc("day", F.col("first_ts")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return first_seen.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("total_users"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the timestamp at which each
    step of ``steps`` was FIRST reached in order (step i counts only
    strictly after step i-1), plus ``stage`` = number of steps reached.

    One shuffle (groupBy user), then a JVM-side fold over the user's
    time-sorted event array — ``F.aggregate`` with an array<timestamp>
    accumulator, no UDF. Equivalent closed form: t_i = min event ts of
    type steps[i] with ts > t_{i-1} (strict, so simultaneous events never
    satisfy two consecutive steps). Per-user state is the event list —
    bounded by events-per-user, the same contract as sessionize/
    collect_list analytics; at whale-user scale pre-filter ``events`` to
    the funnel's event types first (the fold only reads those).

    Output: (user, t_<step> per step, stage).
    """
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    seq = (
        events.filter(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y"))
                )
            ).alias("__seq")
        )
    )
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(n)])

    def step_fold(acc, e):
        def prev_ok(j):
            # element_at is 1-based and rejects index 0, so the j=0 branch
            # must short-circuit via CASE (when) before acc[j] evaluates
            return F.when(j == 0, F.lit(True)).otherwise(
                F.element_at(acc, j).isNotNull()
                & (e["t"] > F.element_at(acc, j))
            )

        return F.transform(
            acc,
            lambda t, j: F.when(t.isNotNull(), t).when(
                (e["y"] == F.element_at(steps_arr, j + 1)) & prev_ok(j),
                e["t"],
            ),
        )

    folded = seq.select(
        F.col(user_col),
        F.aggregate(F.col("__seq"), init, step_fold).alias("__f"),
    )
    cols = [
        F.element_at(F.col("__f"), i + 1).alias(f"t_{s}")
        for i, s in enumerate(steps)
    ]
    stage = F.size(F.filter(F.col("__f"), lambda t: t.isNotNull()))
    return folded.select(F.col(user_col), *cols, stage.cast("int").alias("stage"))
