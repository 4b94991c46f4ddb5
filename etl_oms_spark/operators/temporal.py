"""Temporal joins Spark lacks as primitives: as-of join and range join.

Both are compositions of existing DataFrame operators (SURVEY §7 custom-op
policy: composition first, Arrow second, never driver loops):

- `asof_join` — for each left row, the most recent right row at or before
  its timestamp (trades/quotes, sensor alignment, SCD lookups). Implemented
  with the union + last-non-null-window trick: ONE shuffle on (by, ts) and
  a per-partition sort — no point-in-interval explosion, no broadcast
  requirement, no O(n·m). Equivalent to DuckDB/kdb ASOF JOIN semantics.
- `range_join` — point-in-interval equi-ish join via interval bucketing:
  intervals are exploded into fixed-width buckets, points join on their
  bucket, then the exact BETWEEN predicate filters. Turns a cross-join
  +filter (what Catalyst would do naively) into an equi join whose cost is
  O(points + intervals × avg_span/bucket_width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: per ``by`` group, the latest ``right`` row with
    ``right.on <= left.on`` (``direction="backward"``, the default) or the
    earliest with ``right.on >= left.on`` (``"forward"`` — pandas
    ``merge_asof`` parity; next-quote lookups, SLA deadline matching).

    Mechanics: tag both sides, union on (by, on), compute
    ``last(value, ignorenulls=True)`` over an unbounded-preceding window
    ordered by (on, side) — right rows sort before left rows at equal
    timestamps so exact-tie matches are included; forward simply walks
    time in descending order, same single shuffle. ``tolerance`` (e.g.
    ``"3600"`` seconds or an INTERVAL string like ``"1 hour"``) nulls
    matches outside the bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = by or []
    value_cols = value_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    out_names = {c: f"{c}{suffix}" if c in left.columns else c for c in value_cols}

    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        *by, on, *value_cols
    ).withColumn("__side", F.lit(0))

    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in value_cols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    on_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(on_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias("__asof_ts"),
    )
    result = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            F.col(on).cast("double") - F.col("__asof_ts").cast("double")
            if direction == "backward"
            else F.col("__asof_ts").cast("double") - F.col(on).cast("double")
        )
        try:
            bound = float(tolerance)
            in_tol = gap <= bound
        except ValueError:
            iv = F.expr(f"INTERVAL {tolerance}")
            in_tol = (
                F.col(on) <= F.col("__asof_ts") + iv
                if direction == "backward"
                else F.col("__asof_ts") <= F.col(on) + iv
            )
        keep = in_tol
        result = result.select(
            *left.columns,
            *[
                F.when(keep, F.col(f"__asof_{c}")).alias(out_names[c])
                for c in value_cols
            ],
        )
    else:
        result = result.select(
            *left.columns,
            *[F.col(f"__asof_{c}").alias(out_names[c]) for c in value_cols],
        )
    return result


def _col_as_long(df: DataFrame, c: str):
    # timestamps (tz'd or NTZ) → epoch seconds; numerics → long. Any
    # consistent monotonic mapping works: buckets only need to align
    # between the two sides, the exact BETWEEN uses original values.
    from pyspark.sql.types import TimestampNTZType, TimestampType

    dt = df.schema[c].dataType
    col = F.col(c)
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return col.cast("timestamp").cast("long")
    return col.cast("long")


def suggest_bucket_width(
    intervals: DataFrame, start_col: str, end_col: str
) -> int:
    """Bucket-width heuristic for `range_join`: the MEDIAN interval span.

    Each interval explodes into ``ceil(span / width) + 1`` bucket rows, so
    width ≈ median span bounds the fan-out at ~2 rows for half the
    intervals while keeping point buckets selective. One approxQuantile
    pass over the (small) intervals side — an eager action, so call it
    once at plan time, not per batch.
    """
    spans = intervals.select(
        (_col_as_long(intervals, end_col) - _col_as_long(intervals, start_col))
        .alias("__span")
    )
    med = spans.approxQuantile("__span", [0.5], 0.01)[0]
    return max(1, int(med or 1))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join via bucketing.

    ``bucket_width`` is in the column's native numeric unit (cast to long
    internally; for timestamps pass seconds and the columns are converted
    via epoch). Each interval emits one row per bucket it spans; points
    join on their single bucket; the exact predicate filters false
    positives. Choose bucket_width ≈ median interval length: too small
    explodes intervals, too large inflates the filter stage.

    ``bucket_width=None`` computes that median via `suggest_bucket_width`
    — one extra eager pass over the intervals side; pass an explicit
    width in latency-sensitive or streaming plans.
    """
    if bucket_width is None:
        bucket_width = suggest_bucket_width(intervals, start_col, end_col)

    p_bucket = (_col_as_long(points, point_col) / bucket_width).cast("long")
    i_start = (_col_as_long(intervals, start_col) / bucket_width).cast("long")
    i_end = (_col_as_long(intervals, end_col) / bucket_width).cast("long")

    exploded = intervals.withColumn(
        "__bucket", F.explode(F.sequence(i_start, i_end))
    )
    bucketed_points = points.withColumn("__bucket", p_bucket)
    joined = bucketed_points.join(exploded, "__bucket", how).filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bucket")


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 day",
    agg: str = "max",
) -> DataFrame:
    """Regularize an irregular event series onto a fixed-step time spine
    per key, forward-filling gaps — the resample/ffill every time-series
    warehouse needs (sensor rollups, daily account snapshots) and Spark
    has no primitive for.

    Three stages, all bounded:
    1. per-key span: ``groupBy(key).agg(min/max(bucket))`` — one shuffle,
       keys-sized result;
    2. spine: ``explode(sequence(first, last, interval step))`` — row
       count is keys × span/step, generated distributed, never on the
       driver;
    3. observed per bucket (``agg`` of values in the bucket, one more
       keys×buckets-sized shuffle) left-joined onto the spine, then
       ``last(value, ignorenulls=True)`` over an unbounded-preceding
       window per key carries the latest observation forward.

    ``agg="max"`` keeps the per-bucket reduction order-independent and
    therefore exact cross-engine; "last observed in bucket" semantics
    would be tie-dependent under duplicate timestamps (same trap as the
    lineitem keep-last note in COVERAGE.md).

    Empty buckets report ``n_events = 0`` and the carried value;
    leading buckets before a key's first observation keep NULL.

    Steps with a count > 1 ("2 hours", "15 minutes") bucket on an epoch
    grid (``floor(epoch / step_seconds)``) so observations and the spine
    share the same grid — ``date_trunc(unit)`` alone would place
    observations between spine points and silently drop them. Calendar
    units (month/year) have no fixed width, so only count == 1 is
    supported there.
    """
    parts = step.split()
    count = int(parts[0]) if len(parts) > 1 else 1
    unit = parts[-1].rstrip("s")
    if count == 1:
        bucket = F.date_trunc(unit, F.col(ts_col))
    else:
        fixed = {"second": 1, "minute": 60, "hour": 3600,
                 "day": 86400, "week": 604800}
        if unit not in fixed:
            raise ValueError(
                f"resample_ffill: step {step!r} — multi-count steps need a "
                "fixed-width unit (second/minute/hour/day/week); calendar "
                f"unit {unit!r} only supports count 1"
            )
        step_seconds = count * fixed[unit]
        bucket = F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(step_seconds))
            * F.lit(step_seconds)
        )
    spans = df.groupBy(key_col).agg(
        F.min(bucket).alias("__first"), F.max(bucket).alias("__last")
    )
    spine = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("__first"), F.col("__last"), F.expr(f"interval {step}"))
        ).alias("bucket_ts"),
    )
    observed = df.groupBy(key_col, bucket.alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("__n"),
        getattr(F, agg)(F.col(value_col)).alias("__v"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(observed, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("__v", ignorenulls=True).over(w).alias(f"{value_col}_filled"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket_seconds: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """Interval × interval overlap join: all (left, right) pairs sharing a
    ``by`` key whose time ranges intersect (``l.start <= r.end AND
    r.start <= l.end``, inclusive) — episode-overlap analytics, outage ×
    session attribution, genomics-style range intersection.

    Naive lowering is a cross join + filter per key. Here both sides
    explode into fixed-width buckets covering their span and equi-join on
    (by, bucket); a pair spanning several shared buckets is collapsed
    with ``dropDuplicates`` before the exact predicate. Cost is
    O(Σ span/bucket) rows shuffled instead of |L|×|R| per key —
    `range_join`'s discipline extended to two interval sides.
    ``bucket_seconds`` trades explode factor against join selectivity
    (heuristic: the median interval span).
    """
    def bucketed(df, start, end):
        b = F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / F.lit(bucket_seconds)),
                F.floor(F.unix_timestamp(F.col(end)) / F.lit(bucket_seconds)),
            )
        ).alias("__bucket")
        return df.select(*df.columns, b)

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(right, right_start, right_end)
    renames = {
        c: f"{c}{suffix}" for c in right.columns if c in left.columns and c not in by
    }
    for old, new in renames.items():
        rb = rb.withColumnRenamed(old, new)
    rs = renames.get(right_start, right_start)
    re_ = renames.get(right_end, right_end)
    joined = lb.join(rb, [*by, "__bucket"]).drop("__bucket").dropDuplicates()
    return joined.filter(
        (F.col(left_start) <= F.col(re_)) & (F.col(rs) <= F.col(left_end))
    )


def activity_islands(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gaps-and-islands: collapse each key's distinct active DAYS into
    maximal runs of consecutive days, returning one row per streak with
    (key, streak_start, streak_end, streak_days).

    Classic lowering: distinct days per key, then ``day -
    row_number()`` is constant within a consecutive run (the island id),
    then one group-by over (key, island). Both windows partition by the
    key, so nothing is corpus-global — the shuffle key is ``key_col``
    throughout and a hot user costs only its own day count (bounded by
    days-in-history, not events).

    The reference has no session analytics at all; this generalizes its
    per-period reporting (`ETL_OMS_OPERATIONNEL.py` date-window filters)
    to contiguity analysis.
    """
    from pyspark.sql import Window

    days = df.select(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("__day")
    ).distinct()
    w = Window.partitionBy(key_col).orderBy("__day")
    grp = days.withColumn(
        "__island", F.datediff(F.col("__day"), F.lit("1970-01-01")) - F.row_number().over(w)
    )
    return (
        grp.groupBy(key_col, "__island")
        .agg(
            F.min("__day").alias("streak_start"),
            F.max("__day").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("__island")
    )


def transition_matrix(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    state_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """First-order Markov transition counts + probabilities between
    consecutive states per key: one row per (from_state, to_state) with
    ``n_transitions`` and ``p`` = n / Σ n over the from-state.

    Lowering: per-key lead() window (shuffle on the key only), then a
    states²-bounded count aggregate — the output is tiny regardless of
    corpus size, and the probability division happens on exact integer
    counts so both engines compute identical doubles. ``tiebreak_col``
    makes the within-timestamp order total (deterministic transitions on
    simultaneous events).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("__next", F.lead(state_col).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"), F.col("__next").alias("to_state")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_from = Window.partitionBy("from_state")
    return pairs.withColumn(
        "p", F.col("n_transitions") / F.sum("n_transitions").over(w_from)
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    value_scale: int = 10_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average of a step signal: each observation
    holds until the key's next one, weight = that duration. Rows with no
    successor (each key's last) carry zero weight, as in a right-open
    integral; keys with a single event are absent from the output.

    Exactness: duration is integer microseconds, the value is scaled to
    an integer (``round(value*scale)``), the weighted sum is a product of
    BIGINTs — so the final double division is bit-identical across
    engines. Per-key windows keep the shuffle on ``key_col`` only.
    At 2^63 overflow limits: |value|≤10^5 at scale 10^4 leaves room for
    ~29 years of microseconds per row — validate inputs beyond that.
    ``tiebreak_col`` totalizes the order under equal timestamps: ties
    step with zero duration, but which tied value carries the weight to
    the next distinct timestamp depends on order, so pass a unique id
    for deterministic results.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    micros = (F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col)))
    vq = F.round(F.col(value_col) * F.lit(float(value_scale))).cast("long")
    rows = df.withColumn("__dur", micros).filter(F.col("__dur").isNotNull())
    return (
        rows.groupBy(key_col)
        .agg(
            F.sum(F.col("__dur") * vq).alias("__num"),
            F.sum("__dur").alias("__den"),
        )
        .select(
            key_col,
            (
                F.col("__num")
                / F.col("__den").cast("double")
                / F.lit(float(value_scale))
            ).alias("tw_avg"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """CUSUM changepoint detection over the daily event-count series
    (public: Page 1954, "Continuous inspection schemes", Biometrika —
    the classic sequential shift detector; here the retrospective
    whole-series form) — the level-SHIFT monitor beside dr1's PSI
    (distribution drift) and an1's residual outliers: did the event
    rate jump, and on which day?

    Page's recursion S_t = max(0, S_{t-1} + (x_t − μ)) is NOT a
    sequential dependence an engine must replay row-by-row: with
    deviations e_t and prefix sums P_t = Σ_{i≤t} e_i,

        S_t = P_t − min(0, min_{t'<t} P_{t'})        (upward shifts)
        S'_t = max(0, max_{t'<t} P_{t'}) − P_t       (downward shifts)

    so the whole statistic is TWO cumulative windows over the
    day-domain frame (prefix sum + running extremum) — the same
    histogram-first discipline as mwu1/ks1, never a corpus-sized
    window. To keep everything exact integers the deviations are
    scaled by the day count: e_t = N·x_t − T (T = total events), so
    every S is an exact BIGINT in N·events units and μ never becomes
    a double. The changepoint per direction is the argmax day with
    earliest-day tie-break (min over (−S, day) structs).

    Returns one row: n_days, total, s_up_max, cp_up, s_down_max,
    cp_down — S maxima in N·events units and their dates. A flat
    series pins both maxima to 0 (and the changepoint to the first
    day). Scale: one map-side-combined day rollup; all windows run on
    the ≤n_days frame.
    """
    days = (
        df.select(F.to_date(F.col(ts_col)).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        # day-domain-sized, referenced twice (totals + windows): the
        # lazy checkpoint keeps the corpus scan at ONE
        .localCheckpoint(eager=False)
    )
    return cusum_from_daily(days)


def cusum_from_daily(days: DataFrame) -> DataFrame:
    """cusum_changepoint's monitor over an already-built (day, x) daily
    count frame — split out so a STREAMING count maintainer (scs1:
    tumbling-window Structured Streaming aggregation) feeds the same
    exact windows; see cusum_changepoint for the algebra.

    Note the per-row s_up/s_down values are the UNCLAMPED prefix-sum
    identity (p_t minus the running extremum of strictly-previous
    prefix sums) and can go negative where Page's recursion clamps each
    step to 0; only the reported MAXIMA and their argmax days coincide
    with Page's S_t (provably — the last clamp before the max
    contributes 0). Do not expose per-row s_up/s_down as Page's
    statistic."""
    tot = days.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("x").cast("long").alias("t"),
    )
    e = days.crossJoin(F.broadcast(tot)).select(
        "day",
        "nd",
        "t",
        (F.col("nd") * F.col("x") - F.col("t")).cast("long").alias("e"),
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    p = e.select(
        "day",
        "nd",
        "t",
        F.sum("e").over(wcum).cast("long").alias("p"),
    )
    s = p.select(
        "day",
        "nd",
        "t",
        (
            F.col("p")
            - F.least(
                F.lit(0).cast("long"),
                F.coalesce(F.min("p").over(wprev), F.lit(0)).cast("long"),
            )
        ).alias("s_up"),
        (
            F.greatest(
                F.lit(0).cast("long"),
                F.coalesce(F.max("p").over(wprev), F.lit(0)).cast("long"),
            )
            - F.col("p")
        ).alias("s_down"),
    )
    # changepoint days surface as TIMESTAMP (midnight), the repo-wide
    # date-column convention: Spark DateType reaches pandas as object
    # dtype while DuckDB DATE arrives as datetime64 — a dtype-audit
    # mismatch even when every value agrees (round-11 dtype audit)
    return s.agg(
        F.first("nd").alias("n_days"),
        F.first("t").alias("total"),
        F.max("s_up").cast("long").alias("s_up_max"),
        F.min(
            F.struct((-F.col("s_up")).alias("ns"), F.col("day").alias("d"))
        )["d"]
        .cast("timestamp")
        .alias("cp_up"),
        F.max("s_down").cast("long").alias("s_down_max"),
        F.min(
            F.struct(
                (-F.col("s_down")).alias("ns"), F.col("day").alias("d")
            )
        )["d"]
        .cast("timestamp")
        .alias("cp_down"),
    )


def _daily_counts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """One map-side-combined day rollup behind a lazy-checkpoint
    barrier — the shared corpus→day-domain collapse every trend/shift
    monitor here starts from (cusum/Mann-Kendall/Theil-Sen)."""
    return (
        df.select(F.to_date(F.col(ts_col)).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )


def mann_kendall_trend(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Mann-Kendall monotone-trend test over the daily event-count
    series (public: Mann 1945, Kendall 1948; Hirsch et al. 1982 for the
    tie-corrected variance) — the nonparametric "is the rate drifting
    up or down at all?" companion to cusum's level-shift and lr1's
    parametric slope: no linearity or distribution assumption, pure
    sign algebra.

        S    = Σ_{i<j} sgn(x_j − x_i)                 (exact BIGINT)
        VarS = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18  (t = tie sizes)
        Z    = (S − sgn(S)) / √VarS                    (normal approx)

    Everything before Z is exact integers: S from the day-pair sign
    sum, the variance carried ×18 (``var18``) so the tie term never
    divides. Z is ONE double expression (exact ints → one sqrt/div);
    Z pins 0.0 when S = 0 or VarS = 0 (n < 2 or all-tied series).

    Scale shape: one corpus scan collapses to the day rollup
    (`_daily_counts` barrier); the pair sum is a day-domain self-join
    (≤ n_days² pairs — years of days is thousands of rows), the tie
    histogram a day-domain groupBy. Returns one row:
    (n_days, s, var18, z).
    """
    days = _daily_counts(df, ts_col)
    pairs = days.select(F.col("day").alias("d1"), F.col("x").alias("x1")).join(
        days.select(F.col("day").alias("d2"), F.col("x").alias("x2")),
        F.col("d1") < F.col("d2"),
    )
    s_agg = pairs.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("x2") > F.col("x1"), 1)
                .when(F.col("x2") < F.col("x1"), -1)
                .otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("s")
    )
    t = F.col("t")
    ties = days.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("t"))
    base = ties.agg(
        F.sum("t").cast("long").alias("n_days"),
        F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
        .cast("long")
        .alias("tie_term"),
    )
    n = F.col("n_days")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("long")
    zden = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    return (
        base.crossJoin(F.broadcast(s_agg))
        .select("n_days", "s", var18.alias("var18"))
        .select(
            "n_days",
            "s",
            "var18",
            F.when((F.col("s") == 0) | (F.col("var18") == 0), F.lit(0.0))
            .otherwise(
                (
                    F.col("s")
                    - F.when(F.col("s") > 0, 1).otherwise(-1)
                ).cast("double")
                / zden
            )
            .alias("z"),
        )
    )


def theil_sen_from_daily(days: DataFrame, q: int = 1_000_000_000) -> DataFrame:
    """Theil-Sen slope estimator over a (day, x) daily series (public:
    Theil 1950, Sen 1968) — the median of all pairwise slopes, the
    robust (29%-breakdown) companion to lr1's least-squares line.

    Slopes are quantized exactly: slope_q9 = (x_j − x_i)·1e9 trunc-div
    (days between) — `_floordiv_dec`'s signed truncation, matching
    DuckDB ``//`` — and the median is qq1's nearest-rank order
    statistic with NO division: the smallest slope whose cumulative
    count reaches ⌈m/2⌉ (2·cum ≥ m over the slope-domain cumulative
    histogram). Returns one row: (n_days, n_pairs, slope_q9) — NULL
    slope when fewer than two days.

    Scale shape: day-domain self-join (≤ n_days² pairs), slope-domain
    histogram + one bounded cumulative window. Never corpus-sized.
    """
    from pyspark.sql import Window

    from .classifier import _floordiv_dec

    days = days.localCheckpoint(eager=False)
    d38 = "decimal(38,0)"
    pairs = (
        days.select(F.col("day").alias("d1"), F.col("x").alias("x1"))
        .join(
            days.select(F.col("day").alias("d2"), F.col("x").alias("x2")),
            F.col("d1") < F.col("d2"),
        )
        .select(
            _floordiv_dec(
                (F.col("x2") - F.col("x1")).cast(d38) * F.lit(q).cast(d38),
                F.datediff(F.col("d2"), F.col("d1")).cast(d38),
            )
            .cast("long")
            .alias("slope_q9")
        )
    )
    hist = (
        pairs.groupBy("slope_q9")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    m = hist.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("m"))
    nd = days.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    wcum = Window.orderBy("slope_q9").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "slope_q9", F.sum("c").over(wcum).cast("long").alias("cum")
    )
    med = (
        cum.crossJoin(F.broadcast(m))
        .filter(2 * F.col("cum") >= F.col("m"))
        .agg(F.min("slope_q9").cast("long").alias("slope_q9"))
    )
    return (
        nd.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(med))
        .select(
            "n_days",
            F.col("m").alias("n_pairs"),
            "slope_q9",
        )
    )


def theil_sen_trend(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """`theil_sen_from_daily` over the raw event stream (one corpus
    scan via the `_daily_counts` barrier)."""
    return theil_sen_from_daily(_daily_counts(df, ts_col))


def ljung_box(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "rev_k",
    max_lag: int = 10,
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test over a daily series
    (public: Ljung & Box 1978) — the scalar verdict on acf1's
    autocorrelation diagnostic: are the first h autocorrelations
    JOINTLY consistent with white noise?

        Q = n(n+2) · Σ_{k=1..h} ρ̂_k² / (n−k)

    The series is centered through exact integers (acf1's device:
    y_t = n·x_t − S, so no float mean ever exists) and each ρ̂_k is ONE
    double division of exact decimal(38) sums. Summing h doubles is
    order-sensitive, so each lag term is quantized FIRST
    (t_k = ⌊ρ̂_k²/(n−k)·1e12 + 0.5⌋, an exact BIGINT ≤ 1e12/(n−h)) and
    Q reported from the order-free integer sum: q_sum_q12 = Σt_k,
    q_lb = n(n+2)·q_sum_q12/1e12 (n(n+2)·Σt_k fits int64 for any daily
    span below ~10⁵ years). Lags with n ≤ k contribute nothing; a
    constant series (den = 0) pins Q = 0. Returns one row:
    (n_days, h, q_sum_q12, q_lb).

    Scale shape: identical to acf1 — the lag equi-join runs on the
    bounded daily grid (~2400 rows at any corpus size), the 10-row lag
    frame broadcast.
    """
    d38 = "decimal(38,0)"
    ser = series.select(
        F.col(t_col).alias("t"), F.col(v_col).alias("v")
    )
    tot = ser.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("v"), F.lit(0)).alias("s"),
    )
    y = ser.crossJoin(F.broadcast(tot)).select(
        "t",
        "n",
        (F.col("n") * F.col("v") - F.col("s")).cast(d38).alias("y"),
    )
    den = y.agg(
        F.coalesce(F.sum(F.col("y") * F.col("y")), F.lit(0).cast(d38)).alias(
            "den"
        )
    )
    spark = series.sparkSession
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    lagged = y.select(F.col("t").alias("t2"), F.col("y").alias("y2"))
    num = (
        y.crossJoin(F.broadcast(lags))
        .join(lagged, F.col("t") + F.col("lag") == F.col("t2"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("y") * F.col("y2")).alias("num"),
            F.max("n").alias("n"),
        )
    )
    terms = (
        num.crossJoin(F.broadcast(den))
        .filter(F.col("n") > F.col("lag"))
        .select(
            "n",
            F.when(F.col("den") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    (
                        F.col("num").cast("double")
                        / F.col("den").cast("double")
                    )
                    * (
                        F.col("num").cast("double")
                        / F.col("den").cast("double")
                    )
                    / (F.col("n") - F.col("lag")).cast("double")
                    * F.lit(1e12)
                    + F.lit(0.5)
                ).cast("long")
            )
            .alias("tq12"),
        )
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_days"),
        F.lit(max_lag).cast("int").alias("h"),
        F.coalesce(F.sum("tq12"), F.lit(0)).cast("long").alias("q_sum_q12"),
    ).select(
        "n_days",
        "h",
        "q_sum_q12",
        (
            F.col("n_days").cast("double")
            * (F.col("n_days").cast("double") + F.lit(2.0))
            * F.col("q_sum_q12").cast("double")
            / F.lit(1e12)
        ).alias("q_lb"),
    )


def durbin_watson(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "rev_k",
) -> DataFrame:
    """Durbin–Watson first-order serial-correlation statistic over a
    daily series (public: Durbin & Watson 1950) — the lag-1 companion
    to lb1's joint whiteness verdict: DW ≈ 2(1−ρ̂₁), flagging positive
    (DW → 0) or negative (DW → 4) day-to-day dependence.

        DW = Σ_{t≥1}(e_t − e_{t−1})² / Σ e_t²,   e_t = x_t − x̄

    The mean CANCELS in the numerator differences, so the numerator is
    the exact integer Σ(x_t − x_{t−1})²; the denominator uses acf1's
    integer centering (Σe² = (n·Q − S²)/n), giving the fully exact
    rational DW = n·Σdiff² / (n·Q − S²) — quantized by ONE
    remainder-trick division to dw_q9 (both operands exact decimal(38);
    headroom to ~10¹² days with 1e6-scaled values). A constant series
    (zero denominator) or n < 2 pins dw_q9 = 0. Returns one row:
    (n_days, diff2, dw_q9).

    Scale shape: the lag-1 equi-join and both rollups run on the
    bounded daily grid (~thousands of rows at any corpus size); the
    corpus contact is the upstream daily rollup.
    """
    d38 = "decimal(38,0)"
    s = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(v_col).cast("long").alias("x"),
    ).localCheckpoint(eager=False)
    tot = s.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.coalesce(F.sum(F.col("x").cast(d38)), F.lit(0).cast(d38)).alias(
            "s"
        ),
        F.coalesce(
            F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)),
            F.lit(0).cast(d38),
        ).alias("q"),
    )
    lag = s.select(F.col("t").alias("t2"), F.col("x").alias("xp"))
    diff = (
        s.join(F.broadcast(lag), s["t"] == F.col("t2") + 1)
        .select(
            (F.col("x").cast(d38) - F.col("xp").cast(d38)).alias("d")
        )
        .agg(
            F.coalesce(F.sum(F.col("d") * F.col("d")), F.lit(0).cast(d38))
            .alias("diff2")
        )
    )
    n = F.col("n")
    den = n * F.col("q") - F.col("s") * F.col("s")
    k9 = F.lit(1_000_000_000).cast(d38)
    q_ = F.col("diff2") * n
    return tot.crossJoin(F.broadcast(diff)).select(
        n.cast("long").alias("n_days"),
        F.col("diff2").cast("long").alias("diff2"),
        F.when((den == 0) | (n < 2), F.lit(0).cast("long"))
        .otherwise(
            (
                ((q_ - q_ % den) / den).cast(d38) * k9
                + (((q_ % den) * k9 - ((q_ % den) * k9) % den) / den).cast(
                    d38
                )
            ).cast("long")
        )
        .alias("dw_q9"),
    )


def runs_test(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "rev_k",
) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of a daily series about
    its median (public: Wald & Wolfowitz 1940) — the non-parametric
    companion to dw1: too FEW runs of above/below-median days means
    positive persistence, too many means oscillation, judged without
    any distributional assumption.

    The reference level is the lower nearest-rank median (order
    statistic ⌈n/2⌉ — ts2's device, one value-domain sort on the
    bounded day grid); days equal to the median are EXCLUDED (the
    standard convention). Over the m = n₁ + n₂ surviving days in time
    order, R = 1 + #sign changes, and with the exact null moments

        μ = 2n₁n₂/m + 1
        σ² = 2n₁n₂(2n₁n₂ − m) / (m²(m−1))
        z = (R − μ)/σ

    z_q6 is ONE double expression from exact decimal(38) integers,
    pinned 0 when σ² = 0 (all days on one side, or m < 2). Returns one
    row: (n_days, n_above, n_below, runs, z_q6).

    Scale shape: every step — median rank, sign sequence, lag window —
    runs on the bounded daily grid; the single-partition window is over
    ~thousands of rows by construction (the documented day-domain
    exception), and the corpus contact is the upstream daily rollup.
    """
    d38 = "decimal(38,0)"
    s = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(v_col).cast("long").alias("x"),
    ).localCheckpoint(eager=False)
    n_tot = s.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    rk = Window.orderBy("x", "t")
    med = (
        s.select("x", F.row_number().over(rk).alias("__r"))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("__r") == F.expr("(n_days + 1) div 2"))
        .select(F.col("x").alias("med"))
    )
    signed = (
        s.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("med"))
        .select(
            "t", (F.col("x") > F.col("med")).cast("int").alias("sgn")
        )
    )
    seq = Window.orderBy("t")
    runs = signed.select(
        "sgn",
        F.when(
            F.lag("sgn").over(seq).isNull()
            | (F.lag("sgn").over(seq) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("__new_run"),
    ).agg(
        F.coalesce(F.sum(F.col("sgn").cast("long")), F.lit(0)).alias(
            "n_above"
        ),
        F.coalesce(
            F.sum(F.lit(1) - F.col("sgn").cast("long")), F.lit(0)
        ).alias("n_below"),
        F.coalesce(F.sum("__new_run"), F.lit(0)).cast("long").alias("runs"),
    )
    n1 = F.col("n_above").cast(d38)
    n2 = F.col("n_below").cast(d38)
    m = n1 + n2
    two_nn = 2 * n1 * n2
    var_num = two_nn * (two_nn - m)
    var_den = m * m * (m - 1)
    return n_tot.crossJoin(F.broadcast(runs)).select(
        "n_days",
        F.col("n_above").cast("long").alias("n_above"),
        F.col("n_below").cast("long").alias("n_below"),
        "runs",
        F.when((m < 2) | (var_num <= 0), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (
                    F.col("runs").cast("double")
                    - (
                        two_nn.cast("double") / m.cast("double")
                        + F.lit(1.0)
                    )
                )
                / F.sqrt(var_num.cast("double") / var_den.cast("double"))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("z_q6"),
    )


def wilcoxon_signed_rank(
    series: DataFrame,
    t_col: str = "t",
    v_col: str = "rev_k",
    lag: int = 7,
) -> DataFrame:
    """Wilcoxon signed-rank test of the lag-``lag`` paired differences
    of a daily series (public: Wilcoxon 1945) — the paired companion
    to mwu1's independent-samples test: is this week's level shifted
    vs the same weekday last week, judged on signed ranks of
    d_t = x_t − x_{t−lag}?

    Zero differences are EXCLUDED (the standard convention). Over the
    |d| histogram (day-domain-sized) the average ranks use mwu1's
    DOUBLED-rank device so ties stay exact integers:
    r2(v) = 2·cum(<v) + c(v) + 1, and

        W2⁺   = Σ_{d>0} r2(|d|)                 (= 2·W⁺, exact)
        E[W2⁺] = m(m+1)/2
        12·Var(W2⁺) = 2m(m+1)(2m+1) − Σ(t³−t)   (tie-corrected, exact)

    z_q6 is ONE double expression from exact decimal(38) integers,
    pinned 0 when the variance is 0 (m = 0: every paired difference
    was zero). Returns one row: (n_pairs, n_zero, w2_plus, z_q6).

    Scale shape: the lag join and every rollup run on the bounded
    daily grid; the corpus contact is the upstream daily rollup.
    """
    d38 = "decimal(38,0)"
    from pyspark.sql import Window

    s = series.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(v_col).cast("long").alias("x"),
    ).localCheckpoint(eager=False)
    lagged = s.select(F.col("t").alias("t2"), F.col("x").alias("xp"))
    diffs = s.join(
        F.broadcast(lagged), s["t"] == F.col("t2") + lag
    ).select((F.col("x") - F.col("xp")).alias("d"))
    nz = diffs.agg(
        F.coalesce(
            F.sum(F.when(F.col("d") == 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_zero")
    )
    hist = (
        diffs.filter(F.col("d") != 0)
        .select(
            F.abs(F.col("d")).alias("av"),
            (F.col("d") > 0).cast("int").alias("pos"),
        )
        .groupBy("av")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("cpos"),
        )
    )
    w_cum = (
        Window.orderBy("av").rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.select(
        "av",
        "c",
        "cpos",
        (2 * F.coalesce(F.sum("c").over(w_cum), F.lit(0)) + F.col("c") + 1)
        .alias("r2"),
    )
    agg = ranked.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast(d38).alias("m"),
        F.coalesce(
            F.sum(F.col("cpos").cast(d38) * F.col("r2").cast(d38)),
            F.lit(0).cast(d38),
        ).alias("w2p"),
        F.coalesce(
            F.sum(
                F.col("c").cast(d38) * F.col("c").cast(d38)
                * F.col("c").cast(d38)
                - F.col("c").cast(d38)
            ),
            F.lit(0).cast(d38),
        ).alias("ties"),
    )
    m = F.col("m")
    var12 = 2 * m * (m + 1) * (2 * m + 1) - F.col("ties")
    return agg.crossJoin(F.broadcast(nz)).select(
        m.cast("long").alias("n_pairs"),
        "n_zero",
        F.col("w2p").cast("long").alias("w2_plus"),
        F.when(var12 <= 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (F.col("w2p") - m * (m + 1) / 2).cast("double")
                / F.sqrt(var12.cast("double") / F.lit(12.0))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("z_q6"),
    )
