"""Stream-stream joins: watermarked interval join for click→purchase
attribution.

Structured Streaming's stream-stream join keeps both sides in the state
store and emits matches as rows arrive; the event-time range condition +
watermarks bound that state (rows outside the join window are evicted,
late rows beyond the watermark are dropped) — without them an inner
stream-stream join buffers both streams forever. The generic forward-window operator
(view → later click, configurable key/window/outer-ness) lives in
`streaming.events.join_streams`; this module is its contract-exact
BACKWARD-window sibling — purchases looking back at preceding clicks at
whole-second resolution — built so the streaming run is bit-equal to the
batch interval join: the same function applied to batch DataFrames
(``withWatermark`` is a no-op in batch) is its exact twin, which is what
the sj1 contract query's oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_pairs(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "90 minutes",
) -> DataFrame:
    """All (purchase, preceding click) pairs per user within
    ``gap_seconds``: purchases inner-join clicks of the same user whose
    click time falls in ``[purchase_ts - gap, purchase_ts]`` at
    whole-second resolution (`unix_timestamp` floors — deterministic and
    portable across engines regardless of sub-second timestamp noise).

    Streaming mechanics: both sides are watermarked and the join carries
    a raw event-time range condition one second WIDER than the semantic
    window — Spark derives state-eviction bounds from that raw-timestamp
    condition (it cannot see through ``unix_timestamp``), while the
    second-floor predicate keeps the emitted pairs exactly equal to the
    batch twin. State held per key is therefore O(events within
    gap + watermark), not O(stream).

    Works identically on batch DataFrames (watermark is a no-op there):
    ``click_purchase_pairs(batch_events)`` IS the exact oracle of the
    streaming run.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    coarse = (
        (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {gap_seconds + 1} SECONDS"))
        & (F.col("click_ts") <= F.col("purchase_ts") + F.expr("INTERVAL 1 SECONDS"))
    )
    second_diff = F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
    exact = (second_diff >= 0) & (second_diff <= gap_seconds)
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user")) & coarse & exact,
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )
