"""Dataset card: the one-frame corpus summary a training-data team
publishes next to a release — volume, token budget, language mix,
duplication health, per source.

Pure composition of existing exact operators (counts, whitespace token
sums, duplicate-block rate), emitted in long format (metric, source,
value) so downstream dashboards pivot it however they like. Every metric
is exact-integer derived, so the whole card is oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_oms_spark.operators.dedup import dup_block_rate
from etl_oms_spark.operators.text import whitespace_token_count


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """(metric, source, value) rows: docs, tokens, avg_tokens,
    distinct_langs (when a ``lang`` column exists), dup_block_rate.
    One corpus scan for the count/token aggregate, one block pass for the
    dup rate; both group-cardinality outputs."""
    base_aggs = [
        F.count(F.lit(1)).cast("double").alias("docs"),
        F.sum(whitespace_token_count(text_col)).cast("double").alias("tokens"),
    ]
    if "lang" in df.columns:
        base_aggs.append(
            F.countDistinct("lang").cast("double").alias("distinct_langs")
        )
    # lazy barrier: base feeds one projection per metric plus avg — each
    # re-ran the corpus token-count aggregate without it. Group-sized.
    base = df.groupBy(group_col).agg(*base_aggs).localCheckpoint(eager=False)
    melted = None
    metrics = ["docs", "tokens"] + (
        ["distinct_langs"] if "lang" in df.columns else []
    )
    for metric in metrics:
        part = base.select(
            F.lit(metric).alias("metric"),
            F.col(group_col).alias("source"),
            F.col(metric).alias("value"),
        )
        melted = part if melted is None else melted.unionAll(part)
    avg = base.select(
        F.lit("avg_tokens").alias("metric"),
        F.col(group_col).alias("source"),
        (F.col("tokens") / F.col("docs")).alias("value"),
    )
    dup = dup_block_rate(df, text_col, id_col, group_col).select(
        F.lit("dup_block_rate").alias("metric"),
        F.col(group_col).alias("source"),
        F.col("dup_rate").alias("value"),
    )
    return melted.unionAll(avg).unionAll(dup)
