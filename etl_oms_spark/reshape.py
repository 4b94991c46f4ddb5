"""Reshape operators: melt (unpivot) and pivot — SURVEY §2.7 R1/R2.

The reference's signature operators:
- R1 melt wide→long (ETL_OMS.py:76-84): 6 indicator columns →
  ``(indicator, value)`` rows, NULL values dropped.
- R2 pivot long→wide (ETL_OMS_V2.py:25-36): ``aggfunc="first"`` + fillna(0).

Spark-first: native ``DataFrame.unpivot`` (codegen'd Expand node — one scan,
no shuffle) and ``groupBy().pivot()`` with *explicit* pivot values so Spark
skips the extra distinct-scan and the output schema is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import INDICATOR_UNITS, MEASURE_COLUMNS
from .transform import map_lookup


def melt(
    df: DataFrame,
    ids: list[str],
    values: list[str] | None = None,
    var_name: str = "indicator",
    value_name: str = "value",
    drop_null_values: bool = True,
) -> DataFrame:
    """Wide→long unpivot (R1).

    ``unpivot`` lowers to an Expand node: each input row emits one output row
    per value column in a single pass — no shuffle, no UDF, scales linearly.
    Value columns are cast to a common double type (pandas melt coerces the
    same way).
    """
    values = values or [c for c in MEASURE_COLUMNS if c in df.columns]
    casted = df.withColumns({c: F.col(c).cast("double") for c in values})
    out = casted.unpivot(ids, values, var_name, value_name)
    if drop_null_values:
        out = out.na.drop(subset=[value_name])
    return out


def melt_with_units(
    df: DataFrame,
    ids: list[str],
    values: list[str] | None = None,
) -> DataFrame:
    """R1 + the indicator→unit annotation (F7, ETL_OMS.py:83)."""
    out = melt(df, ids, values)
    return out.withColumn("unit", map_lookup("indicator", INDICATOR_UNITS))


def pivot_wide(
    df: DataFrame,
    index: list[str],
    pivot_col: str = "indicator",
    value_col: str = "value",
    pivot_values: list[str] | None = None,
    fill_value: float | None = 0.0,
    aggfunc: str = "first",
) -> DataFrame:
    """Long→wide pivot (R2, ETL_OMS_V2.py:25-36).

    ``aggfunc="first"`` parity via ``first(value, ignorenulls=True)``
    (pandas default); ``aggfunc="max"`` for order-independent determinism
    when duplicate index keys exist. Pass ``pivot_values`` explicitly
    (defaults to the canonical indicator list) — at 100 TB an implicit pivot
    would add a full distinct-scan of the pivot column and a
    nondeterministic column order.

    Lowered to conditional aggregation (one ``max/first(CASE WHEN pivot=v
    THEN value END)`` per pivot value) instead of ``groupBy().pivot()`` —
    identical semantics, one plain HashAggregate, ~3× faster than the
    pivot operator's internal PivotFirst path at sf0.1.
    """
    pivot_values = pivot_values or list(INDICATOR_UNITS)

    def agg_for(v: str):
        conditional = F.when(F.col(pivot_col) == v, F.col(value_col))
        out_col = (
            F.max(conditional)
            if aggfunc == "max"
            else F.first(conditional, ignorenulls=True)
        )
        if fill_value is not None:
            out_col = F.coalesce(out_col, F.lit(fill_value))
        return out_col.alias(v)

    return df.groupBy(*index).agg(*[agg_for(v) for v in pivot_values])
