"""Physical-layout operators: space-filling-curve sort keys and
small-file compaction planning.

Neither exists in the reference (EliasGhennam/ETL_OMS writes single CSV
files — `ETL_OMS_OPERATIONNEL.py` output stage); both are table-stakes for
a 100 TB lake: z-ordering makes parquet min/max row-group stats selective
on BOTH of two query columns at once (multi-dimensional data skipping),
and compaction planning turns millions of small files into
target-sized ones without a global sort.

Everything here is pure column algebra (bit math, window cumsum over a
range-partitioned key) — no UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton (z-order) code of two non-negative ints: interleave the low
    ``bits`` bits of ``x`` (even positions) and ``y`` (odd positions).

    Built as an OR-of-shifts expression — 2·bits JVM-side bit ops, fully
    inside whole-stage codegen. Values are masked to ``bits`` first, so
    out-of-range inputs wrap instead of colliding arbitrarily. bits ≤ 31
    keeps the result < 2^62 (ANSI-safe).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    xm = xc.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = yc.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(xm, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(ym, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return out


def morton_decode(code: Column | str, bits: int = 16) -> tuple[Column, Column]:
    """Inverse of :func:`morton_interleave`: recover (x, y) from a z-order
    code — de-interleave even bits into x, odd bits into y. Used for
    debugging layouts and for deriving curve-segment bounding boxes
    without carrying the original columns."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    c = F.col(code) if isinstance(code, str) else code
    c = c.cast("long")
    x = F.lit(0).cast("long")
    y = F.lit(0).cast("long")
    for i in range(bits):
        x = x.bitwiseOR(F.shiftleft(F.shiftright(c, 2 * i).bitwiseAND(F.lit(1)), i))
        y = y.bitwiseOR(
            F.shiftleft(F.shiftright(c, 2 * i + 1).bitwiseAND(F.lit(1)), i)
        )
    return x, y


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`morton_interleave` (same OR-of-shifts form),
    for DuckDB oracles and for engines without a zorder expression."""
    mask = (1 << bits) - 1
    xm = f"(CAST({x} AS BIGINT) & {mask})"
    ym = f"(CAST({y} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_by(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Rewrite ``df`` into z-order layout on (``x``, ``y``): range-partition
    by the morton code, sort within partitions by it, drop the key.

    Written to parquet afterwards, every file's (x, y) bounding box is a
    compact curve segment, so min/max row-group stats prune scans filtered
    on EITHER column — the effect `OPTIMIZE ... ZORDER BY` gives Delta
    tables, from two plain exchanges. The range exchange samples the key,
    so skewed key distributions still yield balanced output files.
    """
    key = morton_interleave(x, y, bits)
    tmp = df.withColumn("__zkey", key)
    ranged = (
        tmp.repartitionByRange(n_partitions, "__zkey")
        if n_partitions
        else tmp.repartitionByRange("__zkey")
    )
    return ranged.sortWithinPartitions("__zkey").drop("__zkey")


def compaction_plan(
    sizes: DataFrame,
    size_col: str,
    order_cols: list[str],
    target_bytes: int,
    file_col: str = "out_file",
) -> DataFrame:
    """Assign each input unit (a file, a partition, a day...) to an output
    file id so consecutive units (in ``order_cols`` order) pack into
    ~``target_bytes`` outputs: ``out_file = floor(exclusive_cumsum(size) /
    target)``.

    The cumulative sum uses the distributed two-phase pattern
    (``util.with_global_index``): range-partition on the order key, local
    cumsum, broadcast per-partition offsets — NO single-partition global
    window, so planning a million-file manifest is itself parallel.
    Oversized units (> target) get a file of their own; order is
    preserved, so compaction never interleaves units and a time-ordered
    table stays time-ordered after rewrite.
    """
    from pyspark.sql import Window

    ranged = sizes.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    totals = ranged.groupBy("__pid").agg(F.sum(size_col).alias("__pt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__pt").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = Window.partitionBy("__pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, -1)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__before",
            F.coalesce(F.sum(size_col).over(w_local), F.lit(0)) + F.col("__off"),
        )
        .withColumn(
            file_col, F.floor(F.col("__before") / F.lit(target_bytes)).cast("long")
        )
        .drop("__pid", "__off", "__before")
    )
