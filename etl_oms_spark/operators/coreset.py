"""Coreset selection: greedy k-center (farthest-point traversal) over an
embedding column — the diversity-selection step of a training-data
pipeline ("pick k maximally-spread exemplars", Gonzalez 1985's 2-approx
for the k-center objective; also the seeding rule of k-means++ without
the randomization).

The reference (EliasGhennam/ETL_OMS) has no embedding operators at all;
this extends the engine's LLM-curation surface (SemDeDup `clustering.py`,
ANN `similarity.py`) with the selection primitive both of those feed.

Scale posture (100 TB): greedy k-center is inherently k-pass, but each
pass is a single map (min over ≤k broadcast-literal centers, pure column
algebra in whole-stage codegen) + a top-1 TakeOrdered reduce — no
pairwise joins, no shuffle of the corpus, O(n·k·d) total work. The
chosen-center state is k vectors on the driver (a few KB). For corpora
where k full scans are too dear, run it on a deterministic uniform
sample first (sh1's hash-order sampling) — the standard
coreset-of-a-coreset composition; the algorithm itself is unchanged.

Determinism contract (shared with the DuckDB oracle, `KCS1_SQL`):
vectors enter the shared shifted-integer domain
(``round(x·1e6) + 1e6`` per coordinate, similarity.QUANT / e11's
policy), all distances are exact BIGINT squared-L2, the first center is
the lowest id, and each round's farthest point breaks ties by lowest id
— bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: shared shifted-integer quantization (matches e11/pc2's oracle domain:
#: CAST(round(x*1e6) AS BIGINT) + 1e6 keeps coordinates non-negative so
#: integer subtraction/squares are exact and HUGEINT-free up to d=64).
_SHIFT = 1_000_000


def _quant_shift(vec: Column) -> Column:
    return F.transform(
        vec,
        lambda x: (F.round(x.cast("double") * _SHIFT)).cast("long")
        + F.lit(_SHIFT),
    )


def _dist2_sql(qv_name: str, center: list[int]) -> str:
    """Exact BIGINT squared-L2 between the quantized vector column named
    ``qv_name`` and one driver-held center, as ONE SQL string (the
    `_argmin_struct` pattern: the Column-API form paid d F.lit() py4j
    round-trips per center — ~0.45 s/round of pure driver latency by
    round 8 at d=64; parsing a 1 KB SQL string JVM-side is
    milliseconds). Centers ship as array literals — k·d longs total
    across all rounds, broadcast-free."""
    arr = ",".join(f"{int(c)}L" for c in center)
    return (
        f"aggregate(zip_with({qv_name}, array({arr}), "
        "(a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    )


def kcenter_greedy(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center selection: returns k rows
    ``(round, vec_id, radius_d2)`` where round r's point is the corpus
    element farthest (max-min exact quantized squared-L2) from centers
    1..r-1, ties by lowest id; ``radius_d2`` is that min-distance — the
    non-increasing covering-radius sequence, the coreset quality
    diagnostic (round 1 = lowest id, radius 0).

    Each round is one distributed scan (min over the ≤k chosen centers as
    literal arrays, inside codegen) + a 1-row TakeOrdered — no caching
    required, no corpus shuffle; see module docstring for the 100 TB
    posture.

    k > n tail: once every corpus point is a center, the max-min
    distance is 0 and the argmax returns an already-chosen point (the
    lowest id, by the tie order), so the result contains duplicate
    ``vec_id`` rows at ``radius_d2 = 0`` from round n+1 on — the caller
    asking for more centers than points gets the honest "radius is
    already zero" sequence rather than an early stop (and the DuckDB
    oracle replays exactly that).
    """
    spark = df.sparkSession
    q = df.select(
        F.col(id_col).cast("long").alias("vid"),
        _quant_shift(F.col(vec_col)).alias("qv"),
    )
    # every round re-scans the corpus: persist the quantized frame once
    # so k-center pays one parquet scan + quantize, not k of them
    # (kmeans_fit's pattern; MEMORY_AND_DISK spill-safe default, freed
    # before returning)
    q = q.persist()
    first = q.orderBy("vid").limit(1).collect()[0]
    chosen: list[tuple[int, int, int]] = [(1, int(first["vid"]), 0)]
    centers: list[list[int]] = [list(first["qv"])]
    for rnd in range(2, k + 1):
        dists = [_dist2_sql("qv", c) for c in centers]
        mind = F.expr(
            dists[0] if len(dists) == 1 else f"least({','.join(dists)})"
        )
        far = (
            q.select("vid", "qv", mind.alias("d"))
            .orderBy(F.desc("d"), "vid")
            .limit(1)
            .collect()
        )
        if not far:
            break
        row = far[0]
        chosen.append((rnd, int(row["vid"]), int(row["d"])))
        centers.append(list(row["qv"]))
    q.unpersist()
    from etl_oms_spark.util import local_rows

    return local_rows(
        spark, chosen, "round long, vec_id long, radius_d2 long"
    ).orderBy("round")
