"""Distributed embedding linear algebra: exact second-moment / covariance.

The covariance (or Gram) matrix of an embedding corpus is the workhorse
behind PCA whitening, spectral diagnostics, and feature-redundancy checks
on training data. The naive Spark lowering — posexplode each vector twice
and self-join on the row id — shuffles n·d² rows: at n = 1e8, d = 64 that
is 4·10¹¹ rows, dead on arrival.

The scale lowering here is **partition-local partial aggregation via
``mapInPandas``**: each partition stacks its vectors into an int64 matrix
(quantized ``round(x·scale)`` — exact integer arithmetic, the repo-wide
determinism policy) and emits ONE d×d partial product ``QᵀQ`` plus the
per-dimension component sums. The shuffle then carries d·(d+1)/2 + d rows
PER PARTITION, independent of n — the classic combiner pattern, with the
O(n·d²) multiply-add work done by numpy inside Arrow batches instead of
row-at-a-time JVM expression evaluation.

Integer matmul is exact and order-independent (int64 add/mul are
associative/commutative and overflow-checked by bounds below), so results
are bit-identical on any partitioning — and a DuckDB oracle recomputing
the same integer sums matches exactly.

Overflow bounds: |q| ≤ scale (unit-ish embeddings), so a partial product
entry ≤ rows_per_partition · scale²; with scale = 1000 and ≤ 2^43 rows per
partition the entry stays under 2^63. Global sums hold to n ≤ 9·10¹² rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def second_moment_sums(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(i, j, s2) for i ≤ j: exact Σ q_i·q_j over all vectors, where
    ``q = round(x·scale)`` — the upper triangle of the quantized Gram
    matrix, d·(d+1)/2 rows."""
    import pandas as pd

    schema = "i INT, j INT, s2 LONG"

    def partial(batches):
        import numpy as np

        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype("float64") * scale
            # round HALF AWAY FROM ZERO — np.rint is half-to-even, which
            # silently diverges from Spark's F.round / DuckDB round() on
            # exact-.5 products (first observed at sf0.1: a float32 value
            # whose x*1000 is exactly representable as n+0.5)
            mat = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
            g = mat.T @ mat  # exact int64 partial Gram
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = [], []
        for i in range(d):
            for j in range(i, d):
                iu.append(i)
                ju.append(j)
        yield pd.DataFrame(
            {"i": iu, "j": ju, "s2": [int(acc[i, j]) for i, j in zip(iu, ju)]}
        )

    partials = df.select(vec_col).mapInPandas(partial, schema)
    return partials.groupBy("i", "j").agg(F.sum("s2").alias("s2"))


def component_sums(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(i, s1, n): exact per-dimension Σ q_i and the vector count — the
    first-moment side of the covariance, d rows. Pure posexplode + agg
    (d rows per vector through a map-side-combined shuffle)."""
    comps = df.select(
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long"),
            )
        ).alias("i", "q")
    )
    n = df.count()
    return comps.groupBy("i").agg(
        F.sum("q").alias("s1"), F.lit(n).cast("long").alias("n")
    )


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(i, j, cov) for i ≤ j: covariance of quantized components,
    ``cov = S2/n − (S1_i/n)·(S1_j/n)`` — three IEEE ops on exact integer
    sums, so any engine recomputing the same integers gets the identical
    double. Output is d·(d+1)/2 rows (the symmetric lower half is implied).
    """
    s2 = second_moment_sums(df, vec_col, scale)
    s1 = component_sums(df, vec_col, scale)
    a = s1.select(F.col("i").alias("__i"), F.col("s1").alias("s1_i"), "n")
    b = s1.select(F.col("i").alias("__j"), F.col("s1").alias("s1_j"))
    return (
        s2.join(F.broadcast(a), s2["i"] == a["__i"])
        .join(F.broadcast(b), s2["j"] == b["__j"])
        .select(
            "i",
            "j",
            (
                F.col("s2").cast("double") / F.col("n").cast("double")
                - (F.col("s1_i").cast("double") / F.col("n").cast("double"))
                * (F.col("s1_j").cast("double") / F.col("n").cast("double"))
            ).alias("cov"),
        )
    )


def principal_components(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 2,
    scale: int = 1000,
) -> "list[list[float]]":
    """Top eigenvectors of the corpus covariance — the PCA basis.

    The heavy pass is :func:`covariance_matrix` (distributed, exact,
    partition-local partials); the eigendecomposition itself runs on the
    driver over the d×d matrix — d·(d+1)/2 values (2 080 doubles at
    d = 64), a k/dim-bounded collect consistent with the repo's
    centroid/threshold patterns, nowhere near row-bounded. numpy ``eigh``
    on the symmetric matrix, components ordered by descending eigenvalue,
    sign-normalized (largest-|component| entry made positive) so the basis
    is deterministic.
    """
    import numpy as np

    rows = covariance_matrix(df, vec_col, scale).collect()
    d = max(r["j"] for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    comps = []
    for idx in np.argsort(vals)[::-1][:n_components]:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps


def project_onto(
    df: DataFrame,
    components: "list[list[float]]",
    vec_col: str = "embedding",
    prefix: str = "pc",
) -> DataFrame:
    """Project each vector onto the given basis: one ``aggregate`` fold
    per component over a zip of the vector with a broadcast array literal
    — pure column algebra, no shuffle, no UDF; the projection streams
    through the scan. Adds ``{prefix}1..{prefix}k`` double columns."""
    from ..util import _sql_literal

    out = df
    for ci, comp in enumerate(components, start=1):
        # ONE parsed SQL array literal per component, not dim F.lit py4j
        # round trips (round-13; the util.local_rows lesson)
        lit_arr = F.expr(_sql_literal([float(x) for x in comp]))
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), lit_arr, lambda a, b: a.cast("double") * b
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{prefix}{ci}", dot)
    return out


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """PCA-project the corpus onto its own top components: covariance →
    driver eigh → broadcast basis → streaming dot products. Two passes
    over the data (one bounded-shuffle covariance pass, one scan), O(d²)
    driver state."""
    comps = principal_components(df, vec_col, n_components, scale)
    return project_onto(df, comps, vec_col)


def power_pca_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
    iters: int = 24,
    v_scale: int = 10**6,
    n_components: int = 2,
) -> "list[list[int]]":
    """PCA directions by INTEGER power iteration — the exact-oracle
    portable twin of :func:`principal_components` (whose numpy ``eigh``
    is not reproducible in SQL).

    The iterated matrix is the integer-scaled covariance
    ``M = n·S2 − S1·S1ᵀ`` (= n² × covariance, built from the exact
    integer moments — no doubles anywhere). Each round: big-int matvec
    ``w = M·v``, then a deterministic rescale
    ``v_i ← sign(w_i)·(|w_i|·v_scale DIV max|w|)`` (abs before DIV keeps
    every division in the non-negative domain where Python, Spark and
    DuckDB agree), then — for trailing components — deflation against
    each previously found direction with the same sign/abs/DIV rule.
    Starts are fixed (+v_scale everywhere; alternating ±v_scale for the
    second component, deflated before iterating).

    The output is defined as "the integer vector after ``iters`` fixed
    rounds", so engine/oracle equality holds REGARDLESS of spectrum or
    convergence — both sides replay the identical integer sequence
    (DuckDB in HUGEINT; magnitudes stay < 1e25 at these scales).
    Convergence to the true eigenbasis is a separate, softer property
    (pytest checks |cos| vs numpy eigh > 0.99 on the test corpus).

    Driver state: the d×d integer matrix plus d-vectors — the same
    dim-bounded budget as :func:`principal_components`.
    """
    s2_rows = second_moment_sums(df, vec_col, scale).collect()
    s1_rows = component_sums(df, vec_col, scale).collect()
    if not s1_rows:
        raise ValueError("power_pca_quantized: empty input (no embeddings)")
    d = max(r["i"] for r in s1_rows) + 1
    s1 = [0] * d
    # every s1 row carries the same global df.count() by construction
    # (component_sums stamps F.lit(n)); assert it so a future ragged-
    # embedding regression fails loudly instead of skewing M silently
    ns = {int(r["n"]) for r in s1_rows}
    if len(ns) != 1:
        raise ValueError(f"component_sums produced inconsistent n: {ns}")
    n = ns.pop()
    for r in s1_rows:
        s1[r["i"]] = int(r["s1"])
    m = [[0] * d for _ in range(d)]
    for r in s2_rows:
        i, j = r["i"], r["j"]
        v = n * int(r["s2"]) - s1[i] * s1[j]
        m[i][j] = v
        m[j][i] = v

    def _scaled_div(num: int, den: int) -> int:
        # sign(num) * (|num| * v_scale DIV den): non-negative DIV only
        q = (abs(num) * v_scale) // den
        return -q if num < 0 else q

    def _deflate(vec: "list[int]", basis: "list[list[int]]") -> "list[int]":
        for b in basis:
            proj = sum(x * y for x, y in zip(vec, b))
            nb = sum(y * y for y in b)
            if nb == 0:
                continue
            out = []
            for x, y in zip(vec, b):
                t = proj * y
                q = abs(t) // nb
                out.append(x - (-q if t < 0 else q))
            vec = out
        return vec

    comps: "list[list[int]]" = []
    for c in range(n_components):
        v = [v_scale if (c == 0 or i % 2 == 0) else -v_scale for i in range(d)]
        v = _deflate(v, comps)
        for _ in range(iters):
            w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
            # GREATEST(mx, 1), exactly as the SQL oracle — a zero matvec
            # must zero the vector on BOTH engines, not break early
            mx = max(abs(x) for x in w) or 1
            v = [_scaled_div(x, mx) for x in w]
            v = _deflate(v, comps)
        comps.append(v)
    return comps


def project_integer(
    df: DataFrame,
    components: "list[list[int]]",
    vec_col: str = "embedding",
    scale: int = 1000,
    prefix: str = "p",
) -> DataFrame:
    """Exact-integer projection onto integer directions: per component
    one ``aggregate`` fold of ``q_i·v_i`` (q = round(x·scale) BIGINT) —
    products ≤ ~1e9 per term at the default scales, far inside long
    range; no shuffle, no UDF. Adds ``{prefix}1..{prefix}k`` BIGINTs."""
    from ..util import _sql_literal

    out = df
    for ci, comp in enumerate(components, start=1):
        # ONE parsed SQL array literal per component (round-13)
        lit_arr = F.expr(_sql_literal([int(x) for x in comp]))
        q = F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long"),
        )
        dot = F.aggregate(
            F.zip_with(q, lit_arr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{prefix}{ci}", dot)
    return out
