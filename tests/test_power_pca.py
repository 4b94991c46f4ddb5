"""Checks for the integer power-iteration PCA twin
(linalg.power_pca_quantized / project_integer — pc2's engine path):
exact parity against a pure-python big-int reference, and the softer
property that 128 rounds actually converge to numpy's eigh basis on the
test corpus (the exact oracle holds regardless; this pins usefulness).
"""

from __future__ import annotations

import math

SF_DIR = "/root/testdata/sf0.001"


def _quantize(vec, scale=1000):
    out = []
    for x in vec:
        v = float(x) * scale
        r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
        out.append(int(r))
    return out


def _reference(xs, iters=128, v_scale=10**6, n_components=2):
    d = len(xs[0])
    n = len(xs)
    s1 = [sum(x[i] for x in xs) for i in range(d)]
    m = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            s2 = sum(x[i] * x[j] for x in xs)
            v = n * s2 - s1[i] * s1[j]
            m[i][j] = v
            m[j][i] = v

    def sdiv(num, den):
        q = (abs(num) * v_scale) // den
        return -q if num < 0 else q

    def deflate(vec, basis):
        for b in basis:
            p = sum(x * y for x, y in zip(vec, b))
            nb = sum(y * y for y in b)
            if nb == 0:
                continue
            out = []
            for x, y in zip(vec, b):
                t = p * y
                q = abs(t) // nb
                out.append(x - (-q if t < 0 else q))
            vec = out
        return vec

    comps = []
    for c in range(n_components):
        v = [v_scale if (c == 0 or i % 2 == 0) else -v_scale for i in range(d)]
        v = deflate(v, comps)
        for _ in range(iters):
            w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
            mx = max(abs(x) for x in w) or 1
            v = [sdiv(x, mx) for x in w]
            v = deflate(v, comps)
        comps.append(v)
    return comps


def test_power_pca_matches_pure_python(spark):
    from etl_oms_spark.operators.linalg import power_pca_quantized

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = power_pca_quantized(emb, iters=128, n_components=2)
    xs = [
        _quantize(r["embedding"])
        for r in emb.select("embedding").collect()
    ]
    assert got == _reference(xs)


def test_power_pca_converges_to_eigh_basis(spark):
    import numpy as np

    from etl_oms_spark.operators.linalg import (
        power_pca_quantized,
        principal_components,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ints = power_pca_quantized(emb, iters=128, n_components=2)
    ref = principal_components(emb, n_components=2)
    for iv, rv in zip(ints, ref):
        a = np.asarray(iv, dtype="float64")
        b = np.asarray(rv, dtype="float64")
        cos = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, cos


def test_project_integer_is_exact_dot(spark):
    from etl_oms_spark.operators.linalg import project_integer

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    comp = [((-1) ** i) * (i + 1) for i in range(64)]
    rows = project_integer(emb, [comp]).select("vec_id", "embedding", "p1").collect()
    for r in rows:
        q = _quantize(r["embedding"])
        assert r["p1"] == sum(a * b for a, b in zip(q, comp))
