"""Brute-force cross-checks for the integer-arithmetic PQ twin
(similarity.pq_train_quantized / pq_topk_quantized — e11's engine path).

The pure-python reference below re-implements training, encoding and ADC
scoring over the collected sample with plain ints, so any drift in the
engine's argmin/tie-break/mean arithmetic shows up as a hard mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _quantize(vec):
    # mirrors clustering.quantize_shifted: round-half-up via Spark's
    # BigDecimal HALF_UP == python round() for positive, but python
    # round() is banker's — use the explicit floor(x*1e6 + 0.5) only for
    # non-negative operands; embeddings are in [-1, 1] so do it in the
    # shifted domain the way DuckDB's round() does (half away from zero).
    import math

    out = []
    for x in vec:
        v = float(x) * 1_000_000
        r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
        out.append(int(r) + 1_000_000)
    return out


def _train_ref(xs, m, k, n_iter):
    dim = len(xs[0])
    sub = dim // m
    books = []
    for s in range(m):
        svs = [x[s * sub : (s + 1) * sub] for x in xs]
        seen, cents = set(), []
        for v in svs:
            t = tuple(v)
            if t not in seen:
                seen.add(t)
                cents.append(list(v))
            if len(cents) == k:
                break
        assert len(cents) == k
        for _ in range(n_iter):
            sums = [[0] * sub for _ in range(k)]
            counts = [0] * k
            for v in svs:
                ds = [sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents]
                best = ds.index(min(ds))  # first index wins ties
                counts[best] += 1
                for j in range(sub):
                    sums[best][j] += v[j]
            for c in range(k):
                if counts[c]:
                    cents[c] = [
                        (2 * sums[c][j] + counts[c]) // (2 * counts[c])
                        for j in range(sub)
                    ]
        books.append(cents)
    return books


def test_pq_train_quantized_matches_pure_python(spark):
    from etl_oms_spark.operators.similarity import pq_train_quantized

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train_quantized(emb, m=4, k=8, sample=64, n_iter=2)
    rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(64).collect()
    )
    xs = [_quantize(r["embedding"]) for r in rows]
    ref = _train_ref(xs, m=4, k=8, n_iter=2)
    assert books == ref
    assert all(
        isinstance(v, int) for bk in books for cent in bk for v in cent
    )


def test_pq_topk_quantized_matches_bruteforce_adc(spark):
    from etl_oms_spark.operators.similarity import (
        pq_topk_quantized,
        pq_train_quantized,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train_quantized(emb, m=4, k=8, sample=64, n_iter=2)
    query = emb.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"]): r["adc_dist2"]
        for r in pq_topk_quantized(emb, query, books, k=5).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    xs = {r["vec_id"]: _quantize(r["embedding"]) for r in rows}
    m, sub = 4, len(books[0][0])

    def code(v, s):
        seg = v[s * sub : (s + 1) * sub]
        ds = [
            sum((a - b) * (a - b) for a, b in zip(seg, c)) for c in books[s]
        ]
        return ds.index(min(ds))

    for qid in (0, 1):
        qv = xs[qid]
        luts = [
            [
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(qv[s * sub : (s + 1) * sub], c)
                )
                for c in books[s]
            ]
            for s in range(m)
        ]
        scored = sorted(
            (
                (sum(luts[s][code(v, s)] for s in range(m)), vid)
                for vid, v in xs.items()
            )
        )[:5]
        want = {(qid, vid): d for d, vid in scored}
        have = {kv: d for kv, d in got.items() if kv[0] == qid}
        assert have == want
