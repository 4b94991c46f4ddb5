"""Round-3 operators: covariance via mapInPandas partial aggregation,
snapshot diff, Gopher gates, percent-rank normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_covariance_matches_numpy(emb):
    """The distributed int64 QtQ must equal a single-node numpy reference
    bit-for-bit (exact integer sums, identical IEEE expression)."""
    import numpy as np

    from etl_oms_spark.operators.linalg import covariance_matrix

    rows = emb.select("embedding").collect()
    v = np.stack([r["embedding"] for r in rows]).astype("float64") * 1000
    q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")  # half away from zero, like F.round
    n = q.shape[0]
    s2 = q.T @ q
    s1 = q.sum(axis=0)
    got = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(emb).collect()}
    assert len(got) == 64 * 65 // 2
    for (i, j), cov in got.items():
        ref = float(s2[i, j]) / n - (float(s1[i]) / n) * (float(s1[j]) / n)
        assert cov == ref  # exact equality, not approx


def test_covariance_partitioning_invariant(emb):
    from etl_oms_spark.operators.linalg import second_moment_sums

    a = {(r["i"], r["j"]): r["s2"] for r in second_moment_sums(emb).collect()}
    b = {
        (r["i"], r["j"]): r["s2"]
        for r in second_moment_sums(emb.repartition(13)).collect()
    }
    assert a == b


def test_table_diff_statuses(spark):
    from etl_oms_spark.operators.validate import table_diff

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "id INT, s STRING, v INT",
    )
    after = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (3, "c", 30), (5, "e", 50)],
        "id INT, s STRING, v INT",
    )
    got = {r["id"]: r["diff_status"] for r in table_diff(before, after, ["id"]).collect()}
    # NULL -> value counts as changed (null-safe compare), not unchanged
    assert got == {1: "unchanged", 2: "changed", 3: "changed",
                   4: "removed", 5: "added"}


def test_gopher_rules_gates(spark):
    from etl_oms_spark.operators.text import gopher_rules

    good = "the quick brown fox jumps over the lazy dog and runs to it " * 5
    rows = [
        (1, good),                         # passes all gates
        (2, "short text"),                 # fails word count
        (3, "### " * 60),                  # symbol soup: fails symbol+alpha
        (4, None),                         # NULL text: fails closed
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    r = gopher_rules(F.col("text"), min_words=30)
    out = {
        row["doc_id"]: row
        for row in df.select(
            "doc_id", *[v.alias(k.replace("pass", "pass_gate")) for k, v in r.items()]
        ).collect()
    }
    assert out[1]["pass_gate"] is True
    assert out[2]["ok_n_words"] is False and out[2]["pass_gate"] is False
    assert out[3]["ok_symbol_ratio"] is False and out[3]["ok_alpha_words"] is False
    assert not out[4]["pass_gate"]


def test_grouped_percent_rank_matches_window(spark):
    import random

    from pyspark.sql import Window

    from etl_oms_spark.operators.quantiles import grouped_percent_rank

    rng = random.Random(5)
    rows = [("g1", i, rng.randint(0, 30)) for i in range(500)]
    rows += [("solo", 9999, 7)]  # single-row group -> 0.0
    df = spark.createDataFrame(rows, "g STRING, id LONG, v INT").repartition(6)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = grouped_percent_rank(df, ["g"], order)
    ref = df.withColumn(
        "ref", F.percent_rank().over(Window.partitionBy("g").orderBy(*order))
    )
    cmp = got.join(ref.select("g", "id", "ref"), ["g", "id"])
    assert cmp.filter(F.col("pct_rank") != F.col("ref")).count() == 0
    assert cmp.count() == df.count()


def test_pca_components_match_numpy(emb):
    """Driver eigh over the distributed covariance must reproduce a pure
    single-node numpy PCA (same quantization) up to sign normalization."""
    import numpy as np

    from etl_oms_spark.operators.linalg import principal_components

    rows = emb.select("embedding").collect()
    xv = np.stack([r["embedding"] for r in rows]).astype("float64") * 1000
    x = np.sign(xv) * np.floor(np.abs(xv) + 0.5)  # half away from zero, like F.round
    n = x.shape[0]
    cov = (x.T @ x) / n - np.outer(x.sum(0) / n, x.sum(0) / n)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    got = principal_components(emb, n_components=3)
    assert len(got) == 3 and len(got[0]) == 64
    for ci in range(3):
        ref = vecs[:, order[ci]]
        g = np.array(got[ci])
        # same direction up to sign
        cos = abs(float(ref @ g) / (np.linalg.norm(ref) * np.linalg.norm(g)))
        assert cos > 0.9999, (ci, cos)


def test_project_onto_streams_dot_products(spark):
    from etl_oms_spark.operators.linalg import project_onto

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [0.0, -1.0, 1.0])],
        "id LONG, embedding ARRAY<DOUBLE>",
    )
    got = {r["id"]: (r["pc1"], r["pc2"]) for r in project_onto(
        df, [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5]]).collect()}
    assert got[1] == (1.0, 3.0)
    assert got[2] == (0.0, 0.0)
    # no exchange in the plan: projection is scan-local
    from etl_oms_spark.util import physical_plan

    assert "Exchange" not in physical_plan(
        project_onto(df, [[1.0, 0.0, 0.0]]))
