"""Systematic NULL / empty / whitespace-only text robustness: every text
operator must process a degenerate corpus without crashing, and its
outputs must be sane (no phantom rows, no negative counts). ADVICE r3
found one NULL-text bug (intra_doc_block_dedup's sequence(0,-1)); this
net catches the whole class."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def degenerate(spark):
    rows = [
        (1, None, "src0"),
        (2, "", "src0"),
        (3, "   ", "src1"),
        (4, "one", "src1"),
        (5, "normal words here", "src2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_token_and_quality_ops_on_degenerate(degenerate):
    from etl_oms_spark.operators.text import (
        bpe_token_count,
        language_id,
        quality_score,
        whitespace_token_count,
    )

    out = degenerate.select(
        "doc_id",
        whitespace_token_count("text").alias("ws"),
        bpe_token_count("text").alias("bpe"),
        language_id("text").alias("lang"),
        quality_score("text").alias("q"),
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r["ws"] is None or r["ws"] >= 0
        assert r["bpe"] is None or r["bpe"] >= 0


def test_fingerprint_and_hash_ops_on_degenerate(degenerate):
    from etl_oms_spark.operators.dedup import simhash
    from etl_oms_spark.operators.text import fingerprint_md5, rolling_hash

    out = degenerate.select(
        "doc_id",
        fingerprint_md5("text").alias("fp"),
        rolling_hash("text").alias("rh"),
    ).collect()
    assert len(out) == 5
    sim = simhash(degenerate).collect()
    assert len(sim) == 5


def test_dedup_ops_on_degenerate(degenerate):
    from etl_oms_spark.operators.dedup import (
        block_dedup,
        exact_dedup,
        intra_doc_block_dedup,
        minhash_signatures,
        ngram_novelty,
        priority_dedup,
    )

    assert exact_dedup(degenerate).count() <= 5
    assert priority_dedup(degenerate, {"src0": 0}).count() <= 5
    # signatures: every doc gets exactly one row, arrays well-formed
    sigs = minhash_signatures(degenerate).collect()
    assert len(sigs) == 5
    assert all(len(r["minhash"]) == 64 for r in sigs)
    bd = block_dedup(degenerate)
    assert bd.filter(F.col("n_kept") < 0).count() == 0
    idb = intra_doc_block_dedup(degenerate)
    assert idb.filter(F.col("n_blocks") < 1).count() == 0
    nov = ngram_novelty(degenerate)
    assert nov.filter((F.col("novelty") < 0) | (F.col("novelty") > 1)).count() == 0


def test_gates_and_rewrites_on_degenerate(degenerate):
    from etl_oms_spark.operators.text import (
        canonicalize_url,
        gopher_rules,
        redact_pii,
        unicode_normalize,
    )

    g = degenerate.select("doc_id", gopher_rules(F.col("text"))["pass"].alias("p"))
    assert g.count() == 5
    r = redact_pii(degenerate)
    assert r.filter(F.col("n_redactions") < 0).count() == 0
    u = degenerate.select(unicode_normalize("text").alias("n")).collect()
    assert [x["n"] for x in u][0] is None  # NULL passes through
    c = degenerate.select(canonicalize_url("text").alias("c"))
    assert c.count() == 5  # non-URLs degrade, never crash


def test_search_and_classifier_on_degenerate(spark, degenerate):
    from etl_oms_spark.operators.classifier import linear_scores, synthetic_weights
    from etl_oms_spark.operators.search import bm25_scores

    scores = linear_scores(degenerate, synthetic_weights(spark, 64), n_buckets=64)
    assert scores.count() == 5  # every doc scored, empty docs score bias
    bm = bm25_scores(degenerate, ["normal"])
    assert bm.count() >= 0  # no crash on null-text corpus


def test_cosine_topk_skips_corrupt_vectors(spark):
    """NULL / empty / zero-norm vectors never consume top-k slots."""
    from etl_oms_spark.operators.similarity import cosine_topk

    rows = [
        (0, [1.0, 0.0]),
        (1, None),
        (2, []),
        (3, [0.5, 0.5]),
        (4, [0.0, 0.0]),  # zero norm → NULL cosine
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    probes = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, probes, k=5).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 3]
    assert all(r["cosine"] is not None for r in out)


def test_null_keys_comove_in_hash_splits(spark):
    """Documented behavior: NULL keys share one md5 bucket (the salt
    alone decides), so they co-move to a single split side."""
    from etl_oms_spark.operators.sampling import _md5_bucket

    d = spark.createDataFrame([(None,), (None,), (5,)], "doc_id LONG")
    buckets = [
        r["b"] for r in d.select(_md5_bucket(F.col("doc_id"), "s").alias("b")).collect()
    ]
    assert buckets[0] == buckets[1]  # both NULLs identical
