"""BPE train/apply loop: merge training statistic, greedy encoding."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bpe_encode_word_greedy_rank_order():
    from etl_oms_spark.operators.tokenize import bpe_encode_word

    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert bpe_encode_word("lower", ranks) == ["low", "er"]
    assert bpe_encode_word("low", ranks) == ["low"]
    assert bpe_encode_word("xyz", ranks) == ["x", "y", "z"]


def test_bpe_apply_counts_and_determinism(spark):
    from etl_oms_spark.operators.tokenize import bpe_apply

    df = spark.createDataFrame(
        [(1, "lower low"), (2, ""), (3, None)],
        "doc_id LONG, text STRING",
    )
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    got = {r["doc_id"]: (r["bpe_tokens"], r["bpe_tokens_n"])
           for r in bpe_apply(df, merges).collect()}
    assert got[1] == ("low er low", 3)
    assert got[2] == ("", 0)
    assert got[3][0] is None
    # same result under different partitioning (worker-local ranks dict)
    got2 = {r["doc_id"]: r["bpe_tokens"]
            for r in bpe_apply(df.repartition(4), merges).collect()}
    assert {k: v[0] for k, v in got.items()} == got2


def test_train_merges_ranks_frequent_pairs(spark):
    from etl_oms_spark.operators.tokenize import bpe_apply, train_merges

    df = spark.createDataFrame(
        [(i, "the thee then " * 3) for i in range(5)],
        "doc_id LONG, text STRING",
    )
    merges = train_merges(df, 3)
    # 'th' and 'he' dominate every word
    assert ("t", "h") in merges and ("h", "e") in merges
    enc = bpe_apply(df.limit(1), merges).first()["bpe_tokens"]
    # 'he' outranks 'th' in this corpus ('thee' contributes an extra he-
    # adjacent pair), so 'the' encodes as [t, he]
    toks = set(enc.split())
    assert toks & {"he", "th", "the"}
