"""Round-2 curation operators: repetition signals, PII scrubbing,
deterministic shard-shuffle, sequence packing, benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_oms_spark.operators.dedup import contamination_ids
from etl_oms_spark.operators.sampling import deterministic_shuffle, pack_sequences
from etl_oms_spark.operators.text import redact_pii, repetition_stats


def test_repetition_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam ham"), (2, "all words differ here"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = out[1]
    assert (r1["total_words"], r1["distinct_words"], r1["top_word_count"]) == (4, 2, 3)
    assert r1["top_word_fraction"] == 0.75
    assert r1["dup_word_fraction"] == 0.5
    assert out[2]["top_word_fraction"] == 0.25
    assert 3 not in out  # zero-word doc absent by contract


def test_redact_pii_counts_and_rewrites(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b@example.com or 10.0.0.1 or +1 (555) 867-5309"),
            (2, "nothing sensitive"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_redactions"] == 3
    assert out[1]["text"].count("<REDACTED>") == 3
    assert "example.com" not in out[1]["text"]
    assert out[2]["n_redactions"] == 0
    assert out[2]["text"] == "nothing sensitive"


def test_deterministic_shuffle_partitioning_invariant(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = deterministic_shuffle(df, num_shards=4)
    b = deterministic_shuffle(df.repartition(13), num_shards=4)
    rows_a = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    rows_b = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    assert rows_a == rows_b  # same (shard, pos) on any physical layout
    # positions are 0..n_s-1 contiguous within each shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in rows_a.values():
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_pack_sequences_budget_bins(spark):
    # 6 docs x 100 tokens, budget 250 → start offsets 0,100,200,300,400,500
    # → seq ids 0,0,0,1,1,2 (global packing = the explicit shard_col=None
    # opt-in; the default is auto-sharded)
    import warnings

    df = spark.createDataFrame(
        [(i, 100) for i in range(6)], "doc_id long, n_tokens long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = pack_sequences(
            df, "n_tokens", budget=250, order_col="doc_id", shard_col=None
        )
    seqs = [r["seq_id"] for r in out.orderBy("doc_id").collect()]
    assert seqs == [0, 0, 0, 1, 1, 2]


def test_pack_sequences_sharded_independent(spark):
    df = spark.createDataFrame(
        [(i, i % 2, 100) for i in range(8)], "doc_id long, shard int, n_tokens long"
    )
    out = pack_sequences(df, "n_tokens", budget=250, order_col="doc_id", shard_col="shard")
    per_shard = {}
    for r in out.collect():
        per_shard.setdefault(r["shard"], []).append((r["doc_id"], r["seq_id"]))
    for shard, rows in per_shard.items():
        seqs = [s for _, s in sorted(rows)]
        assert seqs == [0, 0, 0, 1]  # each shard packs independently


def test_contamination_ids_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark question about spark shuffles")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix text the secret benchmark question about spark stuff"),
            (2, "completely unrelated content with different words entirely"),
        ],
        ["doc_id", "text"],
    )
    flagged = sorted(r["doc_id"] for r in contamination_ids(corpus, bench, k=5).collect())
    assert flagged == [1]
