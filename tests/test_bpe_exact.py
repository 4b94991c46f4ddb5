"""Exact iterative BPE training (operators/tokenize.bpe_train_exact):
hand-case, independent brute-force parity, and the learn/apply
(bpe1/bpe2) contract invariants."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as m

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _brute_bpe(word_counts: list[tuple[str, int]], k: int):
    """Independent reimplementation on symbol LISTS (no string replace):
    same statistic, same tie-break, single-pass left-to-right merge."""
    vocab = [(list(w), n) for w, n in word_counts]
    out = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), wt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, a + b, wt))
        nv = []
        for syms, n in vocab:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nv.append((res, n))
        vocab = nv
    return out


def test_bpe_hand_case(spark):
    from etl_oms_spark.operators.tokenize import bpe_train_exact

    # 'low'x5 'lower'x2 'newest'x6 'widest'x3 — the Sennrich paper corpus
    docs = spark.createDataFrame(
        [(0, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id long, text string",
    )
    merges = bpe_train_exact(docs, n_merges=4, sample_words=256)
    got = [(mm["lhs"], mm["rhs"], mm["weight"]) for mm in merges]
    # round 1: (e,s) 9; round 2: (es,t) 9; round 3: (l,o) 7; round 4: (lo,w) 7
    assert got == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7), ("lo", "w", 7)]


def test_bpe_matches_independent_bruteforce(spark):
    """Engine merges == independent list-based canonical greedy-left
    reimplementation on the same sample — the double-space replace form
    is exactly canonical, so the two must agree on ANY input."""
    from etl_oms_spark.operators.text import tokens
    from etl_oms_spark.operators.tokenize import bpe_train_exact

    d = spark.read.parquet(f"{SF}/documents.parquet")
    wc = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(256)
        .collect()
    )
    sample = [(r["w"], int(r["n"])) for r in wc]
    expected = _brute_bpe(sample, 8)
    merges = bpe_train_exact(d, n_merges=8, sample_words=256)
    got = [
        (mm["rank"], mm["lhs"], mm["rhs"], mm["merged"], mm["weight"])
        for mm in merges
    ]
    assert got == expected


def test_bpe_fertility_bounds(spark):
    rows = m.queries()["bpe2_bpe_fertility"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # merging only ever reduces token count, never below 1 per word
        assert r["bpe_tokens"] <= r["chars"]
        assert r["ws_tokens"] <= r["bpe_tokens"]
        assert 1.0 <= r["fertility"]
        assert r["chars_per_token"] >= 1.0


def test_bpe_merges_feed_the_greedy_encoder():
    """The exact trainer's output plugs into the existing rank-priority
    greedy encoder (bpe_encode_word) — learn and apply compose."""
    from etl_oms_spark.operators.tokenize import bpe_encode_word

    ranks = {("e", "s"): 0, ("es", "t"): 1, ("l", "o"): 2, ("lo", "w"): 3}
    assert bpe_encode_word("lowest", ranks) == ["low", "est"]


def test_sdd1_dedup_removes_injected_replays(spark):
    """The streaming dedup must return exactly the plain-events rollup —
    the ~1/7 replayed rows all die in the state store."""
    from pyspark.sql import functions as F

    import __spark_entry__ as m

    got = {
        r["event_type"]: (r["n_events"], r["value_cents"])
        for r in m.queries()["sdd1_streaming_dedup"](spark, SF).collect()
    }
    ev = m._events(spark, SF)
    want = {
        r["event_type"]: (r["n"], r["c"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("c"),
        )
        .collect()
    }
    assert got == want


def test_bpe2_oracle_degrades_to_identity_when_merges_exhaust(spark):
    """ADVICE r08: a corpus with fewer than 8 learnable merges must not
    empty the oracle's ``applied`` CTE — the LEFT JOIN ON TRUE +
    COALESCE(chr(1)) form degrades an exhausted round to identity,
    mirroring bpe_train_exact's early ``break``. 'abc abc ...' exhausts
    after 2 merges ((a,b) then (ab,c) — then every word is one symbol)."""
    import duckdb

    from etl_oms_spark.operators.tokenize import bpe_fertility, bpe_train_exact

    rows = [(i, "s%d" % (i % 2), "abc abc abc") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    merges = bpe_train_exact(docs, n_merges=8, sample_words=256)
    assert len(merges) == 2, "corpus must exhaust the merge budget"
    got = {
        r["source"]: (r["n_docs"], r["bpe_tokens"], r["ws_tokens"], r["chars"])
        for r in bpe_fertility(docs, merges).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]),
    )
    odf = con.execute(m._bpe2_sql()).df()
    assert len(odf) == 2, "oracle must not collapse to 0 rows"
    want = {
        r["source"]: (r["n_docs"], r["bpe_tokens"], r["ws_tokens"], r["chars"])
        for _, r in odf.iterrows()
    }
    # 3 docs/source, each 'abc abc abc' -> 3 words -> 3 single-symbol
    # BPE tokens and 9 chars per doc
    assert got == want == {
        "s0": (3, 9, 9, 27),
        "s1": (3, 9, 9, 27),
    }


def test_sdd1_watermark_boundary_semantics(spark, tmp_path):
    """Pins the BOUNDARY of sdd1's exactness argument (VERDICT r08 item
    5), per the dropDuplicatesWithinWatermark contract cited in the
    sdd1 docstring: with a watermark delay SHORTER than the data span,
    (a) a byte-exact replay arriving after the watermark passed its
    event time is dropped by the late filter — eviction and lateness
    align, so byte-exact replays never duplicate — but (b) a duplicate
    RE-EMITTED with a later event time after its key's state evicted
    SURVIVES as a duplicate. The contract run avoids both by setting
    the delay beyond the dataset's time span."""
    import os
    import time

    from etl_oms_spark.streaming.events import dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")

    def emit(rows, mode):
        spark.createDataFrame(rows, "event_id long, ts string").select(
            "event_id", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode(mode).parquet(src)
        time.sleep(1.2)  # file mtime orders availableNow micro-batches

    # batch 0: key 1 at T0 plus a row a day later that advances the
    # watermark far past T0 + 10min
    emit([(1, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00")], "overwrite")
    # batch 1: unrelated key; end-of-batch eviction removes key 1's state
    emit([(3, "2024-01-02 00:00:00")], "append")
    # batch 2: (a) byte-exact replay of key 1 (late -> filtered) and
    # (b) key 1 re-emitted with a later event time (state gone -> survives)
    emit([(1, "2024-01-01 00:00:00"), (1, "2024-01-02 00:00:00")], "append")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        dedup_stream(stream, keys=["event_id"], watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["event_id"], str(r["ts"])) for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-02 00:00:00"),  # the surviving duplicate — the boundary
        (2, "2024-01-02 00:00:00"),
        (3, "2024-01-02 00:00:00"),
    ]
