"""Round-9 operators: exact WordPiece training (likelihood-scored
merges), greedy k-center coreset selection, and session-window
semantics (the ssw1 boundary pin)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_oms_spark.operators.coreset import kcenter_greedy
from etl_oms_spark.operators.tokenize import (
    WP_SCORE_SCALE,
    bpe_train_exact,
    wordpiece_train_exact,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


# ---------------------------------------------------------------- wordpiece
def _brute_wordpiece(word_counts, k):
    """Independent reimplementation on symbol LISTS (no string replace):
    likelihood argmax with exact Fractions, quantized only for the final
    comparison — same contract, different machinery."""
    from fractions import Fraction

    vocab = [(list(w), n) for w, n in word_counts]
    out = []
    for rank in range(1, k + 1):
        pairs: dict[tuple[str, str], int] = {}
        syms_n: dict[str, int] = {}
        for syms, n in vocab:
            for s in syms:
                syms_n[s] = syms_n.get(s, 0) + n
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        scored = [
            (
                int(Fraction(wt * WP_SCORE_SCALE, syms_n[a] * syms_n[b])),
                a,
                b,
                wt,
            )
            for (a, b), wt in pairs.items()
        ]
        sq, a, b, wt = min(scored, key=lambda t: (-t[0], t[1], t[2]))
        out.append((rank, a, b, a + b, wt, syms_n[a], syms_n[b], sq))
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


def test_wordpiece_prefers_exclusive_pair(spark):
    """The defining WordPiece-vs-BPE case: 'qu' appears 5x and q/u appear
    ONLY together; 'th' appears 8x but t and h are promiscuous (the/tin/
    hat...). BPE merges th first (raw count); WordPiece merges qu first
    (likelihood): count/(ca*cb) = 5/(5*5) >> 8/(ca_t*cb_h)."""
    rows = ["quit quit quit quit quit the the the the the the the the "
            "tin tin tin hat hat hat"]
    wp = wordpiece_train_exact(_docs(spark, rows), n_merges=1)
    bpe = bpe_train_exact(_docs(spark, rows), n_merges=1)
    assert (wp[0]["lhs"], wp[0]["rhs"]) == ("q", "u")
    assert (bpe[0]["lhs"], bpe[0]["rhs"]) != ("q", "u")


def test_wordpiece_matches_brute_force(spark, sf_dir):
    """8 rounds on real sf0.001 documents == the independent list-walker
    with Fraction scoring (pins both the statistic and the greedy-left
    replace equivalence)."""
    from etl_oms_spark.operators.text import tokens

    words = (
        _t_docs(spark, sf_dir)
        .select(F.explode(tokens("text")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(256)
        .collect()
    )
    brute = _brute_wordpiece([(r["w"], r["n"]) for r in words], 8)
    got = wordpiece_train_exact(_t_docs(spark, sf_dir), n_merges=8)
    assert [
        (m["rank"], m["lhs"], m["rhs"], m["merged"], m["pair_weight"],
         m["lhs_count"], m["rhs_count"], m["score_q"])
        for m in got
    ] == brute


def _t_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_wordpiece_degenerate_corpus_runs_dry(spark):
    """A corpus with fewer learnable merges than n_merges stops early
    instead of erroring (mirrors bpe_train_exact's break)."""
    got = wordpiece_train_exact(_docs(spark, ["ab ab cd"]), n_merges=8)
    assert 0 < len(got) < 8
    assert [m["rank"] for m in got] == list(range(1, len(got) + 1))


# ----------------------------------------------------------------- k-center
def test_kcenter_matches_brute_force(spark):
    """Greedy farthest-point on a hand corpus == numpy brute force in the
    same quantized domain (including a radius tie broken by lowest id)."""
    import numpy as np

    vecs = [
        (0, [0.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),   # ties with id 1 on dist to id 0 -> id 1 wins r2
        (3, [0.9, 0.9]),
        (4, [0.1, 0.1]),
    ]
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in vecs],
        "vec_id long, embedding array<double>, label int",
    )
    got = [tuple(r) for r in kcenter_greedy(df, k=4).collect()]

    # half-AWAY-from-zero, matching Spark F.round / DuckDB round() — NOT
    # Python's banker's round(), which would silently diverge from the
    # engine contract on .5-boundary coordinates (ADVICE r09)
    import math

    def half_away(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))

    q = {i: np.array([half_away(x) + 1e6 for x in v], dtype=np.int64)
         for i, v in vecs}
    chosen = [0]
    exp = [(1, 0, 0)]
    for rnd in range(2, 5):
        best = None
        for i in sorted(q):
            d = min(int(((q[i] - q[c]) ** 2).sum()) for c in chosen)
            if best is None or d > best[1]:
                best = (i, d)
        chosen.append(best[0])
        exp.append((rnd, best[0], best[1]))
    assert got == exp
    # covering radius is non-increasing after round 1
    radii = [r[2] for r in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_k_exceeding_corpus_stops(spark):
    df = spark.createDataFrame(
        [(0, [0.0], 0), (1, [1.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    got = kcenter_greedy(df, k=8).collect()
    # degenerate tail: with all points chosen, max-min dist is 0 and the
    # lowest unchosen... there is none -- argmax returns an already-chosen
    # point at d=0; the contract is simply k rows, radii 0 after n points
    assert len(got) == 8
    assert got[0]["radius_d2"] == 0
    assert all(r["radius_d2"] == 0 for r in got[2:])


# ----------------------------------------------------------- session window
def test_session_window_gap_boundary(spark):
    """Pins the engine semantics SSW1_SQL mirrors: a gap of EXACTLY the
    gap duration still MERGES (Spark session ranges are end-inclusive
    when merging — the islands oracle must split on `>`, not `>=`); only
    a strictly larger gap opens a new session."""
    from etl_oms_spark.streaming.events import session_window_agg

    t0 = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(hours=6)
    eps = dt.timedelta(microseconds=1)
    rows = [
        (1, t0), (1, t0 + gap - eps),        # strictly inside -> merge
        (2, t0), (2, t0 + gap),              # exactly gap -> still merges
        (3, t0), (3, t0 + gap + eps),        # strictly beyond -> split
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["n_events"])
        for r in session_window_agg(df, gap="6 hours").collect()
    }
    assert got == {(1, 2), (2, 2), (3, 1)}
    counts = (
        session_window_agg(df, gap="6 hours")
        .groupBy("user_id")
        .count()
        .collect()
    )
    assert {(r["user_id"], r["count"]) for r in counts} == {
        (1, 1), (2, 1), (3, 2)}


# ------------------------------------------------------------------- rag1
def test_rag1_prefix_packing_semantics(spark, monkeypatch, tmp_path):
    """Packing is PREFIX (stop at first overflow), not first-fit-skip: a
    small doc ranked AFTER the overflowing doc must NOT enter the
    context. Built on a corpus where doc token lengths force the case;
    also pins rank order = (score_q DESC, doc_id ASC) and the
    context_ids join."""
    import __spark_entry__ as m

    # one query term 'zebra'; lengths: doc0 = 400 tok, doc1 = 600 tok,
    # doc2 = 50 tok. tf ordering: give doc0 the most zebras, doc1 next,
    # doc2 least so rank = 0,1,2. Budget 512 -> prefix stops at doc1
    # (400+600 > 512); doc2 (would fit: 450 < 512) must be EXCLUDED.
    def doc(n_zebra, n_pad):
        return " ".join(["zebra"] * n_zebra + ["pad"] * n_pad)

    rows = [
        (0, doc(40, 360)), (1, doc(20, 580)), (2, doc(1, 49)),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(p)
    monkeypatch.setattr(
        m, "_MRR_QUERIES", [("q1", ("zebra",))], raising=True
    )
    out = {
        r["qid"]: r
        for r in m.rag1_context_assembly(spark, str(tmp_path)).collect()
    }
    r = out["q1"]
    assert r["n_candidates"] == 3
    assert r["n_packed"] == 1
    assert r["tokens_packed"] == 400
    assert r["context_ids"] == "0"


def test_rag1_invariants_on_testdata(spark, sf_dir):
    import __spark_entry__ as m

    for r in m.rag1_context_assembly(spark, sf_dir).collect():
        assert r["tokens_packed"] <= m._RAG1_BUDGET
        assert r["n_packed"] <= min(r["n_candidates"], m._RAG1_TOPK)
        ids = [s for s in r["context_ids"].split(",") if s]
        assert len(ids) == r["n_packed"]


# --------------------------------------------------- pj1 per_token_cap knob
def test_ppjoin_per_token_cap(spark):
    """The 100×-rehearsal production knob: cap=None is byte-identical to
    the historic exact path; a cap yields a SUBSET of the exact verified
    pairs (no false positives) whose hub-and-spoke shape keeps every
    duplicate cluster in one connected component."""
    from etl_oms_spark.operators.dedup import prefix_filtered_jaccard_pairs
    from etl_oms_spark.operators.graph import connected_components

    # one 12-doc near-dup cluster (same 10 tokens + 1 distinct suffix
    # token each -> pairwise Jaccard 10/12 >= 0.8) + 3 unrelated docs
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    rows = [(i, f"{base} copytag{i}") for i in range(12)]
    rows += [(100, "one two three"), (101, "four five six"),
             (102, "seven eight nine")]
    df = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in prefix_filtered_jaccard_pairs(df, threshold=0.8).collect()
    }
    assert len(exact) == 66  # C(12,2): the cluster is a clique
    capped_df = prefix_filtered_jaccard_pairs(
        df, threshold=0.8, per_token_cap=2
    )
    capped = {(r["id_a"], r["id_b"]) for r in capped_df.collect()}
    assert capped <= exact          # subset, no false positives
    assert len(capped) < len(exact)  # the cap actually cut fan-out
    comp = connected_components(capped_df.select("id_a", "id_b"))
    n_components = comp.select("component").distinct().count()
    assert n_components == 1        # hub-and-spoke keeps the cluster whole
    assert comp.count() == 12


# ------------------------------------------------------------------ unigram
def test_unigram_matches_exhaustive_enumeration(spark, sf_dir):
    """Viterbi DP == brute-force enumeration of EVERY segmentation of
    every sample word (vocab pieces only), scored with the same
    quantized log-probs and the DP's lexicographic tie order
    (score DESC, pieces ASC, then split points compared last-to-first
    DESC — the recursive unwind of the DP's per-step j DESC)."""
    import math

    from etl_oms_spark.operators.text import tokens
    from etl_oms_spark.operators.tokenize import (
        UNI_LOG_SCALE,
        UNI_MAX_PIECE,
        UNI_MAX_WORD,
        UNI_VOCAB,
        unigram_segment_exact,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(256)
        .collect()
    )
    sample = [(r["w"], int(r["n"])) for r in rows]
    weights: dict[str, int] = {}
    for w, n in sample:
        for ln_ in range(1, UNI_MAX_PIECE + 1):
            for i in range(len(w) - ln_ + 1):
                p = w[i:i + ln_]
                weights[p] = weights.get(p, 0) + n
    multi = sorted(
        ((p, c) for p, c in weights.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:UNI_VOCAB]
    vocab = dict(multi)
    vocab.update({p: c for p, c in weights.items() if len(p) == 1})
    total = sum(vocab.values())
    score = {
        p: math.floor(math.log(c / total) * UNI_LOG_SCALE + 0.5)
        for p, c in vocab.items()
    }

    def all_segs(w):
        if not w:
            yield []
            return
        for ln_ in range(1, min(UNI_MAX_PIECE, len(w)) + 1):
            head = w[:ln_]
            if head in score:
                for rest in all_segs(w[ln_:]):
                    yield [head] + rest

    usage: dict[str, int] = {}
    for w, n in sample:
        if not (2 <= len(w) <= UNI_MAX_WORD):
            continue
        best = max(
            all_segs(w),
            key=lambda segs: (
                sum(score[p] for p in segs),
                -len(segs),
                # split points, last piece's start first, maximized
                tuple(
                    len(w) - sum(len(p) for p in segs[i:])
                    for i in range(len(segs) - 1, -1, -1)
                ),
            ),
        )
        for p in best:
            usage[p] = usage.get(p, 0) + n
    expected = sorted(
        ((p, vocab[p], score[p], u) for p, u in usage.items()),
        key=lambda t: (-t[3], t[0]),
    )
    got = [
        (d["piece"], d["vocab_weight"], d["score_q"], d["usage"])
        for d in unigram_segment_exact(docs)
    ]
    assert got == expected
