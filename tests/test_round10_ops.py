"""Round-10 operators: the Unigram-LM EM training round (uniT), the
per_token_cap PPJoin production twin (pj1c), corpus-wide unigram
fertility (uni2), the JL random-projection recall report (jl1),
Kneser-Ney per-source LM scoring (kn1), and isotonic calibration
(iso1).

Every parity test here re-derives the full pipeline with an INDEPENDENT
algorithm — exhaustive-enumeration segmenters for uniT/uni2 (no DP),
a numpy replay for jl1, pure-Python counting for kn1, sequential PAV
with exact rationals for iso1 (uniqueness of the isotonic solution
bridges it to the operator's minimax closed form) — so a bug in the
Spark column algebra and its oracle cannot cancel out. pj1c's pins are
the refinement invariants that make the capped form safe to ship: its
pair set only ever SPLITS exact clusters (never merges two), and on
clique-shaped duplicate clusters it splits nothing.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_oms_spark.operators.tokenize import (
    UNI_EM_KEEP,
    UNI_LOG_SCALE,
    UNI_MAX_PIECE,
    UNI_MAX_WORD,
    UNI_VOCAB,
    unigram_em_train,
    unigram_segment_exact,
)


# ------------------------------------------------------------- helpers
# shared with tests/test_round11_ops.py (uniT2 multi-round EM) via
# tests_round10_helpers — one source of truth for the independent
# enumeration replay
from tests_round10_helpers import brute_usage as _brute_usage
from tests_round10_helpers import initial_vocab as _initial_vocab
from tests_round10_helpers import scores as _scores
from tests_round10_helpers import word_sample as _word_sample


def _brute_em(sample) -> list[tuple]:
    """Independent full hard-EM round: initial LM → enumeration E-step →
    prune/M-step → re-quantize → enumeration re-segment."""
    vocab0 = _initial_vocab(sample)
    usage0 = _brute_usage(sample, _scores(vocab0))
    multi1 = sorted(
        ((p, u) for p, u in usage0.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:UNI_EM_KEEP]
    vocab1 = dict(multi1)
    vocab1.update(
        {p: max(usage0.get(p, 0), 1) for p in vocab0 if len(p) == 1}
    )
    score1 = _scores(vocab1)
    usage1 = _brute_usage(sample, score1)
    return sorted(
        (
            (p, vocab1[p], score1[p], usage0.get(p, 0), u)
            for p, u in usage1.items()
        ),
        key=lambda t: (-t[4], t[0]),
    )


# ------------------------------------------------------------- uniT
def test_unigram_em_matches_brute_force(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = _brute_em(_word_sample(docs))
    got = [
        (d["piece"], d["em_weight"], d["score_q"], d["usage_init"], d["usage"])
        for d in unigram_em_train(docs)
    ]
    assert got == expected


def test_unigram_em_pass1_consistent_with_uni1(spark, sf_dir):
    """uniT's E-step IS uni1's segmentation: for every piece surviving
    into the pass-2 usage table, usage_init must equal uni1's usage (a
    piece absent from uni1's table has usage_init 0)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    uni1 = {d["piece"]: d["usage"] for d in unigram_segment_exact(docs)}
    for d in unigram_em_train(docs):
        assert d["usage_init"] == uni1.get(d["piece"], 0), d["piece"]


def test_unigram_em_prunes_and_smooths(spark):
    """The M-step semantics on a hand corpus: (1) every multi-char
    output piece was used in pass 1 (zero-usage multis are pruned — the
    initial substring vocabulary is NOT carried over); (2) at most
    UNI_EM_KEEP multi-char pieces survive; (3) single chars always
    remain segmentable (em_weight >= 1 — the smoothing floor), so every
    sample word still segments in pass 2; (4) total pass-2 usage mass
    equals total pass-1 mass (both passes segment the same words)."""
    words = ["banana"] * 5 + ["bandana"] * 3 + ["anagram"] * 2 + ["zz"]
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    rows = unigram_em_train(docs)
    assert rows, "EM produced an empty usage table"
    for d in rows:
        if len(d["piece"]) >= 2:
            assert d["usage_init"] > 0, f"unpruned zero-usage multi {d}"
        assert d["em_weight"] >= 1
    assert sum(1 for d in rows if len(d["piece"]) >= 2) <= UNI_EM_KEEP
    uni1_mass = sum(
        d["usage"] * len(d["piece"])
        for d in unigram_segment_exact(docs)
    )
    em_mass = sum(d["usage"] * len(d["piece"]) for d in rows)
    assert em_mass == uni1_mass  # same chars segmented, both passes


def test_unigram_em_moves_the_lm(spark):
    """EM must actually train — pinned on a corpus where the argmax
    demonstrably flips: under the frequency-estimated LM the rare word
    'wxyz' segments as the whole 4-char piece (substring weights favor
    it), but its E-step count is 1 vs 8/12 for wx/yz/xy, so after
    re-estimation 'wx|yz' outscores it and pass 2 re-segments. (On the
    sf* corpora one hard-EM round happens to be a fixed point of the
    segmentation — the scores still move, see the next test — so the
    flip needs this shaped corpus.)"""
    words = [("wxyz", 1), ("wx", 8), ("yz", 8), ("xy", 12)]
    text = " ".join(w for w, n in words for _ in range(n))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    uni1 = {d["piece"]: d["usage"] for d in unigram_segment_exact(docs)}
    assert uni1 == {"wxyz": 1, "wx": 8, "yz": 8, "xy": 12}
    em = {
        d["piece"]: (d["em_weight"], d["usage_init"], d["usage"])
        for d in unigram_em_train(docs)
    }
    # 'wxyz' pruned OUT of the usage table (re-segmented away); the
    # freed mass lands on wx/yz
    assert em == {
        "wx": (8, 8, 9),
        "yz": (8, 8, 9),
        "xy": (12, 12, 12),
    }


def test_unigram_em_rescores_even_at_fixed_point(spark, sf_dir):
    """On sf0.001 the segmentation is a hard-EM fixed point, but the LM
    itself still trains: re-estimated quantized log-probs must differ
    from the frequency-estimated ones for some piece (usage mass ≠
    substring-occurrence mass), and the EM vocabulary is the pruned
    used-set, not the 64-piece substring candidate list."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    uni1 = {d["piece"]: d["score_q"] for d in unigram_segment_exact(docs)}
    em = {d["piece"]: d["score_q"] for d in unigram_em_train(docs)}
    assert set(em) == set(uni1)  # fixed point: same pieces used
    assert any(em[p] != uni1[p] for p in em), "scores did not re-estimate"


# ------------------------------------------------------------- iso1
def _pav(pairs: list[tuple[int, int]]) -> list:
    """Classic sequential pool-adjacent-violators over (n, pos) bins,
    exact rational pooled means — the INDEPENDENT algorithm whose
    unique solution the operator's minimax closed form must equal."""
    from fractions import Fraction

    blocks: list[list] = []  # [n, pos, size]
    for n, pos in pairs:
        blocks.append([n, pos, 1])
        while len(blocks) >= 2 and Fraction(
            blocks[-1][1], blocks[-1][0]
        ) < Fraction(blocks[-2][1], blocks[-2][0]):
            n2, p2, s2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
            blocks[-1][2] += s2
    out = []
    for n, pos, size in blocks:
        out.extend([Fraction(pos, n)] * size)
    return out


def test_isotonic_matches_pav(spark, sf_dir):
    """isotonic_calibration (minimax closed form) == sequential PAV
    with exact rational pooling, on rb1's real reliability table —
    uniqueness of the weighted L2 isotonic solution is the bridge.
    Quantized comparison tolerates only the double-vs-rational 1-ulp
    boundary (asserted exact here: the fitted doubles quantize to the
    same 1e-6 grid points as the rationals)."""
    import __spark_entry__ as entry_mod

    got = entry_mod.iso1_isotonic_calibration(spark, sf_dir).collect()
    pairs = [(r["n"], r["n_pos"]) for r in got]  # ordered by bin
    expected = _pav(pairs)
    assert len(got) == len(expected)
    for r, frac in zip(got, expected):
        assert r["fitted_q"] == math.floor(float(frac) * 1e6 + 0.5), r
    # isotonic: fitted non-decreasing; pooling preserves total mass
    fq = [r["fitted_q"] for r in got]
    assert fq == sorted(fq)
    from fractions import Fraction

    assert sum(
        Fraction(r["n"]) * f for r, f in zip(got, expected)
    ) == sum(r["n_pos"] for r in got)


def test_isotonic_pools_violators(spark):
    """Hand case: bins with rates (0.8, 0.2, 0.5) and weights (10, 10,
    10) — the first two violate and pool to 0.5, the third joins the
    pool (0.5 == 0.5 stays, but (8+2)/20=0.5 then 0.5 ok) — fitted =
    (0.5, 0.5, 0.5); and a clean increasing table passes through
    untouched."""
    from etl_oms_spark.operators.classifier import isotonic_calibration

    bins = spark.createDataFrame(
        [(0, 10, 8), (1, 10, 2), (2, 10, 5)],
        "bin long, n long, n_pos long",
    )
    got = {r["bin"]: r["fitted_q"] for r in isotonic_calibration(bins).collect()}
    assert got == {0: 500000, 1: 500000, 2: 500000}

    inc = spark.createDataFrame(
        [(0, 10, 1), (1, 10, 5), (2, 10, 9)],
        "bin long, n long, n_pos long",
    )
    got2 = {r["bin"]: r["fitted_q"] for r in isotonic_calibration(inc).collect()}
    assert got2 == {0: 100000, 1: 500000, 2: 900000}


# ------------------------------------------------------------- kn1
def test_kneser_ney_matches_pure_python(spark, sf_dir):
    """kneser_ney_source_scores == an independent pure-Python replay of
    the whole pipeline (counts, continuation tables, the fixed-shape
    double expression, per-type quantization, occurrence-weighted
    per-source sums) on the sf0.001 corpus."""
    from etl_oms_spark.operators.domain import (
        KN_DISCOUNT,
        kneser_ney_source_scores,
    )
    from etl_oms_spark.operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("source", tokens("text").alias("t")).collect()

    gcnt: dict[tuple, int] = {}
    for r in rows:
        t = r["t"]
        for a, b in zip(t, t[1:]):
            gcnt[(r["source"], a, b)] = gcnt.get((r["source"], a, b), 0) + 1
    tcnt: dict[tuple, int] = {}
    for (_, a, b), c in gcnt.items():
        tcnt[(a, b)] = tcnt.get((a, b), 0) + c
    cv: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (a, b), c in tcnt.items():
        cv[a] = cv.get(a, 0) + c
        n1v[a] = n1v.get(a, 0) + 1
        n1w[b] = n1w.get(b, 0) + 1
    n1all = len(tcnt)
    score = {
        (a, b): math.floor(
            math.log(
                (c - KN_DISCOUNT) / cv[a]
                + (KN_DISCOUNT * n1v[a] / cv[a]) * (n1w[b] / n1all)
            )
            * 1e6
            + 0.5
        )
        for (a, b), c in tcnt.items()
    }
    agg: dict[str, list[int]] = {}
    for (s, a, b), c in gcnt.items():
        row = agg.setdefault(s, [0, 0])
        row[0] += c
        row[1] += c * score[(a, b)]
    expected = sorted(
        (s, v[0], v[1], v[1] / v[0]) for s, v in agg.items()
    )
    got = [
        (r["source"], r["n_bigrams"], r["sum_logq"], r["mean_logq"])
        for r in kneser_ney_source_scores(docs).collect()
    ]
    assert got == expected


def test_kneser_ney_continuation_effect(spark):
    """The defining KN property ('the francisco effect'): two bigrams
    with IDENTICAL raw count, context count and right-word frequency,
    but the right word of one appears after many distinct contexts and
    the other after exactly one — the versatile word must score
    strictly higher because only the continuation term
    N1+(·w)/N1+(··) separates them (an add-1 model scores them
    equally)."""
    from etl_oms_spark.operators.domain import kneser_ney_source_scores

    # 'w' follows 4 distinct left contexts; 'f' (same total frequency 4)
    # only ever follows 'san'. Score bigrams 'q w' vs 'p f' where q/p
    # each occur once as context.
    text = (
        "a w b w c w q w "      # w after 4 distinct contexts
        "san f san f san f p f" # f only after san (3x) and p (1x)...
    )
    # adjust: give f exactly one *other* context p, so n1w: w=4, f=2
    docs = spark.createDataFrame(
        [(0, text, "s")], "doc_id long, text string, source string"
    )
    from etl_oms_spark.operators.text import tokens as _tok
    toks = docs.select(_tok("text").alias("t")).collect()[0]["t"]
    # sanity on the constructed corpus shape
    assert toks.count("w") == 4 and toks.count("f") == 4

    from etl_oms_spark.operators.domain import KN_DISCOUNT
    # replicate scores for the two probe bigrams from the corpus counts
    bigrams = list(zip(toks, toks[1:]))
    tcnt: dict[tuple, int] = {}
    for ab in bigrams:
        tcnt[ab] = tcnt.get(ab, 0) + 1
    cv: dict[str, int] = {}
    n1v: dict[str, int] = {}
    n1w: dict[str, int] = {}
    for (a, b), c in tcnt.items():
        cv[a] = cv.get(a, 0) + c
        n1v[a] = n1v.get(a, 0) + 1
        n1w[b] = n1w.get(b, 0) + 1

    def p_kn(a, b):
        return (tcnt[(a, b)] - KN_DISCOUNT) / cv[a] + (
            KN_DISCOUNT * n1v[a] / cv[a]
        ) * (n1w[b] / len(tcnt))

    # identical discounted term: c(q,w)=c(p,f)=1, cv[q]=cv[p]=1,
    # n1v[q]=n1v[p]=1 — only the continuation count differs
    assert tcnt[("q", "w")] == tcnt[("p", "f")] == 1
    assert cv["q"] == cv["p"] and n1v["q"] == n1v["p"]
    assert n1w["w"] > n1w["f"]
    assert p_kn("q", "w") > p_kn("p", "f")
    # and the operator runs end-to-end on this corpus
    out = kneser_ney_source_scores(docs).collect()
    assert len(out) == 1 and out[0]["n_bigrams"] == len(bigrams)


# ------------------------------------------------------------- jl1
def test_jl_recall_report_matches_numpy(spark, sf_dir):
    """jl_recall_report == an independent numpy replay of the whole
    pipeline: 1e6-quantized full-space cosine ranking, md5-derived
    integer projection at 1e3 quantization, projected-space ranking,
    and the recall/ranked-list rollup — including the (cosine DESC, id
    ASC) tie order on both sides."""
    import numpy as np

    from etl_oms_spark.operators.similarity import (
        JL_QUANT,
        jl_components,
        jl_recall_report,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    vecs = np.array([rows[i]["embedding"] for i in order], dtype=np.float64)

    def half_away(a, scale):
        return np.sign(a) * np.floor(np.abs(a) * scale + 0.5)

    k, m, qids = 10, 16, [0, 1, 2]

    def topk(mat):
        """ranked id lists per query under (cosine DESC, id ASC)."""
        out = {}
        norms = np.sqrt((mat * mat).sum(axis=1))
        for q in qids:
            qi = int(np.nonzero(ids == q)[0][0])
            cos = (mat @ mat[qi]) / (norms * norms[qi])
            ranked = sorted(zip(-cos, ids))[:k]
            out[q] = [int(i) for _, i in ranked]
        return out

    q6 = half_away(vecs, 1e6)
    full = topk(q6)
    comp = np.array(jl_components(m, vecs.shape[1]), dtype=np.float64)
    proj = half_away(vecs, JL_QUANT) @ comp.T
    projected = topk(proj)

    got = jl_recall_report(emb, qids, m=m, k=k).collect()
    assert [r["query_id"] for r in got] == qids
    for r in got:
        q = r["query_id"]
        assert r["full_top"] == ",".join(map(str, full[q])), q
        assert r["proj_top"] == ",".join(map(str, projected[q])), q
        assert r["recall_at_k"] == len(set(full[q]) & set(projected[q]))
        assert 0 <= r["recall_at_k"] <= k


def test_jl_components_deterministic_and_bounded():
    from etl_oms_spark.operators.similarity import jl_components

    a = jl_components(4, 8)
    b = jl_components(4, 8)
    assert a == b
    assert all(-1000 <= c < 1000 for row in a for c in row)
    # md5 namespacing: independent of hyperplane_components' constants
    from etl_oms_spark.operators.similarity import hyperplane_components

    assert a[0][0] != hyperplane_components(1, 1)[0][0]


# ------------------------------------------------------------- pj1c
def test_pj1c_refines_pj1_clusters(spark, sf_dir):
    """Capped clustering is a REFINEMENT of exact clustering: capped
    pairs ⊆ exact pairs ⇒ every pj1c cluster sits wholly inside one pj1
    cluster (splits allowed, merges impossible), and both cover the
    same... no — the capped doc set can only be a subset. Checked on
    sf0.001 documents end-to-end through the query functions."""
    import __spark_entry__ as entry_mod

    exact = entry_mod.pj1_prefix_jaccard(spark, sf_dir).toPandas()
    capped = entry_mod.pj1c_prefix_jaccard_capped(spark, sf_dir).toPandas()
    assert set(capped.doc_id) <= set(exact.doc_id)
    merged = capped.merge(exact, on="doc_id", suffixes=("_c", "_e"))
    # every capped cluster maps into exactly one exact cluster
    fanout = merged.groupby("cluster_id_c")["cluster_id_e"].nunique()
    assert (fanout == 1).all(), fanout[fanout > 1]


# ------------------------------------------------------------- uni2
def _brute_np(w: str, score: dict[str, int]) -> int | None:
    """Best-segmentation piece count by exhaustive enumeration (the DP's
    tie order); None if the word has no segmentation under the vocab."""

    def all_segs(w):
        if not w:
            yield []
            return
        for ln_ in range(1, min(UNI_MAX_PIECE, len(w)) + 1):
            head = w[:ln_]
            if head in score:
                for rest in all_segs(w[ln_:]):
                    yield [head] + rest

    best = None
    for segs in all_segs(w):
        key = (sum(score[p] for p in segs), -len(segs))
        if best is None or key > best[0]:
            best = (key, len(segs))
    return None if best is None else best[1]


def test_unigram_fertility_matches_brute(spark, sf_dir):
    """unigram_fertility (stacked-projection struct-greatest DP over
    distinct words) == an independent enumeration of every corpus
    word's best segmentation, aggregated per source — including the
    passthrough accounting for 1-char/>12-char/unsegmentable words."""
    from etl_oms_spark.operators.text import tokens
    from etl_oms_spark.operators.tokenize import unigram_fertility

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    score = _scores(_initial_vocab(_word_sample(docs)))
    tokw = (
        docs.select(F.col("source"), F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    np_cache: dict[str, int | None] = {}
    agg: dict[str, list[int]] = {}
    for r in tokw:
        w, n = r["w"], int(r["n"])
        if w not in np_cache:
            np_cache[w] = (
                _brute_np(w, score)
                if 2 <= len(w) <= UNI_MAX_WORD
                else None
            )
        np = np_cache[w]
        a = agg.setdefault(r["source"], [0, 0, 0])
        a[0] += n
        a[1] += n * (np if np is not None else 1)
        a[2] += n if np is None else 0
    expected = sorted(
        (s, v[0], v[1], v[2], v[1] / v[0]) for s, v in agg.items()
    )
    got = [
        (r["source"], r["n_words"], r["pieces"], r["passthrough"],
         r["fertility"])
        for r in unigram_fertility(docs).orderBy("source").collect()
    ]
    assert got == expected


def test_unigram_fertility_passthrough_classes(spark):
    """The three passthrough classes, pinned on a hand corpus: 1-char
    words, >UNI_MAX_WORD-char words, and words containing a character
    absent from the sample-derived vocabulary (needs >256 distinct
    words so one falls outside the sample). Each counts exactly one
    piece."""
    from etl_oms_spark.operators.tokenize import unigram_fertility

    # 256 alphabetically-first fillers monopolize the sample (all count
    # 1, tie order is word ASC); 'zÿz' sorts after every filler and
    # carries the only 'ÿ' in the corpus -> OOV passthrough
    fillers = [f"w{i:03d}" for i in range(256)]
    text = " ".join(fillers + ["zÿz", "a", "abcdefghijklm"])
    docs = spark.createDataFrame(
        [(0, text, "s1")], "doc_id long, text string, source string"
    )
    row = unigram_fertility(docs).collect()[0]
    assert row["n_words"] == 259
    # passthrough: 'zÿz' (OOV char), 'a' (1 char),
    # 'abcdefghijklm' (13 chars)
    assert row["passthrough"] == 3
    # fillers are in the sample; 4-char words over a vocab holding all
    # of them as whole pieces segment as one piece each
    assert row["pieces"] >= 259
    assert row["fertility"] == row["pieces"] / row["n_words"]


def test_pj1c_equals_pj1_on_clique_clusters(spark):
    """On clique-shaped duplicate clusters (every member pairwise ≥ t —
    the re-crawl regime per_token_cap exists for) the capped form loses
    NOTHING: same doc set, same cluster partition, same sizes, even
    when the cluster is far bigger than the cap."""
    from etl_oms_spark.operators.dedup import prefix_filtered_jaccard_pairs
    from etl_oms_spark.operators.graph import connected_components

    text_a = "alpha beta gamma delta epsilon zeta"
    text_b = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(i, text_a) for i in range(20)]
        + [(100 + i, text_b) for i in range(15)]
        + [(999, "lonely unique document nothing shared here")],
        "doc_id long, text string",
    )

    def cluster(cap):
        pairs = prefix_filtered_jaccard_pairs(
            docs, threshold=0.9, per_token_cap=cap
        ).select("id_a", "id_b")
        comp = connected_components(pairs)
        return {
            (int(r["id"]), int(r["component"]))
            for r in comp.collect()
        }

    assert cluster(None) == cluster(8)
