"""Round-10 late additions: the exact calibration scorecard (bs1) and
friends.

Parity strategy matches test_round10_ops.py: each expectation is
re-derived with an INDEPENDENT pure-Python computation (exact Fractions
here — no floor-division shortcuts), so a bug shared by the Spark
column algebra and its DuckDB oracle cannot cancel out.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from etl_oms_spark.operators.classifier import calibration_summary


def _brute_calibration(rows, n_bins=10, width=100_000):
    """Exact-rational replay of Murphy/ECE/MCE, floored to 1e-9 at the
    end (the operator floors each intermediate floor-division, so its
    quantized values may sit <= a few ulps BELOW these — the assertions
    bound that residue instead of demanding equality where the contract
    allows slack, and demand equality where the operator's arithmetic
    is a single floor)."""
    n = len(rows)
    p = sum(pos for _, pos in rows)
    bins = {}
    for sq, pos in rows:
        b = min(max(sq // width, 0), n_bins - 1)
        bins.setdefault(b, []).append((sq, pos))
    brier = Fraction(
        sum((sq - pos * 10**6) ** 2 for sq, pos in rows), n * 10**12
    )
    ece = Fraction(0)
    mce = Fraction(0)
    rel = Fraction(0)
    res = Fraction(0)
    obar = Fraction(p, n)
    for b, members in bins.items():
        nk = len(members)
        pk = sum(pos for _, pos in members)
        fk = Fraction(sum(sq for sq, _ in members), nk * 10**6)
        ok = Fraction(pk, nk)
        ece += Fraction(nk, n) * abs(fk - ok)
        mce = max(mce, abs(fk - ok))
        rel += Fraction(nk, n) * (fk - ok) ** 2
        res += Fraction(nk, n) * (ok - obar) ** 2
    unc = obar * (1 - obar)
    q = lambda x: int(x * 10**9)  # floor at 1e-9
    return {
        "n": n,
        "n_pos": p,
        "brier_q9": q(brier),
        "ece_q9": q(ece),
        "mce_q9": q(mce),
        "rel_q9": q(rel),
        "res_q9": q(res),
        "unc_q9": q(unc),
    }


ROWS = [
    (50_000, 0),     # bin 0
    (100_000, 0),    # bin 1
    (150_000, 1),    # bin 1
    (950_000, 1),    # bin 9
    (1_000_000, 1),  # bin 9 (sq // width = 10, clamped to 9)
]


def test_calibration_summary_hand_values(spark):
    got = (
        calibration_summary(
            spark.createDataFrame(ROWS, "sq long, pos int")
        )
        .collect()[0]
        .asDict()
    )
    # hand-derived (see the bin walk-through in the operator docstring
    # review): N=5, P=3; d_0=50000, d_1=-750000, d_9=-50000
    assert got["n"] == 5 and got["n_pos"] == 3
    assert got["brier_q9"] == 147_500_000          # 0.1475
    assert got["ece_q9"] == 170_000_000            # 0.17
    assert got["mce_q9"] == 375_000_000            # 0.375 (bin 1)
    assert got["rel_q9"] == 57_000_000             # 0.057
    assert got["res_q9"] == 140_000_000            # 0.14
    assert got["unc_q9"] == 240_000_000            # 6/25
    assert got["brier"] == got["brier_q9"] / 1e9
    assert got["ece"] == got["ece_q9"] / 1e9


def test_calibration_summary_vs_exact_rationals(spark):
    """Fraction replay on a messier distribution: operator values must
    sit within n_bins ulps BELOW the exact rational floor (each bin
    contributes at most one unit of floor loss to the scaled sums) and
    never above."""
    rows = [
        (37_123, 0), (91_004, 1), (120_000, 0), (433_921, 1),
        (433_921, 0), (455_500, 1), (680_003, 1), (680_003, 1),
        (999_999, 0), (1_000_000, 1), (3, 0), (750_000, 1),
    ]
    want = _brute_calibration(rows)
    got = (
        calibration_summary(spark.createDataFrame(rows, "sq long, pos int"))
        .collect()[0]
        .asDict()
    )
    assert got["n"] == want["n"] and got["n_pos"] == want["n_pos"]
    # single-floor quantities: exact
    assert got["brier_q9"] == want["brier_q9"]
    assert got["ece_q9"] == want["ece_q9"]
    assert got["mce_q9"] == want["mce_q9"]
    # double-floor quantities: bounded residue, never above
    for k in ("rel_q9", "res_q9", "unc_q9"):
        assert want[k] - 10 <= got[k] <= want[k], (k, got[k], want[k])


def test_calibration_perfect_classifier(spark):
    """A perfectly calibrated, perfectly sharp classifier: brier = rel
    = ece = mce = 0 and resolution equals uncertainty."""
    rows = [(0, 0)] * 3 + [(1_000_000, 1)] * 2
    got = (
        calibration_summary(spark.createDataFrame(rows, "sq long, pos int"))
        .collect()[0]
        .asDict()
    )
    assert got["brier_q9"] == 0 and got["ece_q9"] == 0
    assert got["mce_q9"] == 0 and got["rel_q9"] == 0
    # res = unc = (2/5)(3/5) = 0.24
    assert got["res_q9"] == got["unc_q9"] == 240_000_000


# ---------------------------------------------------------------- ct1
def _brute_cavnar_trenkle(docs, p=20):
    """Independent pure-Python Cavnar-Trenkle replay: dict counting +
    explicit sorts, no window functions, no base+correction algebra."""
    import re
    from collections import Counter, defaultdict

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    def tris(t):
        n = norm(t)
        return [n[i : i + 3] for i in range(len(n) - 2)]

    def profile(counter, p):
        ranked = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:p]
        return {tri: i + 1 for i, (tri, _) in enumerate(ranked)}

    lang_counts = defaultdict(Counter)
    for _, lang, text in docs:
        lang_counts[lang].update(tris(text))
    lang_prof = {l: profile(c, p) for l, c in lang_counts.items()}
    conf = Counter()
    for _, lang, text in docs:
        dp = profile(Counter(tris(text)), p)
        if not dp:
            continue
        best = None
        for cand in sorted(lang_prof):
            d = sum(
                abs(rd - lang_prof[cand][tri]) if tri in lang_prof[cand] else p
                for tri, rd in dp.items()
            )
            if best is None or d < best[0]:
                best = (d, cand)
        conf[(lang, best[1])] += 1
    return dict(conf)


def test_rank_langid_vs_brute(spark):
    from etl_oms_spark.operators.text import rank_langid_confusion

    docs = [
        (1, "en", "the cat and the dog sat on the mat and the log"),
        (2, "en", "a hash join of the tables is in the plan and it is fast"),
        (3, "fr", "le chat et le chien sont sur le tapis et le lit"),
        (4, "fr", "la jointure des tables est dans le plan et elle est vite"),
        (5, "de", "die katze und der hund sitzen auf der matte und dem holz"),
        (6, "de", "der verbund der tabellen ist im plan und er ist schnell"),
        (7, "en", "it is the log of the cat"),
        (8, "fr", "xy"),  # < 3 normalized chars: unclassifiable, excluded
    ]
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in rank_langid_confusion(
            spark.createDataFrame(docs, "doc_id long, lang string, text string")
        ).collect()
    }
    want = _brute_cavnar_trenkle(docs)
    assert got == want
    assert sum(got.values()) == 7  # doc 8 excluded


def test_rank_langid_tie_breaks(spark):
    """Equal distance to two languages must pick the lang-ASC winner on
    both the operator and brute paths (two identical one-doc corpora)."""
    from etl_oms_spark.operators.text import rank_langid_confusion

    docs = [
        (1, "bb", "identical text body"),
        (2, "aa", "identical text body"),
    ]
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in rank_langid_confusion(
            spark.createDataFrame(docs, "doc_id long, lang string, text string")
        ).collect()
    }
    assert got == {("aa", "aa"): 1, ("bb", "aa"): 1}
    assert got == _brute_cavnar_trenkle(docs)


# ---------------------------------------------------------------- pt1
def test_prototype_prune_flags(spark):
    """Drop count is floor(n/4) exactly; rank order is (dist2 ASC, id
    ASC) so equal distances break toward the lower id."""
    from etl_oms_spark.operators.clustering import prototype_prune

    rows = [
        # cluster 0: n=5 -> floor(5/4)=1 dropped; tie at dist2=10
        # between ids 3 and 7 -> id 3 is rank 1 (dropped)
        (3, 0, 10), (7, 0, 10), (1, 0, 50), (9, 0, 60), (4, 0, 70),
        # cluster 1: n=3 -> floor(3/4)=0 dropped
        (2, 1, 5), (6, 1, 6), (8, 1, 7),
        # cluster 2: n=4 -> 1 dropped
        (10, 2, 100), (11, 2, 1), (12, 2, 2), (13, 2, 3),
    ]
    flags = prototype_prune(
        spark.createDataFrame(rows, "vec_id long, cluster int, dist2 long")
    )
    dropped = {
        r["vec_id"] for r in flags.filter("dropped").collect()
    }
    assert dropped == {3, 11}
    got = {
        (r["cluster"], r["vec_id"]): (r["rn"], r["n"], r["dropped"])
        for r in flags.collect()
    }
    assert got[(0, 3)] == (1, 5, True)
    assert got[(0, 7)] == (2, 5, False)
    assert all(not d for (c, _), (_, n, d) in got.items() if c == 1)


def test_prototype_prune_vs_brute_on_kmeans(spark):
    """End-to-end on the real embeddings table at sf0.001: replay the
    flag decision in pure Python from the engine's own assignment (the
    assignment itself is pinned exact by test_clustering's kmeans
    parity), then compare the pt1 summary aggregates."""
    from etl_oms_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        prototype_prune,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = kmeans_assign(emb, kmeans_fit(emb, k=8, n_iter=2))
    rows = [
        (r["vec_id"], r["cluster"], r["dist2"])
        for r in assigned.collect()
    ]
    by_cluster = {}
    for vid, c, d in rows:
        by_cluster.setdefault(c, []).append((d, vid))
    want = {}
    for c, members in by_cluster.items():
        members.sort()
        k = len(members) // 4
        drop = members[:k]
        keep = members[k:]
        want[c] = (
            len(members),
            k,
            max((d for d, _ in drop), default=-1),
            min(d for d, _ in keep),
        )
    got = {
        r["cluster"]: (
            r["n"], r["n_dropped"], r["max_dropped_dist2"],
            r["min_kept_dist2"],
        )
        for r in prototype_prune(assigned)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("dropped").cast("long")).alias("n_dropped"),
            F.coalesce(
                F.max(F.when(F.col("dropped"), F.col("dist2"))), F.lit(-1)
            ).alias("max_dropped_dist2"),
            F.min(F.when(~F.col("dropped"), F.col("dist2"))).alias(
                "min_kept_dist2"
            ),
        )
        .collect()
    }
    assert got == want


# --------------------------------------------------------------- prf1
def test_prf_expansion_vs_python_replay(spark):
    """Replay the RM3 weight contract in pure Python: BM25 feedback
    scores come from the engine's bm25_scores (itself parity-pinned in
    test_search.py); the feedback-doc choice, (tf·score_q)//dl
    flooring, own-term exclusion and (w DESC, term ASC) ranking are all
    re-derived independently with dict counting."""
    import re
    from collections import Counter

    from etl_oms_spark.operators.search import bm25_scores, prf_expansion

    docs = [
        (1, "spark join join hash plan with the big table scan"),
        (2, "hash join build side is the small broadcast table"),
        (3, "sort merge join spills when the hash table is big"),
        (4, "a totally unrelated document about cats and pianos"),
        (5, "scan pruning and join reordering in the plan optimizer"),
        (6, "hash partitioning of the join keys avoids the skew"),
    ]
    queries = [("qa", ("join", "hash")), ("qb", ("zzz_nohit",))]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = [
        (r["qid"], r["term"], r["w_q"], r["rnk"])
        for r in prf_expansion(df, queries, k_docs=2, k_terms=4).collect()
    ]

    def norm_tokens(t):
        return re.sub(r"\s+", " ", t.strip().lower()).split(" ")

    scores = {
        r["doc_id"]: r["score_q"]
        for r in bm25_scores(df, ["join", "hash"]).collect()
    }
    fb = sorted(scores, key=lambda d: (-scores[d], d))[:2]
    w = Counter()
    texts = dict(docs)
    for d in fb:
        toks = norm_tokens(texts[d])
        dl = len(toks)
        for term, tf in Counter(toks).items():
            if term in ("join", "hash"):
                continue
            w[term] += (tf * scores[d]) // dl
    ranked = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    want = [("qa", t, wq, i + 1) for i, (t, wq) in enumerate(ranked)]
    assert got == want  # qb has no candidates -> no rows


def test_prf_expansion_excludes_query_terms(spark):
    from etl_oms_spark.operators.search import prf_expansion

    df = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "alpha gamma gamma delta")],
        "doc_id long, text string",
    )
    out = prf_expansion(df, [("q", ("alpha",))], k_docs=2, k_terms=10)
    terms = {r["term"] for r in out.collect()}
    assert "alpha" not in terms
    assert terms == {"beta", "gamma", "delta"}


# --------------------------------------------------------------- mmr1
def _mmr_greedy_replay(vecs, qid, k_cand, k_select, lam):
    """Independent pure-Python MMR greedy: quantized scores recomputed
    from scratch (math.sqrt + floor), sequential selection."""
    import math

    def q(x):
        return round(float(x) * 1e6)

    def cos_q9(a, b):
        qa, qb = [q(x) for x in a], [q(x) for x in b]
        dot = sum(x * y for x, y in zip(qa, qb))
        na = sum(x * x for x in qa)
        nb = sum(y * y for y in qb)
        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e9 + 0.5)

    rel = {vid: cos_q9(v, vecs[qid]) for vid, v in vecs.items()}
    cand = sorted(rel, key=lambda d: (-rel[d], d))[:k_cand]
    sel, want = [], []
    for rank in range(1, k_select + 1):
        best = None
        for c in cand:
            if c in [s for s, _ in sel]:
                continue
            pen = max(
                (cos_q9(vecs[c], vecs[s]) for s, _ in sel), default=None
            )
            mmr = (
                lam * rel[c]
                if pen is None
                else lam * rel[c] - (10 - lam) * pen
            )
            if best is None or (mmr, -c) > (best[1], -best[0]):
                best = (c, mmr)
        sel.append(best)
        want.append((rank, best[0], rel[best[0]], best[1]))
    return want


_MMR_VECS = {
    0: [1.0, 0.0, 0.0, 0.0],     # query
    11: [0.99, 0.14, 0.0, 0.0],  # very relevant
    12: [0.99, 0.141, 0.0, 0.0],  # near-dup of 11
    13: [0.6, 0.0, 0.8, 0.0],    # less relevant, diverse
    14: [0.58, 0.0, 0.0, 0.81],  # less relevant, diverse
    15: [-1.0, 0.0, 0.0, 0.0],   # anti-relevant
}


def _mmr_spark(spark, lam):
    from etl_oms_spark.operators.similarity import mmr_topk

    df = spark.createDataFrame(
        [(k, v) for k, v in _MMR_VECS.items()],
        "vec_id long, embedding array<float>",
    )
    query = df.filter("vec_id = 0").selectExpr(
        "vec_id as query_id", "embedding"
    )
    return [
        (r["rank"], r["vec_id"], r["rel_q9"], r["mmr_q9"])
        for r in mmr_topk(
            df, query, k_cand=6, k_select=3, lam_tenths=lam
        ).collect()
    ]


def test_mmr_topk_vs_greedy_replay_lambda7(spark):
    assert _mmr_spark(spark, 7) == _mmr_greedy_replay(_MMR_VECS, 0, 6, 3, 7)


def test_mmr_topk_redundancy_penalty_bites(spark):
    """At λ=0.5 the redundancy term dominates a near-duplicate: pure
    relevance order is 0, 12, 11 but MMR must skip the second near-dup
    (sim ≈ 1 makes its penalized score negative) in favor of the
    diverse doc 13 — and the engine must agree with the replay."""
    got = _mmr_spark(spark, 5)
    assert got == _mmr_greedy_replay(_MMR_VECS, 0, 6, 3, 5)
    picked = [v for _, v, _, _ in got]
    assert picked[0] == 0
    assert not {11, 12} <= set(picked)
    assert 13 in picked


# ---------------------------------------------------------------- wf1
def _brute_winnow(text, k=4, w=4):
    """Independent winnowing replay: explicit window loop over md5
    k-gram hashes, min with rightmost tie-break, full windows only."""
    import hashlib
    import re

    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    ]
    sel = set()
    for start in range(len(hs) - w + 1):
        window = hs[start : start + w]
        m = min(window)
        # rightmost occurrence of the min
        off = max(i for i, h in enumerate(window) if h == m)
        sel.add((start + off, m))
    return sel


def test_winnow_fingerprints_vs_brute(spark):
    from etl_oms_spark.operators.dedup import winnow_fingerprints

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs and more jugs"),
        (3, "a b c"),  # < w+k-1 tokens: no full window, no fingerprints
    ]
    got = {
        (r["doc_id"], r["pos"], r["h"])
        for r in winnow_fingerprints(
            spark.createDataFrame(texts, "doc_id long, text string")
        ).collect()
    }
    want = {
        (d, pos, h)
        for d, t in texts
        for pos, h in _brute_winnow(t)
    }
    assert got == want
    assert not any(d == 3 for d, _, _ in got)


def test_winnow_guarantee_shared_substring(spark):
    """The winnowing guarantee: two documents sharing a run of at least
    w+k-1 = 7 tokens must share at least one fingerprint, and
    winnow_match_pairs must surface the pair when >= min_shared."""
    from etl_oms_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        (1, "one two three " + shared + " four five six"),
        (2, shared + " totally different suffix words here"),
        (3, "unrelated content with no overlap at all whatsoever okay"),
    ]
    fps = winnow_fingerprints(
        spark.createDataFrame(texts, "doc_id long, text string")
    )
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    assert by_doc[1] & by_doc[2], "guarantee violated: no shared fingerprint"
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_match_pairs(fps, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnow_max_df_drops_ubiquitous(spark):
    """A fingerprint present in every document must be excluded from
    pairing when max_df is below the corpus size."""
    from etl_oms_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    boiler = "standard footer text appears in every document here"
    texts = [(i, f"doc {i} unique words u{i} v{i} " + boiler) for i in range(1, 5)]
    fps = winnow_fingerprints(
        spark.createDataFrame(texts, "doc_id long, text string")
    )
    with_cap = winnow_match_pairs(fps, max_df=3, min_shared=1).count()
    without_cap = winnow_match_pairs(fps, max_df=64, min_shared=1).count()
    assert without_cap == 6  # all C(4,2) pairs share the boilerplate
    assert with_cap < without_cap


# --------------------------------------------------------------- ari1
def _brute_agreement(pairs):
    """Independent ARI/MI replay: Fractions for ARI (exact, truncated
    toward zero at 1e-9 like DuckDB //), math.log doubles for MI/H."""
    import math
    from collections import Counter

    n = len(pairs)
    ct = Counter(pairs)
    a = Counter(c for c, _ in pairs)
    b = Counter(l for _, l in pairs)
    sidx2 = sum(v * (v - 1) for v in ct.values())
    sa2 = sum(v * (v - 1) for v in a.values())
    sb2 = sum(v * (v - 1) for v in b.values())
    big2 = n * (n - 1)
    num = 2 * big2 * sidx2 - 2 * sa2 * sb2
    den = big2 * (sa2 + sb2) - 2 * sa2 * sb2
    if den == 0:
        ari_q9 = 10**9
    else:
        q = Fraction(num * 10**9, den)
        ari_q9 = math.floor(q) if q >= 0 else -math.floor(-q)  # trunc
    mi_s = sum(
        math.floor(
            v * math.log(n * v / (a[c] * b[l])) * 1e9 + 0.5
        )
        for (c, l), v in ct.items()
    )
    h = lambda cnt: sum(
        math.floor(-(v * math.log(v / n)) * 1e9 + 0.5) for v in cnt.values()
    )
    return {
        "n": n,
        "ari_q9": ari_q9,
        "mi_q9": max(mi_s, 0) // n,
        "h_cluster_q9": h(a) // n,
        "h_label_q9": h(b) // n,
    }


def _run_agreement(spark, pairs):
    from etl_oms_spark.operators.clustering import cluster_label_agreement

    assigned = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(pairs)], "vec_id long, cluster int"
    )
    labels = spark.createDataFrame(
        [(i, l) for i, (_, l) in enumerate(pairs)], "vec_id long, label int"
    )
    return cluster_label_agreement(assigned, labels).collect()[0].asDict()


def test_cluster_agreement_vs_brute(spark):
    pairs = [
        (0, 1), (0, 1), (0, 1), (0, 2),
        (1, 2), (1, 2), (1, 1),
        (2, 3), (2, 3), (2, 3), (2, 3), (2, 1),
    ]
    got = _run_agreement(spark, pairs)
    want = _brute_agreement(pairs)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    assert got["n_clusters"] == 3 and got["n_labels"] == 3


def test_cluster_agreement_degenerate_single_partition(spark):
    """Single cluster AND single label (ADVICE r10): den = 0 pins
    ari_q9 = 1e9, and both entropies are 0 so nmi is pinned to 1.0
    (not NaN) — mirrored by the CASE in ARI1_SQL."""
    got = _run_agreement(spark, [(0, 1), (0, 1), (0, 1)])
    assert got["ari_q9"] == 10**9
    assert got["mi_q9"] == got["h_cluster_q9"] == got["h_label_q9"] == 0
    assert got["nmi"] == 1.0


def test_cluster_agreement_perfect_and_negative(spark):
    # perfect agreement: ARI = 1, MI = H(cluster) = H(label)
    perfect = [(c, c) for c in (0, 0, 1, 1, 1, 2)]
    got = _run_agreement(spark, perfect)
    assert got["ari_q9"] == 10**9
    assert got["mi_q9"] == got["h_cluster_q9"] == got["h_label_q9"]
    assert abs(got["nmi"] - 1.0) < 1e-9
    # worse-than-chance: a checkerboard split — ARI must go NEGATIVE
    # and match the truncation-toward-zero brute value exactly
    neg = [(0, 1), (0, 2), (0, 1), (0, 2), (1, 1), (1, 2), (1, 1), (1, 2)]
    got = _run_agreement(spark, neg)
    want = _brute_agreement(neg)
    assert got["ari_q9"] == want["ari_q9"]
    assert got["ari_q9"] < 0


def test_cluster_agreement_on_real_kmeans(spark):
    """End-to-end on sf0.001 embeddings: replay from the engine's own
    assignment (kmeans itself parity-pinned in test_clustering)."""
    from etl_oms_spark.operators.clustering import (
        cluster_label_agreement,
        kmeans_assign,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = kmeans_assign(emb, kmeans_fit(emb, k=8, n_iter=2))
    pairs = [
        (r["cluster"], r["label"])
        for r in assigned.join(emb.select("vec_id", "label"), "vec_id")
        .select("cluster", "label")
        .collect()
    ]
    got = (
        cluster_label_agreement(assigned, emb.select("vec_id", "label"))
        .collect()[0]
        .asDict()
    )
    want = _brute_agreement(pairs)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


# ---------------------------------------------------------------- fk1
def _brute_fleiss(ratings, n):
    """Exact-rational Fleiss kappa replay (one (item, cat) per rating),
    truncated toward zero at 1e-9 like the engines."""
    import math
    from collections import Counter

    per_item = Counter()
    nij = Counter(ratings)
    ni = Counter(i for i, _ in ratings)
    kept = {i for i, c in ni.items() if c == n}
    n_items = len(kept)
    ssq = sum(v * v for (i, _), v in nij.items() if i in kept)
    bj = Counter()
    for (i, c), v in nij.items():
        if i in kept:
            bj[c] += v
    e = sum(v * v for v in bj.values())
    a = ssq - n_items * n
    d1 = n_items * n * (n - 1)
    d2 = (n_items * n) ** 2
    trunc = lambda num, den: (
        math.floor(Fraction(num, den))
        if num >= 0
        else -math.floor(Fraction(-num, den))
    )
    num = a * d2 - e * d1
    den = d1 * (d2 - e)
    return {
        "n_items": n_items,
        "n_excluded": len(ni) - n_items,
        "p_bar_q9": trunc(a * 10**9, d1),
        "p_e_q9": trunc(e * 10**9, d2),
        "kappa_q9": 10**9 if den == 0 else trunc(num * 10**9, den),
    }


def _run_fleiss(spark, ratings, n):
    from etl_oms_spark.operators.classifier import fleiss_kappa

    df = spark.createDataFrame(ratings, "item_id long, category string")
    return fleiss_kappa(df, n_raters=n).collect()[0].asDict()


def test_fleiss_kappa_textbook_example(spark):
    """Fleiss 1971's worked example (14 items, 5 categories... too big
    to inline) is replaced by a small hand case with known value:
    2 items, 2 raters, perfect agreement on different categories ->
    P_bar = 1, P_e = 0.5, kappa = 1."""
    ratings = [(1, "a"), (1, "a"), (2, "b"), (2, "b")]
    got = _run_fleiss(spark, ratings, 2)
    assert got["p_bar_q9"] == 10**9
    assert got["p_e_q9"] == 500_000_000
    assert got["kappa_q9"] == 10**9


def test_fleiss_kappa_vs_brute(spark):
    ratings = (
        [(1, "a"), (1, "a"), (1, "b")]
        + [(2, "b"), (2, "b"), (2, "b")]
        + [(3, "a"), (3, "c"), (3, "b")]
        + [(4, "c"), (4, "c"), (4, "a")]
        + [(5, "a"), (5, "a"), (5, "a")]
        + [(6, "b")]  # one rating only: excluded at n=3
    )
    got = _run_fleiss(spark, ratings, 3)
    want = _brute_fleiss(ratings, 3)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    assert got["n_excluded"] == 1


def test_fleiss_kappa_negative_and_degenerate(spark):
    # systematic DISagreement: 2 raters always split -> P_bar = 0,
    # kappa negative (worse than chance)
    ratings = [(i, c) for i in range(1, 7) for c in ("a", "b")]
    got = _run_fleiss(spark, ratings, 2)
    want = _brute_fleiss(ratings, 2)
    assert got["kappa_q9"] == want["kappa_q9"] < 0
    assert got["p_bar_q9"] == 0
    # degenerate: every rating one category -> P_e = 1, pinned kappa = 1
    ratings = [(i, "a") for i in range(1, 5) for _ in range(2)]
    got = _run_fleiss(spark, ratings, 2)
    assert got["kappa_q9"] == 10**9 and got["p_e_q9"] == 10**9


# --------------------------------------------------------------- mwu1
def _brute_mwu(pairs):
    """Independent Mann-Whitney replay: explicit sorted rank
    assignment with average ranks for ties (no histogram algebra),
    doubled to stay integral, z from the tie-corrected normal
    approximation."""
    import math

    ranked = sorted(range(len(pairs)), key=lambda i: pairs[i][0])
    r2 = [0] * len(pairs)  # doubled ranks
    i = 0
    while i < len(ranked):
        j = i
        while (
            j + 1 < len(ranked)
            and pairs[ranked[j + 1]][0] == pairs[ranked[i]][0]
        ):
            j += 1
        avg2 = (i + 1) + (j + 1)  # 2 * average rank of the tie block
        for k in range(i, j + 1):
            r2[ranked[k]] = avg2
        i = j + 1
    n_a = sum(1 for _, pos in pairs if pos)
    n_b = len(pairs) - n_a
    n = len(pairs)
    r2a = sum(r for (_, pos), r in zip(pairs, r2) if pos)
    u2 = r2a - n_a * (n_a + 1)
    from collections import Counter

    ties = sum(c**3 - c for c in Counter(v for v, _ in pairs).values())
    var_num = n_a * n_b * (n**3 - n - ties)
    if var_num == 0:
        z_q6 = 0
    else:
        var = var_num / (12 * n * (n - 1))
        z = (u2 - n_a * n_b) / (2 * math.sqrt(var))
        z_q6 = math.floor(z * 1e6 + 0.5)
    return {
        "n_a": n_a, "n_b": n_b, "u2_a": u2, "ties_cubed": ties,
        "z_q6": z_q6,
    }


def _run_mwu(spark, pairs):
    from collections import Counter

    import __spark_entry__ as entry_mod

    hist = Counter()
    for v, pos in pairs:
        hist[v] = (hist[v][0] + pos, hist[v][1] + (1 - pos)) if v in hist else (pos, 1 - pos)
    rows = [(v, a, b) for v, (a, b) in sorted(hist.items())]
    df = spark.createDataFrame(rows, "sq long, n_pos long, n_neg long")
    return entry_mod.mann_whitney_from_hist(df).collect()[0].asDict()


def test_mann_whitney_vs_explicit_ranks(spark):
    pairs = [
        (10, 1), (10, 0), (10, 1), (25, 0), (25, 0), (40, 1),
        (40, 1), (40, 1), (40, 0), (55, 0), (70, 1), (70, 0),
        (85, 1), (99, 0), (99, 0), (99, 0),
    ]
    got = _run_mwu(spark, pairs)
    want = _brute_mwu(pairs)
    assert got == want


def test_mann_whitney_shifted_distributions(spark):
    """A clearly shifted positive group must give a large positive z;
    swapping the groups must negate U's direction symmetrically
    (U_A + U_B = 2*n_a*n_b in doubled units)."""
    pairs = [(100 + i, 1) for i in range(20)] + [(i, 0) for i in range(20)]
    got = _run_mwu(spark, pairs)
    want = _brute_mwu(pairs)
    assert got == want
    assert got["z_q6"] > 5_000_000  # z > 5
    assert got["u2_a"] == 2 * 20 * 20  # all positives above: U_A = n_a*n_b
    flipped = [(v, 1 - p) for v, p in pairs]
    got_f = _run_mwu(spark, flipped)
    assert got_f["u2_a"] == 0
    assert got_f["z_q6"] == -got["z_q6"]


def test_mann_whitney_degenerate_all_tied(spark):
    pairs = [(7, 1)] * 4 + [(7, 0)] * 5
    got = _run_mwu(spark, pairs)
    assert got["z_q6"] == 0  # var_num = 0 pin
    assert got["ties_cubed"] == 9**3 - 9
