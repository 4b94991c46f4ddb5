"""Round-11 operator tests: ct1p (bounded-prefix Cavnar-Trenkle langid)
and the other round-11 additions, each replayed by an independent brute
path like the round-10 suites."""

from __future__ import annotations

import re


def _norm(t):
    return re.sub(r"\s+", " ", t.strip().lower())


def _brute_ct(docs, p=20):
    """Pure-Python Cavnar-Trenkle replay (dict counting + explicit
    sorts), shared by the full and prefix forms — the prefix form feeds
    pre-truncated text in."""
    from collections import Counter, defaultdict

    def tris(t):
        n = _norm(t)
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


def _run_langid(spark, docs, **kw):
    from etl_oms_spark.operators.text import rank_langid_confusion

    return {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in rank_langid_confusion(
            spark.createDataFrame(docs, "doc_id long, lang string, text string"),
            **kw,
        ).collect()
    }


DOCS = [
    (1, "en", "the cat and the dog sat on the mat and the log"),
    (2, "en", "a hash join of the tables is in the plan and it is fast"),
    (3, "fr", "le chat et le chien sont sur le tapis et le lit"),
    (4, "fr", "la jointure des tables est dans le plan et elle est vite"),
    (5, "de", "die katze und der hund sitzen auf der matte und dem holz"),
    (6, "de", "der verbund der tabellen ist im plan und er ist schnell"),
    (7, "en", "it is the log of the cat"),
    (8, "fr", "xy"),  # < 3 normalized chars: unclassifiable, excluded
]


def test_rank_langid_prefix_vs_brute(spark):
    """prefix_chars=12 actually bites on every DOCS entry; the brute
    replay truncates the NORMALIZED text the same way (the brute tris()
    re-normalizes, mirroring the operator's trigram builder)."""
    p = 12
    got = _run_langid(spark, DOCS, prefix_chars=p)
    want = _brute_ct([(i, l, _norm(t)[:p]) for i, l, t in DOCS])
    assert got == want
    assert sum(got.values()) == 7


def test_rank_langid_prefix_trailing_space_cut(spark):
    """A cut that lands right after a word ('the cat...' at 4 -> 'the ')
    must classify on the re-trimmed 'the': same confusion cell as
    feeding 'the' directly, and no phantom ' th'/'he ' trigrams from a
    doc whose prefix is shorter than a trigram after the trim."""
    docs = [
        (1, "en", "the cat and the dog"),
        (2, "en", "the dog and the cat"),
        (3, "fr", "le chat et le chien"),
    ]
    got = _run_langid(spark, docs, prefix_chars=4)
    want = _brute_ct([(i, l, _norm(t)[:4]) for i, l, t in docs])
    assert got == want
    # cuts that leave < 3 chars after the re-trim are excluded:
    # 'xy zabc'[:3] = 'xy ' -> 'xy', and 'le chat'[:3] = 'le ' -> 'le'
    # — only the two 'the'-prefixed docs survive at prefix 3
    docs2 = docs + [(4, "de", "xy zabc")]
    got2 = _run_langid(spark, docs2, prefix_chars=3)
    want2 = _brute_ct([(i, l, _norm(t)[:3]) for i, l, t in docs2])
    assert got2 == want2
    assert sum(got2.values()) == 2


def test_rank_langid_prefix_noop_when_longer_than_text(spark):
    """A prefix longer than every document is exactly the full form."""
    assert _run_langid(spark, DOCS, prefix_chars=10_000) == _run_langid(
        spark, DOCS
    )


def test_ct1p_matches_ct1_accuracy_envelope(spark):
    """On the sf0.001 documents the 400-char prefix must classify the
    SAME universe and land within 10% diagonal mass of full-document
    ct1. The synthetic corpus's language signal is weak (langs share a
    generator vocabulary), so this is a coarse regression pin — the
    measured deltas (sf0.001: prefix 149 vs full 129 of 500 — the
    prefix is slightly MORE accurate, full-document profiles dilute
    into shared boilerplate) are recorded in SCALING.md."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    full = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in entry_mod.ct1_rank_langid(spark, sf).collect()
    }
    pref = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in entry_mod.ct1p_rank_langid_prefix(spark, sf).collect()
    }
    n = sum(full.values())
    assert sum(pref.values()) == n  # same classifiable universe
    diag_full = sum(v for (t, p), v in full.items() if t == p)
    diag_pref = sum(v for (t, p), v in pref.items() if t == p)
    assert abs(diag_full - diag_pref) <= n // 10, (diag_full, diag_pref, n)
    assert diag_pref >= diag_full - n // 50  # prefix must not LOSE accuracy


def test_ct1p_plan_profiles_broadcast_no_smj(spark):
    """ct1p keeps ct1's pinned plan shape: profiles broadcast, zero
    SortMergeJoin — the truncation must not perturb the join strategy."""
    import __spark_entry__ as entry_mod

    plan = (
        entry_mod.ct1p_rank_langid_prefix(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "broadcasthashjoin" in plan
    assert "sortmergejoin" not in plan


# ------------------------------------------------------------- uniT2
def _brute_em_multi(sample, schedule):
    """Independent multi-round hard-EM replay built on the round-10
    suite's exhaustive-enumeration segmenter (no DP): initial LM, then
    per round — enumerate-segment, prune multi-char to the round's
    budget, floor every ORIGINAL single char at max(usage, 1),
    re-quantize — then a final enumeration re-segmentation."""
    from tests_round10_helpers import brute_usage, initial_vocab, scores

    vocab0 = initial_vocab(sample)
    singles = [p for p in vocab0 if len(p) == 1]
    score = scores(vocab0)
    usage_init = None
    vocab = vocab0
    for keep in schedule:
        usage = brute_usage(sample, score)
        if usage_init is None:
            usage_init = usage
        multi = sorted(
            ((p, u) for p, u in usage.items() if len(p) >= 2),
            key=lambda t: (-t[1], t[0]),
        )[:keep]
        vocab = dict(multi)
        vocab.update({p: max(usage.get(p, 0), 1) for p in singles})
        score = scores(vocab)
    final = brute_usage(sample, score)
    return sorted(
        (
            (p, vocab[p], score[p], usage_init.get(p, 0), u)
            for p, u in final.items()
        ),
        key=lambda t: (-t[4], t[0]),
    )


def test_unigram_em_two_rounds_match_brute(spark):
    """≥2-round parity (VERDICT r10 item 3): the operator's DP-based
    multi-round EM must equal the exhaustive-enumeration replay on the
    real sf0.001 sample, with the decreasing [48, 32] schedule."""
    from etl_oms_spark.operators.tokenize import unigram_em_train
    from tests_round10_helpers import word_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [
        (d["piece"], d["em_weight"], d["score_q"], d["usage_init"], d["usage"])
        for d in unigram_em_train(docs, n_rounds=2, prune_schedule=[48, 32])
    ]
    want = _brute_em_multi(word_sample(docs), [48, 32])
    assert got == want
    # the prune schedule bit: no more than 32 multi-char pieces survive
    assert sum(1 for p, *_ in got if len(p) >= 2) <= 32


def test_unigram_em_three_rounds_match_brute(spark):
    from etl_oms_spark.operators.tokenize import unigram_em_train
    from tests_round10_helpers import word_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [
        (d["piece"], d["em_weight"], d["score_q"], d["usage_init"], d["usage"])
        for d in unigram_em_train(docs, n_rounds=3, prune_schedule=[48, 40, 32])
    ]
    assert got == _brute_em_multi(word_sample(docs), [48, 40, 32])


def test_unigram_em_fixed_point_extra_round_is_noop(spark):
    """At a converged LM an extra round changes nothing: a corpus of
    disjoint two-char words converges after round 1 (each word's best
    segmentation is its own piece, so usage ranks never move), so
    n_rounds=3 at a constant schedule equals n_rounds=1 exactly —
    including usage_init, which always reads the ROUND-1 E-step."""
    from etl_oms_spark.operators.tokenize import unigram_em_train

    docs = spark.createDataFrame(
        [("ab ab ab cd cd ef",), ("ab cd cd zq zq zq",)], "text: string"
    )
    one = unigram_em_train(docs, n_rounds=1)
    three = unigram_em_train(docs, n_rounds=3, prune_schedule=[48, 48, 48])
    assert one == three


def test_unigram_em_default_is_single_round(spark):
    """n_rounds=1 (the default) must be bit-identical to the round-10
    uniT behavior — uniT's green oracle rows pin the other side."""
    from etl_oms_spark.operators.tokenize import unigram_em_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert unigram_em_train(docs) == unigram_em_train(
        docs, n_rounds=1, prune_schedule=[48]
    )


def test_unigram_em_schedule_length_must_match():
    import pytest

    from etl_oms_spark.operators.tokenize import unigram_em_train

    with pytest.raises(ValueError):
        unigram_em_train(None, n_rounds=2, prune_schedule=[48])


# ------------------------------------------------------------- gt1
def test_good_turing_vs_brute(spark):
    """Exact-Fraction replay of the frequency-of-frequencies histogram
    and all three Turing estimators on the real sf0.001 corpus."""
    from collections import Counter
    from math import floor

    from etl_oms_spark.operators.vocab import good_turing_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [
        (r["r"], r["n_r"], r["r_star_q9"], r["p_r_q9"], r["p0_q9"])
        for r in good_turing_counts(docs).collect()
    ]
    words = Counter()
    for row in docs.select("text").collect():
        t = row["text"]
        if t is None:
            continue
        words.update(_norm(t).split(" "))
    hist = Counter(words.values())
    t_tot = sum(r * n for r, n in hist.items())
    n_1 = hist.get(1, 0)
    want = []
    for r in sorted(hist)[:15]:
        n_r = hist[r]
        n_r1 = hist.get(r + 1, 0)
        want.append(
            (
                r,
                n_r,
                ((r + 1) * n_r1 * 10**9) // n_r,
                ((r + 1) * n_r1 * 10**9) // (n_r * t_tot),
                (n_1 * 10**9) // t_tot,
            )
        )
    assert got == want
    assert len(got) == 15


def test_good_turing_textbook_counts(spark):
    """Hand case: corpus 'a a a b b c' -> N_1=1 (c), N_2=1 (b), N_3=1
    (a), T=6; r*=2·1/1=2 for r=1, r*=3 for r=2, r*=0 for r=3 (no N_4);
    p0 = 1/6."""
    from etl_oms_spark.operators.vocab import good_turing_counts

    docs = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    got = {
        r["r"]: (r["n_r"], r["r_star_q9"], r["p0_q9"])
        for r in good_turing_counts(docs).collect()
    }
    third = 10**9 // 6
    assert got == {
        1: (1, 2 * 10**9, third),
        2: (1, 3 * 10**9, third),
        3: (1, 0, third),
    }


# ------------------------------------------------------------- db1
def test_davies_bouldin_vs_brute(spark):
    """Replay the full DB computation in Python (math.sqrt + integer
    floors) from the engine's own k-means assignment on sf0.001."""
    import math

    from etl_oms_spark.operators.clustering import (
        davies_bouldin,
        kmeans_assign,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(emb, k=8, n_iter=2)
    assigned = kmeans_assign(emb, cents)
    got = {
        r["cluster"]: (r["n"], r["s_q6"], r["r_max_q9"], r["db_q9"])
        for r in davies_bouldin(assigned, cents).collect()
    }
    rows = assigned.select("cluster", "dist2").collect()
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r["cluster"], []).append(r["dist2"])
    s = {
        c: sum(int(math.floor(math.sqrt(d) * 1e6 + 0.5)) for d in ds)
        // len(ds)
        for c, ds in by_c.items()
    }
    n = {c: len(ds) for c, ds in by_c.items()}
    rmax = {}
    for i in s:
        best = None
        for j in s:
            if i == j:
                continue
            d2 = sum(
                (a - b) ** 2 for a, b in zip(cents[i], cents[j])
            )
            dq6 = int(math.floor(math.sqrt(d2) * 1e6 + 0.5))
            rij = (
                10**18 if dq6 == 0 else ((s[i] + s[j]) * 10**9) // dq6
            )
            best = rij if best is None else max(best, rij)
        rmax[i] = best
    db = sum(rmax.values()) // len(rmax)
    want = {c: (n[c], s[c], rmax[c], db) for c in s}
    assert got == want


def test_davies_bouldin_separated_beats_overlapping(spark):
    """Sanity direction: two tight far-apart clusters must score a
    LOWER DB index than two overlapping ones."""
    from etl_oms_spark.operators.clustering import davies_bouldin

    def frame(rows):
        return spark.createDataFrame(
            rows, "vec_id long, cluster int, dist2 long"
        )

    cents_far = [[0, 0], [1_000_000, 0]]
    tight = frame([(1, 0, 4), (2, 0, 9), (3, 1, 1), (4, 1, 16)])
    db_far = davies_bouldin(tight, cents_far).collect()[0]["db_q9"]
    cents_near = [[0, 0], [2_000, 0]]
    spread = frame(
        [(1, 0, 4_000_000), (2, 0, 9_000_000),
         (3, 1, 1_000_000), (4, 1, 16_000_000)]
    )
    db_near = davies_bouldin(spread, cents_near).collect()[0]["db_q9"]
    assert db_far < db_near


# ------------------------------------------------------------- sr1
def _brute_spearman(pairs):
    """Average-rank Spearman with exact Fractions: rank maps built by
    explicit sorting, rho as a float at the end."""
    from fractions import Fraction

    def avg_ranks(vals):
        s = sorted(vals)
        first = {}
        for i, v in enumerate(s):
            first.setdefault(v, i)
        cnt = {}
        for v in s:
            cnt[v] = cnt.get(v, 0) + 1
        # average rank of v = first(v)+1 .. first(v)+cnt(v) mean
        return {
            v: Fraction(2 * first[v] + cnt[v] + 1, 2) for v in cnt
        }
    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    rx = avg_ranks(xs)
    ry = avg_ranks(ys)
    n = len(pairs)
    sx = sum(rx[x] for x in xs)
    sy = sum(ry[y] for y in ys)
    sxy = sum(rx[x] * ry[y] for x, y in pairs)
    sxx = sum(rx[x] ** 2 for x in xs)
    syy = sum(ry[y] ** 2 for y in ys)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx == 0 or vy == 0:
        return 0.0
    import math

    return float(n * sxy - sx * sy) / (
        math.sqrt(float(vx)) * math.sqrt(float(vy))
    )


def test_spearman_vs_brute_with_ties(spark):
    from etl_oms_spark.operators.classifier import spearman_from_pairs

    pairs = [(1, 5), (1, 7), (2, 7), (3, 9), (3, 9), (4, 12), (5, 11)]
    got = spearman_from_pairs(
        spark.createDataFrame(pairs, "x long, y long"), "x", "y"
    ).collect()[0]
    want = _brute_spearman(pairs)
    assert got["n"] == len(pairs)
    assert abs(got["rho"] - want) < 1e-12


def test_spearman_monotone_and_constant_pins(spark):
    from etl_oms_spark.operators.classifier import spearman_from_pairs

    mono = [(i, i * i) for i in range(1, 9)]  # monotone, nonlinear
    got = spearman_from_pairs(
        spark.createDataFrame(mono, "x long, y long"), "x", "y"
    ).collect()[0]
    assert abs(got["rho"] - 1.0) < 1e-12
    anti = [(i, -i * i) for i in range(1, 9)]
    got = spearman_from_pairs(
        spark.createDataFrame(anti, "x long, y long"), "x", "y"
    ).collect()[0]
    assert abs(got["rho"] + 1.0) < 1e-12
    const = [(i, 7) for i in range(1, 9)]  # zero variance -> pinned 0
    got = spearman_from_pairs(
        spark.createDataFrame(const, "x long, y long"), "x", "y"
    ).collect()[0]
    assert got["rho"] == 0.0


# ------------------------------------------------------------- cusum1
def _brute_cusum(day_counts):
    """Page's literal recursion S_t = max(0, S_{t-1} + e_t), both
    directions, argmax with earliest-day ties — the sequential form the
    operator's prefix-sum/running-extremum identity must reproduce."""
    days = sorted(day_counts)
    n = len(days)
    t = sum(day_counts.values())
    s_up = s_down = 0
    best_up = (0, days[0])
    best_down = (0, days[0])
    for d in days:
        e = n * day_counts[d] - t
        s_up = max(0, s_up + e)
        s_down = max(0, s_down - e)
        if s_up > best_up[0]:
            best_up = (s_up, d)
        if s_down > best_down[0]:
            best_down = (s_down, d)
    return n, t, best_up, best_down


def test_cusum_vs_page_recursion(spark):
    """A series with a level shift: the windowed identity must equal
    the literal Page recursion, and the changepoint must land on the
    shift."""
    import datetime

    from etl_oms_spark.operators.temporal import cusum_changepoint

    base = datetime.datetime(2024, 1, 1)
    counts = [10] * 10 + [25] * 10  # upward shift at day 10
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(days=i)),)
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = cusum_changepoint(df).collect()[0]
    day_counts = {
        (base + datetime.timedelta(days=i)).date(): c
        for i, c in enumerate(counts)
    }
    n, t, up, down = _brute_cusum(day_counts)
    assert (got["n_days"], got["total"]) == (n, t)
    # cp days surface as midnight timestamps (the repo date convention)
    assert (got["s_up_max"], got["cp_up"].date()) == up
    assert (got["s_down_max"], got["cp_down"].date()) == down
    # the up-changepoint is in the shifted regime, where S_up peaks
    assert got["cp_up"].day >= 11


def test_cusum_flat_series_pins_zero(spark):
    import datetime

    from etl_oms_spark.operators.temporal import cusum_changepoint

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for i in range(7):
        for _ in range(5):
            rows.append((eid, base + datetime.timedelta(days=i)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = cusum_changepoint(df).collect()[0]
    assert got["s_up_max"] == got["s_down_max"] == 0
    assert got["cp_up"].date() == got["cp_down"].date() == base.date()


def test_cusum_on_real_events_matches_brute(spark):
    import __spark_entry__ as entry_mod
    from etl_oms_spark.operators.temporal import cusum_changepoint

    ev = entry_mod._events(spark, "/root/testdata/sf0.001")
    got = cusum_changepoint(ev).collect()[0]
    from pyspark.sql import functions as F

    days = {
        r["day"]: r["c"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n, t, up, down = _brute_cusum(days)
    assert (got["n_days"], got["total"]) == (n, t)
    assert (got["s_up_max"], got["cp_up"].date()) == up
    assert (got["s_down_max"], got["cp_down"].date()) == down


# ------------------------------------------------------------- cf1
def test_conformal_vs_brute_order_statistic(spark):
    """Explicit sort replay: threshold = k-th smallest calibration
    score, k = max(1, floor((n+1)/10)); coverage counted by hand."""
    from etl_oms_spark.operators.classifier import conformal_lower_bound

    cal = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    test = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    rows = [(s, True) for s in cal] + [(s, False) for s in test]
    got = conformal_lower_bound(
        spark.createDataFrame(rows, "sq long, is_cal boolean"),
        "sq",
        "is_cal",
        1,
        10,
    ).collect()[0]
    k = max(1, (len(cal) + 1) // 10)
    thr = sorted(cal)[k - 1]
    covered = sum(1 for s in test if s >= thr)
    assert got["n_cal"] == len(cal) and got["n_test"] == len(test)
    assert got["k"] == k and got["thr"] == thr
    assert got["n_covered"] == covered
    assert got["coverage_q9"] == covered * 10**9 // len(test)


def test_conformal_k_floor_pins_one(spark):
    """Tiny calibration set (n+1 < alpha_den): k must clamp to 1 so the
    threshold is the calibration MINIMUM, never an empty quantile."""
    from etl_oms_spark.operators.classifier import conformal_lower_bound

    rows = [(5, True), (7, True), (3, True), (4, False), (2, False)]
    got = conformal_lower_bound(
        spark.createDataFrame(rows, "sq long, is_cal boolean"),
        "sq",
        "is_cal",
        1,
        10,
    ).collect()[0]
    assert got["k"] == 1 and got["thr"] == 3
    assert got["n_covered"] == 1  # only 4 >= 3
    assert got["coverage_q9"] == 10**9 // 2


def test_conformal_empty_calibration_split_pinned(spark):
    """ADVICE r11: an empty calibration split must yield ONE well-formed
    row — n_cal=0, k=1 (the clamp), thr/n_covered/coverage_q9 NULL —
    never an all-NULL agg row or a spurious 0 coverage."""
    from etl_oms_spark.operators.classifier import conformal_lower_bound

    rows = [(4, False), (2, False), (9, False)]
    out = conformal_lower_bound(
        spark.createDataFrame(rows, "sq long, is_cal boolean"),
        "sq",
        "is_cal",
        1,
        10,
    ).collect()
    assert len(out) == 1
    got = out[0]
    assert got["n_cal"] == 0 and got["k"] == 1
    assert got["n_test"] == 3
    assert got["thr"] is None
    assert got["n_covered"] is None and got["coverage_q9"] is None


def test_conformal_empty_test_split_pinned(spark):
    """ADVICE r11: an empty test split must keep n_cal/k/thr intact and
    pin n_test=0, coverage_q9=NULL (no divide-by-zero NULL leakage into
    the other columns)."""
    from etl_oms_spark.operators.classifier import conformal_lower_bound

    rows = [(5, True), (7, True), (3, True)]
    out = conformal_lower_bound(
        spark.createDataFrame(rows, "sq long, is_cal boolean"),
        "sq",
        "is_cal",
        1,
        10,
    ).collect()
    assert len(out) == 1
    got = out[0]
    assert got["n_cal"] == 3 and got["k"] == 1 and got["thr"] == 3
    assert got["n_test"] == 0
    assert got["coverage_q9"] is None


# ------------------------------------------------------------- ot1/qq1/eta1
def _qhist(spark, sf="/root/testdata/sf0.001"):
    import __spark_entry__ as entry_mod

    return {
        r["sq"]: (r["n_pos"], r["n_neg"])
        for r in entry_mod._quality_label_hist(spark, sf).collect()
    }


def test_wasserstein_vs_brute(spark):
    """Fraction replay of the 1-D closed form Σ|F_A−F_B|·gap on the
    real sf0.001 histogram."""
    from fractions import Fraction

    import __spark_entry__ as entry_mod

    hist = _qhist(spark)
    got = entry_mod.ot1_wasserstein_quality(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    sqs = sorted(hist)
    np_ = sum(p for p, _ in hist.values())
    nn = sum(n for _, n in hist.values())
    cp = cn = 0
    w1 = Fraction(0)
    for i, s in enumerate(sqs[:-1]):
        cp += hist[s][0]
        cn += hist[s][1]
        gap = sqs[i + 1] - s
        w1 += abs(Fraction(cp, np_) - Fraction(cn, nn)) * gap
    # w1 is in sq units (1e6·score); engine reports 1e-9 score units
    want = (w1.numerator * 1000) // (w1.denominator)  # 1e9/1e6
    # brute scaled the SUM of per-bin |cp·nn−cn·np|·gap by ONE division;
    # engine divides the integer SUM once too — recompute identically:
    scaled = sum(
        abs(
            (sum(hist[x][0] for x in sqs[: i + 1])) * nn
            - (sum(hist[x][1] for x in sqs[: i + 1])) * np_
        )
        * (sqs[i + 1] - sqs[i])
        for i in range(len(sqs) - 1)
    )
    assert got["n_pos"] == np_ and got["n_neg"] == nn
    assert got["w1_q9"] == (scaled * 1000) // (np_ * nn) == want
    assert got["w1_q9"] > 0


def test_wasserstein_identical_distributions_zero(spark):
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    # build a symmetric corpus: every text appears once as en, once as fr
    texts = ["the cat sat", "a long document about joins", "short", "x y z w"]
    rows = [(i, t, "en") for i, t in enumerate(texts)] + [
        (i + 10, t, "fr") for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.createOrReplaceTempView("___ot1_tmp")
    # reuse the operator body on a constructed hist
    from etl_oms_spark.operators.text import quality_score

    sq = F.coalesce(
        F.floor(quality_score("text") * 1e6 + F.lit(0.5)).cast("long"),
        F.lit(-1),
    )
    hist = (
        df.select(sq.alias("sq"),
                  F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"))
        .groupBy("sq")
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("n_neg"),
        )
    )
    import __spark_entry__ as em

    orig = em._quality_label_hist
    try:
        em._quality_label_hist = lambda s, d: hist
        got = em.ot1_wasserstein_quality(spark, "unused").collect()[0]
    finally:
        em._quality_label_hist = orig
    assert got["w1_q9"] == 0


def test_qq_deciles_vs_brute(spark):
    import __spark_entry__ as entry_mod

    hist = _qhist(spark)
    got = {
        r["p"]: (r["q_pos"], r["q_neg"])
        for r in entry_mod.qq1_quality_deciles(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    pos = sorted(
        s for s, (p, _) in hist.items() for _ in range(p)
    )
    neg = sorted(
        s for s, (_, n) in hist.items() for _ in range(n)
    )
    want = {}
    for p in range(1, 10):
        kp = -(-p * len(pos) // 10)  # ceil
        kn = -(-p * len(neg) // 10)
        want[p] = (pos[kp - 1], neg[kn - 1])
    assert got == want


def test_eta_squared_vs_brute_and_pins(spark):
    """Fraction replay (with the engine's per-group 1e-9 trunc) on
    sf0.001 + the two direction pins: groups=copies-of-one-value each
    give eta2=1; a single group gives eta2=0 (between-variance 0)."""
    import __spark_entry__ as entry_mod

    got = entry_mod.eta1_quality_by_source(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    from etl_oms_spark.operators.text import quality_score
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sq = F.coalesce(
        F.floor(quality_score("text") * 1e6 + F.lit(0.5)).cast("long"),
        F.lit(-1),
    )
    rows = d.select(F.col("source"), sq.alias("x")).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["source"], []).append(r["x"])
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    q = sum(x * x for v in groups.values() for x in v)
    b = sum((sum(v) ** 2 * 10**9) // len(v) for v in groups.values())
    num = n * b - 10**9 * s * s
    den = 10**9 * (n * q - s * s)
    assert got["n"] == n and got["n_groups"] == len(groups)
    assert abs(got["eta2"] - float(num) / float(den)) < 1e-15
    assert 0.0 <= got["eta2"] <= 1.0
    # pins on constructed frames
    def eta(rows):
        import __spark_entry__ as em

        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        df.write.mode("overwrite").parquet("/tmp/eta1_tmp/documents.parquet")
        return em.eta1_quality_by_source(spark, "/tmp/eta1_tmp").collect()[0]

    perfect = [(1, "aaa bbb", "s1"), (2, "aaa bbb", "s1"),
               (3, "completely different words here now", "s2"),
               (4, "completely different words here now", "s2")]
    assert abs(eta(perfect)["eta2"] - 1.0) < 1e-9
    single = [(1, "aaa bbb", "s1"), (2, "other words", "s1")]
    assert eta(single)["eta2"] == 0.0


# ------------------------------------------------------------- scs1
def test_streaming_cusum_equals_batch(spark):
    """The streamed daily histogram must reproduce the batch rollup
    exactly (watermark > span: nothing late, nothing dropped; sentinel
    dance flushes every real window), so scs1 == cusum1 row-for-row."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    got = entry_mod.scs1_streaming_cusum(spark, sf).collect()
    want = entry_mod.cusum1_event_changepoint(spark, sf).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
