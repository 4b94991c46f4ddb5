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
