"""Vocabulary / BPE-prep operator semantics."""

from __future__ import annotations

from etl_oms_spark.operators.vocab import (
    bigram_counts,
    bigram_topk,
    coverage_curve,
    vocab_counts,
    vocab_topk,
)

CORPUS = [
    (1, "a b a b c"),
    (2, "a a a"),
    (3, "b c d"),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_vocab_counts_tf_and_df(spark):
    rows = {r.term: r for r in vocab_counts(_df(spark)).collect()}
    assert (rows["a"].tf, rows["a"].df) == (5, 2)
    assert (rows["b"].tf, rows["b"].df) == (3, 2)
    assert (rows["d"].tf, rows["d"].df) == (1, 1)


def test_vocab_topk_deterministic_order(spark):
    top = vocab_topk(_df(spark), k=2).collect()
    assert [(r.term, r.tf) for r in top] == [("a", 5), ("b", 3)]


def test_bigram_counts_adjacent_only(spark):
    rows = {r.pair: r.n for r in bigram_counts(_df(spark)).collect()}
    # doc1: (a b)(b a)(a b)(b c); doc2: (a a)(a a); doc3: (b c)(c d)
    assert rows["a b"] == 2 and rows["b c"] == 2 and rows["a a"] == 2
    assert rows["b a"] == 1 and rows["c d"] == 1
    assert sum(rows.values()) == 8  # len-1 pairs per doc: 4+2+2


def test_bigram_single_token_doc_emits_nothing(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
    assert bigram_counts(df).count() == 0


def test_bigram_topk_tiebreak(spark):
    top = bigram_topk(_df(spark), k=3).collect()
    assert [r.pair for r in top] == ["a a", "a b", "b c"]


def test_coverage_curve_monotone_to_one(spark):
    rows = coverage_curve(_df(spark), top=10).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    covs = [r.coverage for r in rows]
    assert all(b >= a for a, b in zip(covs, covs[1:]))
    assert abs(covs[-1] - 1.0) < 1e-12  # top-10 covers the whole 4-term vocab
    assert rows[-1].cum_tf == 11


def test_chi2_keywords_hand_case(spark):
    """4-doc corpus with a perfectly discriminative term: chi2 must equal
    the explicit 2x2 formula and rank that term first."""
    from etl_oms_spark.operators.vocab import chi2_keywords

    df = spark.createDataFrame(
        [
            (1, "apple apple zz", "A"),
            (2, "apple yy", "A"),
            (3, "banana zz", "B"),
            (4, "banana yy", "B"),
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {(r["source"], r["term"]): r for r in chi2_keywords(df, k=3).collect()}
    row = got[("A", "apple")]
    # a=2 in-A docs with apple, b=0, c=0, d=2 -> chi2 = 4*(2*2)^2/(2*2*2*2) = 4
    assert row["df_in"] == 2 and row["df_out"] == 0
    assert row["chi2"] == 4.0
    # top term for A is apple (highest chi2)
    a_terms = sorted(
        ((r["chi2"], t) for (s, t), r in got.items() if s == "A"), reverse=True
    )
    assert a_terms[0][1] in ("apple",)
    # shared terms (zz/yy appear in both groups evenly) score 0
    assert got[("A", "zz")]["chi2"] == 0.0


def test_cms_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.vocab import cms_counts, cms_estimate

    df = spark.createDataFrame(
        [(w,) for w in ["a"] * 50 + ["b"] * 20 + list("cdefghij")], "term STRING"
    )
    sk = cms_counts(df, "term", depth=4, width=64)
    items = df.select("term").distinct()
    est = {r["term"]: r["cms_estimate"]
           for r in cms_estimate(sk, items, "term", depth=4, width=64).collect()}
    true = {r["term"]: r["n"]
            for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(est[t] >= true[t] for t in true)  # CMS upper-bound property
    assert est["a"] >= 50 and est["b"] >= 20

    # mergeability: sketch(full) == sketch(half1) + sketch(half2)
    words = ["a"] * 50 + ["b"] * 20 + list("cdefghij")
    h1 = spark.createDataFrame([(w,) for w in words[:40]], "term STRING")
    h2 = spark.createDataFrame([(w,) for w in words[40:]], "term STRING")
    merged = (
        cms_counts(h1, "term", depth=4, width=64)
        .unionAll(cms_counts(h2, "term", depth=4, width=64))
        .groupBy("row", "bucket").agg(F.sum("n").alias("n"))
    )
    full = {(r["row"], r["bucket"]): r["n"] for r in sk.collect()}
    got = {(r["row"], r["bucket"]): r["n"] for r in merged.collect()}
    assert got == full
