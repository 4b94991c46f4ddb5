"""BM25 / TF-IDF search operator semantics."""

from __future__ import annotations

import math

from etl_oms_spark.operators.search import (
    SCORE_SCALE,
    bm25_scores,
    bm25_topk,
    tfidf_vectors,
)

CORPUS = [
    (1, "apple apple apple banana"),
    (2, "apple cherry durian elderberry"),
    (3, "cherry durian fig grape melon melon melon melon"),
    (4, "banana banana banana banana banana banana banana banana"),
    (5, "apple"),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_bm25_only_matching_docs(spark):
    rows = bm25_scores(_df(spark), ["apple"]).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 5]
    assert all(r.n_hits == 1 for r in rows)


def test_bm25_tf_saturates_and_length_normalizes(spark):
    by_id = {r.doc_id: r for r in bm25_scores(_df(spark), ["apple"]).collect()}
    # tf=3 (doc 1) wins; the one-word doc (5) outscores the same-length
    # single-hit doc (2) via length normalization
    assert by_id[1].score_q > by_id[5].score_q > by_id[2].score_q
    # saturation: tripling tf (doc1 vs doc2 at similar dl) must not
    # triple the score
    assert by_id[1].score_q < 3 * by_id[2].score_q


def test_bm25_idf_downweights_common_terms(spark):
    rows = {
        (r.doc_id, *()): r
        for r in bm25_scores(_df(spark), ["apple", "fig"]).collect()
    }
    # 'fig' appears in 1 doc, 'apple' in 3: doc 3's single rare term
    # outscores doc 2's single common term
    assert rows[(3,)].score_q > rows[(2,)].score_q


def test_bm25_topk_deterministic_cut(spark):
    top = bm25_topk(_df(spark), ["apple", "banana"], k=2).collect()
    assert len(top) == 2
    assert top[0].score_q >= top[1].score_q
    again = bm25_topk(
        _df(spark).repartition(7), ["apple", "banana"], k=2
    ).collect()
    assert [(r.doc_id, r.score_q) for r in top] == [
        (r.doc_id, r.score_q) for r in again
    ]


def test_bm25_score_matches_reference_formula(spark):
    n, dls = 5, {1: 4, 2: 4, 3: 8, 4: 8, 5: 1}
    avgdl = sum(dls.values()) / n
    tf, df, dl = 3, 3, dls[1]  # 'apple' in doc 1
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    tf_part = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    expected = idf * tf_part
    got = {r.doc_id: r for r in bm25_scores(_df(spark), ["apple"]).collect()}
    assert abs(got[1].score_q / SCORE_SCALE - expected) < 2 / SCORE_SCALE


def test_tfidf_max_df_drops_stopwords(spark):
    v = tfidf_vectors(_df(spark), max_df=2)
    terms = {r.term for r in v.collect()}
    assert "apple" not in terms  # df=3 > max_df
    assert "fig" in terms and "banana" in terms


def test_tfidf_values(spark):
    v = {
        (r.doc_id, r.term): r
        for r in tfidf_vectors(_df(spark)).collect()
    }
    r = v[(3, "melon")]
    assert r.tf == 4 and r.df == 1
    assert r.tfidf_q == math.floor(4 * math.log(5.0) * SCORE_SCALE + 0.5)


def test_bm25_term_scores_shared_doc_lengths_equivalent(spark):
    """Round-13 optimization seam: passing a caller-shared (possibly
    checkpointed) corpus_stats frame must not change a single score."""
    from etl_oms_spark.operators.search import bm25_term_scores, corpus_stats

    df = _df(spark)
    base = {
        (r.doc_id, r.term): (r.tf, r.term_q)
        for r in bm25_term_scores(df, ["apple", "banana"]).collect()
    }
    dl = corpus_stats(df).localCheckpoint(eager=False)
    shared = {
        (r.doc_id, r.term): (r.tf, r.term_q)
        for r in bm25_term_scores(
            df, ["apple", "banana"], doc_lengths=dl
        ).collect()
    }
    assert shared == base and len(base) > 0
