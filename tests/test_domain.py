"""DSIR-style domain-relevance operator semantics."""

from __future__ import annotations

import math

from etl_oms_spark.operators.domain import (
    W_SCALE,
    domain_log_ratios,
    dsir_scores,
    dsir_select,
    dsir_topk,
)

TARGET = [(1, "physics physics quantum field"), (2, "quantum gravity physics")]
RAW = [
    (10, "celebrity gossip news news"),
    (11, "sports news scores"),
    (12, "physics news today"),
]


def _dfs(spark):
    t = spark.createDataFrame(TARGET, ["doc_id", "text"])
    r = spark.createDataFrame(RAW, ["doc_id", "text"])
    return t, r


def test_log_ratio_signs(spark):
    t, r = _dfs(spark)
    w = {row.term: row for row in domain_log_ratios(t, r).collect()}
    assert w["physics"].w_q > 0 and w["quantum"].w_q > 0
    assert w["news"].w_q < 0 and w["gossip"].w_q < 0
    # union vocab: every term of either corpus is present
    assert "scores" in w and "field" in w


def test_log_ratio_matches_formula(spark):
    t, r = _dfs(spark)
    rows = {row.term: row for row in domain_log_ratios(t, r).collect()}
    nt = sum(row.ct for row in rows.values())
    nr = sum(row.cr for row in rows.values())
    v = len(rows)
    x = rows["physics"]
    expected = math.log((x.ct + 1) / (nt + v) * (nr + v) / (x.cr + 1))
    assert x.w_q == math.floor(expected * W_SCALE + 0.5)


def test_dsir_scores_rank_target_like_docs_higher(spark):
    t, r = _dfs(spark)
    w = domain_log_ratios(t, r)
    corpus = spark.createDataFrame(
        [
            (100, "quantum physics field gravity"),
            (101, "news gossip sports news"),
            (102, "physics news"),
            (103, ""),
        ],
        ["doc_id", "text"],
    )
    s = {row.doc_id: row for row in dsir_scores(corpus, w).collect()}
    assert s[100].score_q > s[102].score_q > s[101].score_q
    assert s[103].n_tokens in (0, 1)  # "" normalizes to one empty token
    assert len(s) == 4  # every input doc scored


def test_dsir_score_is_exact_tf_weighted_sum(spark):
    t, r = _dfs(spark)
    w = {row.term: row.w_q for row in domain_log_ratios(t, r).collect()}
    corpus = spark.createDataFrame([(100, "physics physics news")],
                                   ["doc_id", "text"])
    row = dsir_scores(corpus, domain_log_ratios(t, r)).collect()[0]
    assert row.score_q == 2 * w["physics"] + w["news"]
    assert row.score == row.score_q / W_SCALE


def test_dsir_topk_and_select(spark):
    t, r = _dfs(spark)
    corpus = spark.createDataFrame(
        [(100, "quantum physics"), (101, "news news gossip"), (102, "sports")],
        ["doc_id", "text"],
    )
    top = dsir_topk(corpus, t, r, k=1).collect()
    assert [x.doc_id for x in top] == [100]
    kept = dsir_select(corpus, domain_log_ratios(t, r), min_score_q=0)
    assert {x.doc_id for x in kept.collect()} == {100}
    assert kept.columns == corpus.columns


def test_bigram_lm_scores_match_manual_math(spark):
    import math

    from etl_oms_spark.operators.domain import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    # corpus bigrams: doc1: (a b)x2,(b a)x1; doc2: (a b)x1 → c2(a b)=3, c2(b a)=1
    # unigrams: a=3, b=3, c=1 → V=3
    q = lambda x: math.floor(x * 1_000_000 + 0.5)
    w_ab = q(math.log(4 / 6))  # (3+1)/(c1(a)=3+V=3)
    w_ba = q(math.log(2 / 6))
    assert out[1]["n_bigrams"] == 3
    assert out[1]["logprob_q"] == 2 * w_ab + w_ba
    assert out[2]["logprob_q"] == w_ab
    # single-token doc: no bigrams, NULL avg, zero sum
    assert out[3]["n_bigrams"] == 0 and out[3]["logprob_q"] == 0
    assert out[3]["avg_logprob"] is None
    assert abs(
        out[1]["avg_logprob"] - (2 * w_ab + w_ba) / (3 * 1_000_000)
    ) < 1e-12


def test_bigram_lm_external_model_unseen_fallback(spark):
    import math

    from etl_oms_spark.operators.domain import bigram_lm_model, bigram_lm_scores

    train = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    model = bigram_lm_model(train)
    score = spark.createDataFrame([(9, "z z")], "doc_id long, text string")
    out = bigram_lm_scores(score, model=model).collect()[0]
    # unseen bigram, unseen w1: ln((0+1)/(0+V)) with V=2
    q = lambda x: math.floor(x * 1_000_000 + 0.5)
    assert out["logprob_q"] == q(math.log(1 / 2))
