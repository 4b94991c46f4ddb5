"""Independent cross-checks for the round-4 third-continuation queries
(ndcg1/mrr1/tcl1/acf1/cpd1/hp1/sv1): each Spark result is recomputed by a
pure-Python brute-force model over the same sf0.001 parquet — the
test_round4c_ops house style (independent method, exact equality where the
engine is exact, which is everywhere in this batch)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from datetime import timedelta

import pandas as pd

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def _norm(t):
    if t is None or (isinstance(t, float) and t != t):
        return None
    return re.sub(r"\s+", " ", t.lower().strip())


def _q(name, spark):
    return entry_mod.queries()[name](spark, SF)


def _daily_series():
    """Zero-filled daily k$ revenue series as (list of dates, list of ints)."""
    o = _orders()
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    by_day = defaultdict(int)
    for d, c in zip(o["o_orderdate"].dt.date, cents):
        by_day[d] += int(c)
    days = sorted(by_day)
    mn, mx = days[0], days[-1]
    grid = [mn + timedelta(days=i) for i in range((mx - mn).days + 1)]
    # python // floors; engine DIV truncates — revenue sums are positive so equal
    xs = [by_day.get(d, 0) // 100000 for d in grid]
    return grid, xs


def test_acf_matches_bruteforce(spark):
    grid, xs = _daily_series()
    n, s = len(xs), sum(xs)
    ys = [n * x - s for x in xs]
    den = sum(y * y for y in ys)
    got = {r["lag"]: r for r in _q("acf1_autocorrelation", spark).collect()}
    assert set(got) == set(range(1, 11))
    for lag in range(1, 11):
        num = sum(ys[t] * ys[t + lag] for t in range(n - lag))
        assert got[lag]["n_days"] == n
        assert got[lag]["acf"] == float(num) / float(den), lag


def test_change_point_matches_bruteforce(spark):
    grid, xs = _daily_series()
    n, s = len(xs), sum(xs)
    cum = 0
    best = None  # (stat, t, ct)
    for t, x in enumerate(xs[:-1]):
        cum += x
        stat = abs(n * cum - (t + 1) * s)
        if best is None or stat > best[0]:
            best = (stat, t, cum)
    stat, t, ct = best
    r = _q("cpd1_change_point", spark).collect()[0]
    assert r["change_date"] == grid[t].isoformat()
    assert r["days_before"] == t + 1
    assert r["days_after"] == n - t - 1
    assert r["mean_before_k"] == float(ct) / float(t + 1)
    assert r["mean_after_k"] == float(s - ct) / float(n - t - 1)
    assert r["d_stat"] == float(stat) / (float(n) * float(s))


def test_t_closeness_matches_bruteforce(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    cents = (c["c_acctbal"] * 100).round().astype("int64")
    band = ((cents + 100000) // 110000).clip(0, 9)
    df = pd.DataFrame(
        {"nat": c["c_nationkey"], "seg": c["c_mktsegment"], "band": band}
    )
    nt = len(df)
    gband = Counter(df["band"])
    gcum = []
    acc = 0
    for b in range(10):
        acc += gband.get(b, 0)
        gcum.append(acc)
    got = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in _q("tcl1_t_closeness", spark).collect()
    }
    groups = df.groupby(["nat", "seg"])
    assert set(got) == set(groups.groups)
    for (nat, seg), g in groups:
        cnt = Counter(g["band"])
        ng = len(g)
        acc = sd = 0
        for b in range(10):
            acc += cnt.get(b, 0)
            sd += abs(acc * nt - gcum[b] * ng)
        t_ref = float(sd) / (9.0 * float(ng) * float(nt))
        r = got[(nat, seg)]
        assert r["n_g"] == ng
        assert r["t_closeness"] == t_ref
        assert r["breach"] == (1 if t_ref > 0.15 else 0)


def test_heaps_law_matches_bruteforce(spark):
    d = _docs().sort_values("doc_id").reset_index(drop=True)
    first_pos: dict[str, int] = {}
    dls = []
    for i, t in enumerate(d["text"]):
        norm = _norm(t)
        toks = norm.split(" ") if norm else []
        dls.append(len(toks) if norm else 0)
        for tok in toks:
            if tok and tok not in first_pos:
                first_pos[tok] = i + 1
    n = len(d)
    got = {r["decile"]: r for r in _q("hp1_heaps_law", spark).collect()}
    assert set(got) == set(range(1, 11))
    for j in range(1, 11):
        cp = (n * j) // 10
        vocab = sum(1 for p in first_pos.values() if p <= cp)
        tokens_seen = sum(dls[:cp])
        r = got[j]
        assert r["docs_seen"] == cp
        assert r["vocab"] == vocab
        assert r["tokens_seen"] == tokens_seen


def test_survival_hazard_matches_bruteforce(spark):
    o = _orders()
    per = o.groupby("o_custkey")["o_orderdate"].agg(["min", "max"])
    censor = o["o_orderdate"].max().date()
    subj = []
    for _, row in per.iterrows():
        fst, lst = row["min"].date(), row["max"].date()
        if (censor - lst).days > 90:
            subj.append(((lst - fst).days, 1))
        else:
            subj.append(((censor - fst).days, 0))
    hist = defaultdict(lambda: [0, 0])  # t -> [d, c]
    for t, e in subj:
        hist[t][0] += e
        hist[t][1] += 1 - e
    ntot = len(subj)
    got = {r["t_days"]: r for r in _q("sv1_survival_hazard", spark).collect()}
    seen = 0
    cumq = 0
    expect_ts = set()
    for t in sorted(hist):
        d, c = hist[t]
        n_risk = ntot - seen
        seen += d + c
        if d == 0:
            continue
        expect_ts.add(t)
        hq = (d * 1000000000) // n_risk
        cumq += hq
        r = got[t]
        assert r["n_event"] == d and r["n_censored_at_t"] == c
        assert r["n_risk"] == n_risk
        assert r["hazard"] == float(hq) / 1000000000.0
        assert r["cum_hazard"] == float(cumq) / 1000000000.0
    assert set(got) == expect_ts


def _bm25_per_term(terms):
    """Pure-python replica of operators/search.bm25_term_scores (k1=1.2,
    b=0.75): {(doc_id, term): term_q} plus per-doc dl."""
    d = _docs()
    dl = {}
    tf = defaultdict(int)
    for doc_id, t in zip(d["doc_id"], d["text"]):
        norm = _norm(t)
        if norm is None:
            dl[doc_id] = None
            continue
        toks = norm.split(" ")
        dl[doc_id] = len(toks)
        for tok in toks:
            if tok in terms:
                tf[(doc_id, tok)] += 1
    n_docs = len(d)
    total_len = sum(v for v in dl.values() if v is not None)
    df = Counter(term for (_, term) in tf)
    out = {}
    for (doc_id, term), f in tf.items():
        idf = math.log(1.0 + (float(n_docs) - df[term] + 0.5) / (df[term] + 0.5))
        num = f * 880 * total_len
        den = f * 400 * total_len + 120 * total_len + 360 * dl[doc_id] * n_docs
        out[(doc_id, term)] = math.floor(
            idf * float(num) / float(den) * 1000000 + 0.5
        )
    return out


def test_ndcg_matches_bruteforce(spark):
    terms = set(entry_mod._NDCG_TERMS)
    per_term = _bm25_per_term(terms)
    per_doc = defaultdict(lambda: [0, 0])  # doc -> [score_q, n_hits]
    for (doc_id, _), q in per_term.items():
        per_doc[doc_id][0] += q
        per_doc[doc_id][1] += 1
    ranked = sorted(per_doc.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    ideal = sorted(per_doc.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]

    def gain(rel, rnk):
        return math.floor(
            float((1 << rel) - 1)
            * math.log(2.0)
            / math.log(float(rnk + 1))
            * 1000000.0
            + 0.5
        )

    got = {r["rnk"]: r for r in _q("ndcg1_retrieval_ndcg", spark).collect()}
    assert set(got) == set(range(1, len(ranked) + 1))
    dcg = idcg = 0
    for i, ((doc_id, (sq, rel)), (_, (isq, irel))) in enumerate(
        zip(ranked, ideal), start=1
    ):
        dcg += gain(rel, i)
        idcg += gain(irel, i)
        r = got[i]
        assert r["doc_id"] == doc_id and r["rel"] == rel
        assert r["dcg_q"] == dcg and r["idcg_q"] == idcg
        assert r["ndcg"] == float(dcg) / float(idcg)


def test_mrr_matches_bruteforce(spark):
    queries = entry_mod._MRR_QUERIES
    all_terms = {t for _, ts in queries for t in ts}
    per_term = _bm25_per_term(all_terms)
    got = {r["qid"]: r for r in _q("mrr1_reciprocal_rank", spark).collect()}
    assert set(got) == {q for q, _ in queries}
    for qid, ts in queries:
        scored = defaultdict(lambda: [0, 0])  # doc -> [score_q, n_hit]
        for (doc_id, term), q in per_term.items():
            if term in ts:
                scored[doc_id][0] += q
                scored[doc_id][1] += 1
        rel = {d: v for d, v in scored.items() if v[1] == len(ts)}
        r = got[qid]
        assert r["n_terms"] == len(ts)
        assert r["n_candidates"] == len(scored)
        if not rel:
            assert r["best_doc"] is None
            assert r["first_rel_rank"] is None and r["rr"] == 0.0
            continue
        bd, (bs, _) = min(rel.items(), key=lambda kv: (-kv[1][0], kv[0]))
        rank = 1 + sum(
            1
            for d, (sq, _) in scored.items()
            if sq > bs or (sq == bs and d < bd)
        )
        assert r["best_doc"] == bd
        assert r["first_rel_rank"] == rank
        assert r["rr"] == 1.0 / float(rank)
