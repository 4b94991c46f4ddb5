"""Independent cross-checks for the round-4 continuation queries
(ap1/sw1/ld1/bd1/js1/en1/fl1/zipf1): each Spark result is recomputed by
a pure-Python/numpy brute-force model over the same sf0.001 parquet —
the auc1/ks1 house style (independent method, exact where the engine is
exact, tolerance only where the engine itself documents quantization)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _norm(t):
    if t is None or (isinstance(t, float) and t != t):
        return ""
    return re.sub(r"\s+", " ", t.lower().strip())


def _q(name, spark):
    return entry_mod.queries()[name](spark, SF)


def test_average_precision_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.text import quality_score

    d = spark.read.parquet(f"{SF}/documents.parquet")
    rows = d.select(
        F.coalesce(
            F.floor(quality_score("text") * 1e6 + F.lit(0.5)).cast("long"),
            F.lit(-1),
        ).alias("sq"),
        (F.col("lang") == "en").cast("int").alias("pos"),
    ).collect()
    by_score = defaultdict(lambda: [0, 0])
    for r in rows:
        by_score[r["sq"]][0] += r["pos"]
        by_score[r["sq"]][1] += 1
    tp = cum = 0
    ap_num = 0.0
    n_pos = sum(v[0] for v in by_score.values())
    for sq in sorted(by_score, reverse=True):
        p, n = by_score[sq]
        tp += p
        cum += n
        ap_num += p * (tp / cum)
    ap_ref = ap_num / n_pos
    got = _q("ap1_average_precision", spark).collect()[0]
    assert got["n_pos"] == n_pos
    # engine floors each precision ratio at 1e-9 — bias is < 1e-9 downward
    assert 0.0 <= ap_ref - got["ap"] < 1e-8
    assert 0.0 < got["ap"] <= 1.0


def test_soft_dedup_weights_match_bruteforce(spark):
    df = _docs()
    fp_count = Counter(_norm(t) for t in df["text"])
    want = defaultdict(lambda: [0, 0, 0])
    for src, t in zip(df["source"], df["text"]):
        c = fp_count[_norm(t)]
        want[src][0] += 1
        want[src][1] += 1 if c > 1 else 0
        want[src][2] += 1000000000 // c
    got = {r["source"]: r for r in _q("sw1_soft_dedup_weights", spark).collect()}
    assert set(got) == set(want)
    for src, (n, dup, effq) in want.items():
        assert got[src]["n_docs"] == n
        assert got[src]["n_dup_docs"] == dup
        assert got[src]["eff_q9_sum"] == effq
        assert got[src]["eff_docs"] <= n


def test_l_diversity_matches_bruteforce(spark):
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cents = (cust["c_acctbal"] * 100).round().astype("int64")
    groups = defaultdict(set)
    sizes = Counter()
    for nk, seg, c in zip(cust["c_nationkey"], cust["c_mktsegment"], cents):
        key = (nk, seg, c // 100000)  # python // is floor, same as the engine
        groups[key].add(c)
        sizes[key] += 1
    hist = defaultdict(lambda: [0, 0])
    for key, vals in groups.items():
        hist[len(vals)][0] += 1
        hist[len(vals)][1] += sizes[key]
    got = {r["l"]: r for r in _q("ld1_l_diversity", spark).collect()}
    assert set(got) == set(hist)
    for level, (ng, nc) in hist.items():
        assert got[level]["n_groups"] == ng
        assert got[level]["n_customers"] == nc


def test_benford_audit_matches_bruteforce(spark):
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    obs = Counter(int(str(m)[0]) for m in cents)
    n = len(cents)
    got = {r["digit"]: r for r in _q("bd1_benford_audit", spark).collect()}
    assert set(got) == set(obs)
    for d, c in obs.items():
        p = math.log10(1.0 + 1.0 / d)
        term = (float(c) - float(n) * p) * (float(c) - float(n) * p) / (
            float(n) * p
        )
        assert got[d]["n_obs"] == c
        assert got[d]["benford_p"] == p
        assert got[d]["chi2_q6"] == math.floor(term * 1e6 + 0.5)


def test_js_divergence_matches_bruteforce_and_bounds(spark):
    df = _docs()
    toks = []
    for src, t in zip(df["source"], df["text"]):
        for w in _norm(t).split(" "):
            if w != "":
                toks.append((src, w))
    gc = Counter(w for _, w in toks)
    vocab = sorted(gc, key=lambda w: (-gc[w], w))[:1000]
    vset = set(vocab)
    cnts = Counter((s, w) for s, w in toks if w in vset)
    tots = Counter()
    for (s, _), c in cnts.items():
        tots[s] += c
    sources = sorted(tots)
    want = {}
    for i, s1 in enumerate(sources):
        for s2 in sources[i + 1 :]:
            total = 0
            n_toks = 0
            for w in vocab:
                c1, c2 = cnts.get((s1, w), 0), cnts.get((s2, w), 0)
                if c1 + c2 == 0:
                    continue
                n_toks += 1
                p = c1 / tots[s1]
                q = c2 / tots[s2]
                m = (p + q) / 2.0
                contrib = (0.5 * p * math.log(p / m) if c1 > 0 else 0.0) + (
                    0.5 * q * math.log(q / m) if c2 > 0 else 0.0
                )
                total += math.floor(contrib * 1e6 + 0.5)
            want[(s1, s2)] = (n_toks, total)
    rows = _q("js1_source_divergence", spark).collect()
    got = {(r["source_a"], r["source_b"]): r for r in rows}
    assert set(got) == set(want)
    for key, (n_toks, total) in want.items():
        assert got[key]["n_toks"] == n_toks
        assert got[key]["jsd_q6_sum"] == total
        # JSD is bounded by ln 2 (allow the documented 1e-6·n_toks slack)
        assert -1e-6 * n_toks <= got[key]["jsd"] <= math.log(2) + 1e-6 * n_toks


def test_char_entropy_matches_bruteforce(spark):
    df = _docs()
    want = Counter()
    for src, t in zip(df["source"], df["text"]):
        norm = _norm(t)
        if not norm:
            continue
        c = Counter(norm)
        n = len(norm)
        hq = sum(
            math.floor(-((k / n) * math.log(k / n)) * 1e6 + 0.5)
            for k in c.values()
        )
        want[(src, hq // 100000)] += 1
    rows = _q("en1_char_entropy", spark).collect()
    got = {(r["source"], r["ent_band"]): r["n_docs"] for r in rows}
    assert got == dict(want)


def test_readability_matches_bruteforce(spark):
    df = _docs()
    agg = defaultdict(lambda: [0, 0])
    for src, t in zip(df["source"], df["text"]):
        norm = _norm(t)
        w = 0 if norm == "" else len(norm.split(" "))
        if w == 0:
            continue
        s = max(len(re.findall(r"[.!?]+", t)), 1)
        syl = max(len(re.findall(r"[aeiouy]+", t.lower())), 1)
        score = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        band = min(max(math.floor(score / 10), -10), 12)
        key = (src, band)
        agg[key][0] += 1
        agg[key][1] += math.floor(score * 1e6 + 0.5)
    rows = _q("fl1_readability", spark).collect()
    got = {(r["source"], r["fk_band"]): r for r in rows}
    assert set(got) == set(agg)
    for key, (n, sq) in agg.items():
        assert got[key]["n_docs"] == n
        assert got[key]["mean_score"] == sq / (n * 1e6)


def test_zipf_slope_matches_bruteforce(spark):
    df = _docs()
    cnt = Counter()
    for t in df["text"]:
        for w in _norm(t).split(" "):
            if w != "":
                cnt[w] += 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    xs = [math.floor(math.log(r + 1) * 1e6 + 0.5) for r in range(len(top))]
    ys = [math.floor(math.log(c) * 1e6 + 0.5) for _, c in top]
    n = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    # python ints are arbitrary-precision — the reference for the
    # engine's DECIMAL(38,0)/HUGEINT combine
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope_ref = float(num) / float(den)
    got = _q("zipf1_token_zipf", spark).collect()[0]
    assert got["n"] == n
    assert abs(got["zipf_slope"] - slope_ref) < 1e-9
    assert got["zipf_slope"] < 0  # Zipf: frequency falls with rank
    assert 0.0 <= got["r2"] <= 1.0


def test_release_scorecard_metric_consistency(spark):
    rows = {r["metric"]: r["value"] for r in _q("sb1_release_scorecard", spark).collect()}
    assert set(rows) == {
        "n_docs", "distinct_texts", "dup_rate", "eff_docs", "mean_quality",
        "auc_en", "avg_precision", "zipf_slope", "jsd_max",
    }
    assert rows["distinct_texts"] <= rows["n_docs"]
    # soft-dedup effective size equals the distinct count on exact clusters
    # only up to the 1e-9 floor; it can never exceed either count
    assert rows["eff_docs"] <= rows["n_docs"]
    assert abs(rows["eff_docs"] - rows["distinct_texts"]) < 1.0
    assert 0.0 <= rows["dup_rate"] < 1.0
    assert 0.0 <= rows["mean_quality"] <= 1.0
    assert 0.0 <= rows["auc_en"] <= 1.0 and 0.0 < rows["avg_precision"] <= 1.0
    assert rows["zipf_slope"] < 0.0
    assert 0.0 <= rows["jsd_max"] <= math.log(2) + 1e-3
