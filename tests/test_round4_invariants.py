"""Fixed-seed randomized invariants for the round-4 algorithmic
operators: each is checked against an independent pure-Python
brute-force model over randomized corpora/graphs (the house style of
test_properties.py — fixed seeds keep Spark round-trips bounded while
still sweeping edge shapes hand tests miss: empty docs, isolated nodes,
single-token texts, all-identical corpora)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _norm_tokens(text):
    if text is None:
        return None
    toks = " ".join(text.lower().strip().split())
    return toks.split(" ")  # '' -> [''] — exactly Spark's split semantics


def _rand_docs(rng, n_docs, vocab, max_len, dup_prob=0.3):
    docs = []
    for i in range(n_docs):
        if docs and rng.random() < dup_prob:
            # near-dup of an earlier doc (tail tweak)
            base = rng.choice(docs)[1].split()
            if base and rng.random() < 0.5:
                base = base[:-1]
            base = base + [rng.choice(vocab)]
            docs.append((i, " ".join(base)))
        elif rng.random() < 0.08:
            docs.append((i, ""))
        else:
            length = rng.randint(1, max_len)
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(length))))
    return docs


def test_prefix_jaccard_matches_bruteforce_on_random_corpora(spark):
    from etl_oms_spark.operators.dedup import prefix_filtered_jaccard_pairs

    vocab = [f"w{j}" for j in range(12)]
    for seed in (7, 21, 99):
        rng = random.Random(seed)
        docs = _rand_docs(rng, 24, vocab, 10)
        thr = rng.choice([0.5, 0.7, 0.9])
        sets = {
            i: {t for t in _norm_tokens(txt) if t != ""} for i, txt in docs
        }
        want = set()
        for a in sets:
            for b in sets:
                if a < b and sets[a] and sets[b]:
                    inter = len(sets[a] & sets[b])
                    union = len(sets[a] | sets[b])
                    if inter / union >= thr:
                        want.add((a, b, round(inter / union, 9)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in prefix_filtered_jaccard_pairs(df, threshold=thr).collect()
        }
        assert got == want, (seed, thr, got ^ want)


def test_bloom_decontamination_matches_bruteforce_on_random_corpora(spark):
    from etl_oms_spark.operators.dedup import bloom_decontamination

    vocab = [f"w{j}" for j in range(10)]
    k = 2
    for seed in (3, 17):
        rng = random.Random(seed)
        docs = _rand_docs(rng, 30, vocab, 8)
        bench_ids = {i for i, _ in docs if i % 5 == 0}

        def shingles_of(txt):
            toks = _norm_tokens(txt)
            n = len(toks)
            return {" ".join(toks[i : i + k]) for i in range(max(n - k + 1, 1))}

        bench_sh = set()
        for i, txt in docs:
            if i in bench_ids:
                bench_sh |= shingles_of(txt)
        want = {}
        for i, txt in docs:
            if i not in bench_ids:
                m = len(shingles_of(txt) & bench_sh)
                if m:
                    want[i] = m
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r["n_matched_shingles"]
            for r in bloom_decontamination(
                df.filter(F.col("doc_id") % 5 != 0),
                df.filter(F.col("doc_id") % 5 == 0),
                k=k,
                num_bits=1 << 10,  # deliberately tiny: false positives MUST die
                num_hashes=2,
            ).collect()
        }
        assert got == want, (seed, got, want)


def test_bfs_hops_matches_python_bfs_on_random_graphs(spark):
    from collections import deque

    from etl_oms_spark.operators.graph import bfs_hops

    for seed in (5, 42, 360):
        rng = random.Random(seed)
        n = 22
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.08
        ] or [(0, 1)]
        seeds = sorted(rng.sample(range(n), 3))
        max_hops = rng.choice([1, 2, 4])

        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {s: 0 for s in seeds}
        dq = deque((s, 0) for s in seeds)
        while dq:
            node, h = dq.popleft()
            if h == max_hops:
                continue
            for nb in adj[node]:
                if nb not in want:
                    want[nb] = h + 1
                    dq.append((nb, h + 1))
        e = spark.createDataFrame(edges, "u long, v long")
        s = spark.createDataFrame([(x,) for x in seeds], "id long")
        got = {
            r["id"]: r["hops"]
            for r in bfs_hops(e, s, max_hops=max_hops).collect()
        }
        assert got == want, (seed, max_hops, got, want)


def test_repeated_substring_spans_matches_bruteforce_on_random_corpora(spark):
    from etl_oms_spark.operators.dedup import repeated_substring_spans

    vocab = [f"w{j}" for j in range(6)]  # tiny vocab -> frequent repeats
    L = 4
    for seed in (11, 77):
        rng = random.Random(seed)
        docs = _rand_docs(rng, 16, vocab, 14, dup_prob=0.4)

        windows = {}  # window text -> set(doc)
        positions = {}  # doc -> [pos...]
        for i, txt in docs:
            toks = _norm_tokens(txt)
            if len(toks) < L or toks == [""]:
                continue
            for p in range(1, len(toks) - L + 2):
                w = " ".join(toks[p - 1 : p - 1 + L])
                windows.setdefault(w, set()).add(i)
                positions.setdefault(i, []).append((p, w))
        want = set()
        for i, plist in positions.items():
            hits = sorted({p for p, w in plist if len(windows[w]) >= 2})
            span = None
            for p in hits:
                if span is None or p - span[1] > L:
                    if span:
                        want.add((i, span[0], span[1] - span[0] + L))
                    span = [p, p]
                else:
                    span[1] = p
            if span:
                want.add((i, span[0], span[1] - span[0] + L))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_id"], r["span_start"], r["span_len"])
            for r in repeated_substring_spans(
                df, min_len_tokens=L, min_docs=2
            ).collect()
        }
        assert got == want, (seed, got ^ want)


def test_strip_spans_matches_bruteforce_on_random_corpora(spark):
    from etl_oms_spark.operators.dedup import (
        repeated_substring_spans,
        strip_spans,
    )

    vocab = [f"w{j}" for j in range(6)]
    L = 4
    for seed in (13, 101):
        rng = random.Random(seed)
        docs = _rand_docs(rng, 14, vocab, 14, dup_prob=0.45)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        spans = repeated_substring_spans(df, min_len_tokens=L, min_docs=2)
        span_rows = [
            (r["doc_id"], r["span_start"], r["span_len"])
            for r in spans.collect()
        ]
        want = {}
        by_doc = {}
        for i, lo, ln in span_rows:
            by_doc.setdefault(i, []).append((lo, lo + ln - 1))
        for i, txt in docs:
            if i not in by_doc:
                continue
            toks = _norm_tokens(txt)
            kept = [
                t
                for p, t in enumerate(toks, start=1)
                if not any(lo <= p <= hi for lo, hi in by_doc[i])
            ]
            want[i] = (" ".join(kept), len(toks) - len(kept))
        got = {
            r["doc_id"]: (r["kept_text"], r["n_tokens_removed"])
            for r in strip_spans(df, spans).collect()
        }
        assert got == want, (seed, got, want)
