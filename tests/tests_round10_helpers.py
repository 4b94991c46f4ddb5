"""Shared independent-replay machinery for the unigram-EM test suites
(round 10's uniT and round 11's uniT2): the bounded word sample, the
frequency-estimated initial vocabulary, quantized log scores, and the
exhaustive-enumeration segmenter (no DP) — so a bug in the operator's
Viterbi column algebra and its oracle cannot cancel out.

Not a test module (no ``test_`` prefix): pytest imports it from the
suites by module name (tests/ is on sys.path via rootdir insertion).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_oms_spark.operators.tokenize import (
    UNI_LOG_SCALE,
    UNI_MAX_PIECE,
    UNI_MAX_WORD,
    UNI_VOCAB,
)


def word_sample(spark_df) -> list[tuple[str, int]]:
    from etl_oms_spark.operators.text import tokens

    rows = (
        spark_df.select(F.explode(tokens("text")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") >= 2))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(256)
        .collect()
    )
    return [(r["w"], int(r["n"])) for r in rows]


def initial_vocab(sample) -> dict[str, int]:
    weights: dict[str, int] = {}
    for w, n in sample:
        for ln_ in range(1, UNI_MAX_PIECE + 1):
            for i in range(len(w) - ln_ + 1):
                p = w[i : i + ln_]
                weights[p] = weights.get(p, 0) + n
    multi = sorted(
        ((p, c) for p, c in weights.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:UNI_VOCAB]
    vocab = dict(multi)
    vocab.update({p: c for p, c in weights.items() if len(p) == 1})
    return vocab


def scores(vocab: dict[str, int]) -> dict[str, int]:
    total = sum(vocab.values())
    return {
        p: math.floor(math.log(c / total) * UNI_LOG_SCALE + 0.5)
        for p, c in vocab.items()
    }


def brute_usage(sample, score) -> dict[str, int]:
    """Exhaustive enumeration of every segmentation (vocab pieces only)
    with the DP's tie order — test_round9_ops' independent oracle,
    reused for every EM pass."""

    def all_segs(w):
        if not w:
            yield []
            return
        for ln_ in range(1, min(UNI_MAX_PIECE, len(w)) + 1):
            head = w[:ln_]
            if head in score:
                for rest in all_segs(w[ln_:]):
                    yield [head] + rest

    usage: dict[str, int] = {}
    for w, n in sample:
        if not (2 <= len(w) <= UNI_MAX_WORD):
            continue
        best = max(
            all_segs(w),
            key=lambda segs: (
                sum(score[p] for p in segs),
                -len(segs),
                tuple(
                    len(w) - sum(len(p) for p in segs[i:])
                    for i in range(len(segs) - 1, -1, -1)
                ),
            ),
        )
        for p in best:
            usage[p] = usage.get(p, 0) + n
    return usage
