"""Domain-relevance scoring for data selection (DSIR-style).

Data Selection with Importance Resampling (Xie et al., 2023, public
arXiv 2302.03169) scores each raw document by the log-likelihood ratio
of a target-domain n-gram model vs the raw-corpus model, then keeps the
highest-importance documents. This module is the Spark-native unigram
variant:

- ``domain_log_ratios``: per-term add-1-smoothed log ratio
  ln( p_target(term) / p_raw(term) ), quantized half-up to 1e-6 as a
  BIGINT weight — a vocab-sized table built from two map-side-combined
  count aggregations.
- ``dsir_scores``: per-document importance = Σ tf(term) · w_q(term).
  The weights join is an explicit broadcast (vocab ≪ corpus) and the
  per-doc sum is an exact BIGINT aggregation — order-independent, so
  the score is bit-identical on any engine/partitioning (the repo-wide
  portability pattern).
- ``dsir_topk`` / ``dsir_select``: deterministic selection by
  (score DESC, id) — TakeOrdered — or a score threshold.

Scale shape: one corpus scan for scoring (explode → broadcast join →
groupBy(doc)); the only corpus-cardinality shuffle is the per-doc sum.
Unseen terms get weight ln(raw_total+V) - ... from the smoothing counts
only when they appear in a scored document via the left join's fallback
weight (terms absent from BOTH models contribute the smoothed constant
ratio, folded in below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_oms_spark.operators.text import tokens
from etl_oms_spark.util import ensure_parallelism

W_SCALE = 1_000_000


def _unigram_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        ensure_parallelism(df, id_col)
        .select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def domain_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, w_q): quantized ln(p_target/p_raw) with add-1 smoothing over
    the UNION vocabulary V of both corpora:

        p_target(t) = (c_t(t) + 1) / (N_t + V)
        p_raw(t)    = (c_r(t) + 1) / (N_r + V)

    Full-outer join of the two count tables (vocab-sized), then one
    1-row stats broadcast. Terms seen in neither corpus are not in the
    table; score-time joins treat them as weight 0 (they carry no
    evidence either way).
    """
    ct = _unigram_counts(target, text_col, id_col).withColumnRenamed("c", "ct")
    cr = _unigram_counts(raw, text_col, id_col).withColumnRenamed("c", "cr")
    merged = ct.join(cr, "term", "full_outer").select(
        "term",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
    )
    stats = merged.agg(
        F.sum("ct").alias("nt"),
        F.sum("cr").alias("nr"),
        F.count(F.lit(1)).alias("v"),
    )
    w = F.log(
        (F.col("ct") + F.lit(1)).cast("double")
        / (F.col("nt") + F.col("v")).cast("double")
        * (F.col("nr") + F.col("v")).cast("double")
        / (F.col("cr") + F.lit(1)).cast("double")
    )
    return merged.crossJoin(F.broadcast(stats)).select(
        "term",
        "ct",
        "cr",
        F.floor(w * W_SCALE + F.lit(0.5)).cast("long").alias("w_q"),
    )


def dsir_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, score_q, score): per-document importance as the
    exact BIGINT sum of tf·w_q over the document's terms; terms missing
    from the weight table contribute 0. ``score = score_q / 1e6``."""
    base = ensure_parallelism(df, id_col)
    tf = (
        base.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = tf.join(
        F.broadcast(weights.select("term", "w_q")), "term", "left"
    ).select(
        F.col(id_col),
        F.col("tf"),
        F.coalesce(F.col("w_q"), F.lit(0)).alias("w_q"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("w_q")).alias("score_q"),
    )
    return base.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("score_q"), F.lit(0)).cast("long").alias("score_q"),
        (F.coalesce(F.col("score_q"), F.lit(0)) / W_SCALE).alias("score"),
    )


def dsir_topk(
    df: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the k documents most target-like: weights from (target, raw
    or df), then a deterministic (score_q DESC, id) TakeOrdered cut."""
    weights = domain_log_ratios(target, raw if raw is not None else df,
                                text_col, id_col)
    return (
        dsir_scores(df, weights, text_col, id_col)
        .orderBy(F.col("score_q").desc(), F.col(id_col))
        .limit(k)
    )


def dsir_select(
    df: DataFrame,
    weights: DataFrame,
    min_score_q: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Threshold selection: keep documents with score_q > min_score_q —
    the streaming-friendly form (no global sort; a pure filter over the
    scored corpus)."""
    keep = (
        dsir_scores(df, weights, text_col, id_col)
        .filter(F.col("score_q") > min_score_q)
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def bigram_lm_scores(
    df: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram-LM fluency scoring — the CCNet-style "perplexity filter"
    signal (public: CCNet, arXiv 1911.00359, which ranks web text by LM
    score and drops the worst tail), built without an external LM: an
    add-1-smoothed bigram model with per-bigram quantized log
    probabilities.

        logP(doc) = Σ_{(w1,w2) in doc} ln( (c2(w1,w2)+1) / (c1(w1)+V) )

    ``model`` is a (w1, pair, c1, c2, v) table from `bigram_lm_model`
    (defaults to training on ``df`` itself — self-scoring, which is the
    usual "rank within the crawl" deployment). Per-(doc, pair) the log
    term quantizes half-up to 1e-6 BIGINT, so the per-doc sum is exact
    and order-independent; unseen pairs fall back to c2=0 and unseen w1
    to c1=0 — the same smoothed mass, no special cases.

    Output: (id, n_bigrams, logprob_q, avg_logprob) — avg is the length-
    normalized score to threshold on (higher = more fluent under the
    model); docs with no bigram score NULL avg and 0 sum.

    Scale: the model is vocab²-bounded but corpus-truncated (observed
    bigrams only) and joins broadcast; the corpus side is one explode +
    two broadcast joins + one per-doc sum — no corpus×corpus anything.
    """
    if model is None:
        model = bigram_lm_model(df, text_col, id_col)
    toks = tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = ensure_parallelism(df, id_col)
    doc_pairs = (
        base.select(F.col(id_col), F.explode(pairs).alias("pair"))
        .groupBy(id_col, "pair")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("w1", F.split(F.col("pair"), " ").getItem(0))
    )
    uni = model.select("w1", "c1").distinct()
    bi = model.select("pair", "c2")
    # v is constant over the model; carry it via a 1-row broadcast so rows
    # whose w1/pair missed their join still see it
    vrow = model.agg(F.max("v").alias("v"))
    joined = (
        doc_pairs.join(F.broadcast(bi), "pair", "left")
        .join(F.broadcast(uni), "w1", "left")
        .crossJoin(F.broadcast(vrow))
        .select(
            F.col(id_col),
            "tf",
            F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
            "v",
        )
    )
    w = F.log(
        (F.col("c2") + F.lit(1)).cast("double")
        / (F.col("c1") + F.col("v")).cast("double")
    )
    scored = joined.select(
        F.col(id_col),
        "tf",
        F.floor(w * W_SCALE + F.lit(0.5)).cast("long").alias("w_q"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        F.sum(F.col("tf") * F.col("w_q")).alias("logprob_q"),
    )
    return base.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("logprob_q"), F.lit(0)).cast("long").alias("logprob_q"),
        (F.col("logprob_q") / (F.col("n_bigrams") * F.lit(W_SCALE))).alias(
            "avg_logprob"
        ),
    )


def bigram_lm_model(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the add-1 bigram model: (w1, pair, c1, c2, v) — corpus bigram
    counts joined with first-token unigram counts and the vocabulary size.
    Two map-side-combined aggregations over one corpus scan each."""
    from etl_oms_spark.operators.vocab import bigram_counts

    uni = (
        _unigram_counts(df, text_col, id_col)
        .withColumnRenamed("c", "c1")
        .withColumnRenamed("term", "w1")
    )
    v = uni.agg(F.count(F.lit(1)).alias("v"))
    bi = (
        bigram_counts(df, text_col, id_col)
        .withColumnRenamed("n", "c2")
        .withColumn("w1", F.split(F.col("pair"), " ").getItem(0))
    )
    return (
        bi.join(uni, "w1")
        .crossJoin(F.broadcast(v))
        .select("w1", "pair", "c1", "c2", "v")
    )


def perplexity_buckets(
    scores: DataFrame,
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style head/middle/tail partitioning (arXiv 1911.00359):
    within each group (language), rank documents by LM fluency and split
    into ``n_buckets`` equal tiles — bucket 1 is the most-fluent "head"
    CCNet keeps preferentially.

    Tile assignment over (avg_logprob, doc_id) — the average is an exact
    BIGINT/BIGINT IEEE division and the id tiebreak makes the order
    total, so it is bit-reproducible cross-engine. Lowered via
    ``grouped_ntile`` (quantiles.py): an ``ntile() OVER (PARTITION BY
    lang ...)`` window cannot be split, so the dominant language of a web
    corpus (50%+ English) would sort in ONE task at 100 TB; the
    range-partition + broadcast-offset rank reproduces the exact same
    buckets with every sort bounded by a partition, not a group.
    """
    from etl_oms_spark.operators.quantiles import grouped_ntile

    joined = scores.join(docs.select(id_col, group_col), id_col)
    return (
        grouped_ntile(
            joined,
            [group_col],
            [F.col("avg_logprob").asc_nulls_first(), F.col(id_col).asc()],
            n_buckets,
        )
        .groupBy(group_col, "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("logprob_q").cast("long").alias("sum_logprob_q"),
        )
    )


#: Kneser-Ney absolute discount (Chen & Goodman 1998's fixed-D variant).
#: 0 < D < 1 keeps ln() defined when self-scoring (every scored bigram
#: has count >= 1 > D, so the discounted term stays positive).
KN_DISCOUNT = 0.75


def kneser_ney_source_scores(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality scoring per source —
    the smoothing upgrade of `bigram_lm_scores`' add-1 model (public:
    Kneser & Ney 1995; Chen & Goodman 1998 fixed-discount form), the
    signal a curation pipeline uses to rank whole SOURCES by in-domain
    fluency before mixing:

        P(w|v) = (c(vw) − D)/c(v·)
                 + (D · N1+(v·)/c(v·)) · (N1+(·w)/N1+(··))

    where c(v·) is the CONTEXT count (bigrams starting with v — not the
    raw unigram count), N1+(v·)/N1+(·w) are distinct right/left
    continuation type counts and N1+(··) the total bigram type count —
    the continuation distribution that makes KN rank "frequent but
    single-context" words (the 'francisco' effect) below equally
    frequent versatile words.

    Determinism contract (shared with the kn1 oracle): all counts are
    exact longs from corpus rollups; P is one fixed-shape double
    expression of those longs (left-associated exactly as written —
    the ts1/pm1 ln-quantization discipline), quantized per bigram TYPE
    to ``floor(ln(P)·1e6 + 0.5)`` BIGINT; per-source sums weight each
    type by its exact occurrence count, so every aggregate is an
    order-independent integer.

    Scale: one corpus rollup to (source, v, w, c) — map-side combined,
    the ONLY stage that touches 100 TB; everything downstream is
    bigram-type-domain-sized (counts, continuation tables, the score
    join). Returns per source: ``n_bigrams, sum_logq, mean_logq``
    (mean = sum/n, the one double — an IEEE quotient of exact longs).
    """
    t = tokens(text_col)
    base = df.select(F.col(group_col).alias("grp"), t.alias("t")).filter(
        F.size("t") >= 2
    )
    gcnt = (
        base.select(
            "grp",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)-1), "
                    "i -> struct(element_at(t, i) AS w1,"
                    " element_at(t, i+1) AS w2))"
                )
            ).alias("b"),
        )
        .select("grp", "b.w1", "b.w2")
        .groupBy("grp", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # Lazy checkpoint: gcnt feeds BOTH the smoothing-table lineage
        # (tcnt → cv/n1v/n1w/n1all → scored) and the final rollup —
        # without the barrier Spark re-derives the corpus bigram explode
        # once per consumer (measured: 6 FileScans of documents in the
        # unfixed plan). gcnt is (source × bigram-type)-domain-sized;
        # the corpus is now scanned exactly once.
        .localCheckpoint(eager=False)
    )
    tcnt = (
        gcnt.groupBy("w1", "w2")
        .agg(F.sum("c").cast("long").alias("cvw"))
        # same reasoning: tcnt has five consumers (cv, n1v, n1w, n1all,
        # the score join); type-domain-sized
        .localCheckpoint(eager=False)
    )
    cv = tcnt.groupBy("w1").agg(F.sum("cvw").cast("long").alias("cv"))
    n1v = tcnt.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1v"))
    n1w = tcnt.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1w"))
    n1all = tcnt.agg(F.count(F.lit(1)).cast("long").alias("n1all"))
    p = (
        (F.col("cvw").cast("double") - F.lit(KN_DISCOUNT))
        / F.col("cv").cast("double")
        + (
            F.lit(KN_DISCOUNT)
            * F.col("n1v").cast("double")
            / F.col("cv").cast("double")
        )
        * (F.col("n1w").cast("double") / F.col("n1all").cast("double"))
    )
    scored = (
        tcnt.join(cv, "w1")
        .join(n1v, "w1")
        .join(n1w, "w2")
        .crossJoin(F.broadcast(n1all))
        .select(
            "w1",
            "w2",
            F.floor(F.log(p) * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
    )
    return (
        gcnt.join(scored, ["w1", "w2"])
        .groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("score_q")).cast("long").alias(
                "sum_logq"
            ),
        )
        .withColumn(
            "mean_logq",
            F.col("sum_logq").cast("double")
            / F.col("n_bigrams").cast("double"),
        )
        .withColumnRenamed("grp", group_col)
        .orderBy(group_col)
    )
