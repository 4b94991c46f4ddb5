"""Full-text relevance search over a document corpus.

Training-data curation constantly needs "find the documents most like
this query" — seeding topic filters, pulling eval-adjacent documents,
building retrieval sets. The reference has no search operator; this is
part of the LLM-data-pipeline surface (SURVEY.md §2 extension), built
Spark-first: the inverted index is an explode + groupBy, scoring is pure
column algebra, and the top-k is a TakeOrdered — no UDFs, no collect.

Scale shape (the part that must survive 100 TB):
- tokens are filtered to the query's terms BEFORE any shuffle, so the
  per-(doc, term) aggregation runs at matched-posting cardinality, not
  corpus-token cardinality;
- document frequencies and corpus stats (N, avgdl) are term-count-sized
  aggregates broadcast back into the plan;
- the only corpus-wide shuffle is the per-doc score groupBy at matched-
  document cardinality, immediately cut by TakeOrdered(k).

BM25 scoring is quantized to exact integers before the per-document sum
(the repo-wide portability pattern, cf. similarity.cosine_quantized):
per-(doc, term) scores round half-up to 1e-6 and accumulate as BIGINTs,
so the aggregate is order-independent and bit-identical on any engine —
the float sum that would otherwise make BM25 nondeterministic never
happens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_oms_spark.operators.text import tokens
from etl_oms_spark.util import ensure_parallelism

SCORE_SCALE = 1_000_000


def _postings(
    df: DataFrame, terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """(doc, term, tf) for query terms only — the filter runs inside the
    explode projection, so non-matching tokens never reach a shuffle."""
    tok = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(terms))
    )
    return tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def corpus_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per document: (id, dl); used with a 1-row global aggregate
    for (N, total_len) — both from a single corpus scan."""
    return df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("dl")
    )


def bm25_term_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-(document, term) BM25 contributions: (id, term, tf, term_q)
    where ``term_q`` is the exact 1e-6-quantized integer contribution of
    one matched term to the document's score. ``bm25_scores`` sums these
    per document; multi-query rankers (mrr1) re-aggregate them per
    (query, document) instead — one postings build serves every query
    whose terms are in ``terms``, because a term's contribution does not
    depend on which query asked for it.

    idf is the Robertson form ln(1 + (N - df + 0.5)/(df + 0.5)); the tf
    saturation term is computed as an exact rational before one final
    double multiply + half-up rounding per (doc, term).
    """
    dl = corpus_stats(ensure_parallelism(df, id_col), text_col, id_col)
    glob = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    tf = _postings(df, terms, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(glob))
    )
    n, total = F.col("n_docs"), F.col("total_len")
    idf = F.log(
        F.lit(1.0)
        + (n.cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    # tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with avgdl = total/n,
    # multiplied through by 400*total (k1, b must be expressible in
    # 20ths — 1.2 and 0.75 are) so numerator and denominator are exact
    # BIGINTs. ANSI overflow bound: tf * total < 2.3e16 — holds to
    # ~10^12 corpus tokens; beyond that flip these two expressions to
    # double (per-term products stay deterministic IEEE either way).
    k1_20, b_20 = int(round(k1 * 20)), int(round(b * 20))
    num = F.col("tf") * F.lit(20 * (20 + k1_20)) * total
    den = (
        F.col("tf") * F.lit(400) * total
        + F.lit(k1_20 * (20 - b_20)) * total
        + F.lit(k1_20 * b_20) * F.col("dl") * n
    )
    term_q = F.floor(
        (idf * num.cast("double") / den.cast("double")) * SCORE_SCALE
        + F.lit(0.5)
    ).cast("long")
    return scored.select(
        F.col(id_col), "term", F.col("tf").cast("long").alias("tf"),
        term_q.alias("term_q"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 over ``terms``: returns (id, n_hits, score_q,
    score) where ``score_q`` is the exact 1e-6-quantized integer score
    (sum of per-term quantized contributions — deterministic under any
    aggregation order) and ``score = score_q / 1e6``.
    """
    per_term = bm25_term_scores(df, terms, text_col, id_col, k1=k1, b=b)
    per_doc = per_term.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("term_q").alias("score_q"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("score_q"),
        (F.col("score_q") / SCORE_SCALE).alias("score"),
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 search: deterministic (score_q DESC, id ASC) cut via
    orderBy+limit — Spark lowers it to TakeOrdered, so the k-cut happens
    map-side per partition and only k rows per partition reach the
    driver-side merge."""
    scores = bm25_scores(df, terms, text_col, id_col, k1=k1, b=b)
    return scores.orderBy(F.col("score_q").desc(), F.col(id_col)).limit(k)


def tfidf_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Sparse TF-IDF postings for the whole corpus: (id, term, tf, df,
    tfidf_q) with tfidf_q = round_half_up(tf * ln(N/df) * 1e6) as BIGINT.
    The building block for corpus-level similarity / clustering on text;
    ``max_df`` drops stopword-like terms (and bounds any downstream
    term-keyed self-join, cf. dedup.ngram_jaccard_pairs)."""
    base = ensure_parallelism(df, id_col)
    tok = base.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    dfreq = dfreq.filter(F.col("df") >= min_df)
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.floor(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
                * SCORE_SCALE
                + F.lit(0.5)
            ).cast("long").alias("tfidf_q"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    top: int = 20,
    rrf_scale: int = 1_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankings (Cormack et al., SIGIR'09):
    fused score = Σ_lists 1/(k + rank). The standard zero-tuning hybrid
    of lexical (BM25) and dense (embedding cosine) retrieval.

    Each input is (id, rank) with ranks from a deterministic order.
    Contributions are quantized ``round(rrf_scale/(k+rank))`` BIGINTs
    before the sum — order-independent, bit-identical across engines.
    Inputs are top-k lists (tiny); the union + groupBy is k·N-bounded, so
    at corpus scale the cost lives entirely in the upstream rankers.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = [
        r.select(
            F.col(id_col),
            F.round(
                F.lit(float(rrf_scale)) / (F.lit(k_rrf) + F.col(rank_col))
            )
            .cast("long")
            .alias("__c"),
        )
        for r in rankings
    ]
    u = contrib[0]
    for c in contrib[1:]:
        u = u.unionByName(c)
    return (
        u.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.sum("__c").alias("rrf_q"),
        )
        .withColumn("rrf_score", F.col("rrf_q").cast("double") / F.lit(float(rrf_scale)))
        .orderBy(F.col("rrf_q").desc(), F.col(id_col))
        .limit(top)
    )
