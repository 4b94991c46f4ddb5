"""Corpus vocabulary statistics — the tokenizer-training prep pass.

Training pipelines build (a) a word-frequency table (vocab selection,
coverage curves, OOV-rate estimation) and (b) adjacent-pair frequencies
(the inner statistic of a BPE merge step) over the full corpus. Both are
classic one-shuffle map-side-combined aggregations; the top-k cut is a
TakeOrdered so only k rows per partition ever move after the count.

At 100 TB the only hot spot is the count groupBy's key skew (Zipfian
head terms). A map-side combine already collapses each partition's head
to one row per term per partition, which is exactly the salting
transform — no extra handling needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_oms_spark.operators.text import tokens
from etl_oms_spark.util import ensure_parallelism


def vocab_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, tf, df) over the corpus: total occurrences and document
    frequency, in ONE aggregation — df via count_distinct on the doc id
    (partial_count_distinct map-side, no second shuffle)."""
    tok = ensure_parallelism(df, id_col).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    return tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k vocabulary by total frequency, deterministic (tf DESC, term
    ASC) — a TakeOrdered cut over the count table."""
    return (
        vocab_counts(df, text_col, id_col)
        .orderBy(F.col("tf").desc(), F.col("term"))
        .limit(k)
    )


def bigram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Adjacent-token-pair frequencies — the statistic a BPE/WordPiece
    merge step maximizes. Pairs are built inside the array (zip of the
    token array with its tail) so the explode emits exactly len-1 rows
    per doc; one count shuffle after."""
    toks = tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tok = ensure_parallelism(df, id_col).select(
        F.explode(pairs).alias("pair")
    )
    return tok.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))


def bigram_topk(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k adjacent pairs (n DESC, pair ASC) — one BPE merge-candidate
    ranking pass."""
    return (
        bigram_counts(df, text_col, id_col)
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(k)
    )


def coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top: int = 200,
) -> DataFrame:
    """Cumulative token coverage of the top-``top`` vocabulary: rank terms
    by frequency and report what fraction of all corpus tokens the top-r
    terms cover — the vocab-size selection curve. The running sum windows
    over the ``top``-row table only, never the corpus."""
    counts = vocab_counts(df, text_col, id_col)
    total = counts.agg(F.sum("tf").alias("total"))
    head = (
        counts.orderBy(F.col("tf").desc(), F.col("term")).limit(top)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("tf").desc(), F.col("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        head.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(
                Window.orderBy(F.col("tf").desc(), F.col("term"))
            ).cast("long").alias("rank"),
            "term",
            "tf",
            F.sum("tf").over(w).alias("cum_tf"),
            (F.sum("tf").over(w) / F.col("total")).alias("coverage"),
        )
    )


def source_vocab_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-comparison
    diagnostic run before mixing domains (near-identical vocabularies ⇒
    redundant sources; disjoint ⇒ coverage win).

    Inverted-index discipline: distinct (source, term) pairs (vocab-sized,
    not corpus-sized), self-join on term, so cost is Σ df(term)² over
    terms — bounded by #sources² per term, and ``max_df`` drops
    ubiquitous terms first at web scale (same guard as the n-gram pair
    twins). Jaccard from exact integer counts: |A∩B| / (|A|+|B|−|A∩B|).
    """
    pairs = df.select(
        F.col(source_col).alias("src"), F.explode(tokens(text_col)).alias("term")
    ).distinct()
    if max_df is not None:
        dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
        pairs = pairs.join(
            F.broadcast(dfreq.filter(F.col("__df") <= max_df).select("term")), "term"
        )
    sizes = pairs.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
    a = pairs.select(F.col("src").alias("src_a"), "term")
    b = pairs.select(F.col("src").alias("src_b"), "term")
    shared = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("src").alias("src_a"), F.col("n_terms").alias("n_a"))
    sb = sizes.select(F.col("src").alias("src_b"), F.col("n_terms").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
    )


def chi2_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    k: int = 10,
) -> DataFrame:
    """Per-group discriminative keywords by chi-squared feature selection:
    for each (group, term), the 2×2 presence contingency (in-group /
    out-group × contains / doesn't) scored with the classic chi² statistic;
    top-``k`` terms per group. The labeled-data counterpart of TF-IDF —
    the standard feature-selection pass before training a quality / domain
    classifier on curated vs raw corpus labels.

    Lowering: distinct per-doc terms explode once; one (group, term)
    count shuffle (map-side combined); term totals re-aggregate that
    output (term-keyed, NDV-bounded); group sizes and the corpus total
    are broadcast scalars. The chi² arithmetic runs on doubles cast from
    exact integer counts with a fixed association order, so any engine
    recomputing the same counts produces bit-identical scores. The final
    per-group top-k is a rank filter Spark executes as WindowGroupLimit
    (pre-shuffle prune); partitions are vocabulary-bounded.

    Terms present in every document are dropped (their out-group margin
    is zero, chi² undefined); single-group inputs return no rows for the
    same reason.
    """
    pres = ensure_parallelism(df, id_col).select(
        F.col(group_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    # lazy barrier: a feeds both the term totals and the chi² join —
    # each re-ran the corpus explode without it. (group, term)-sized.
    a = pres.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("df_in")
    ).localCheckpoint(eager=False)
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_g"))
    totals = df.agg(F.count(F.lit(1)).alias("__n"))
    tot = a.groupBy("term").agg(F.sum("df_in").alias("__t_tot"))
    j = (
        a.join(tot, "term")
        .join(F.broadcast(sizes), group_col)
        .crossJoin(F.broadcast(totals))
        .filter(
            (F.col("__n") > F.col("__t_tot")) & (F.col("__n") > F.col("__n_g"))
        )
    )
    da = F.col("df_in").cast("double")
    db = (F.col("__n_g") - F.col("df_in")).cast("double")
    dc = (F.col("__t_tot") - F.col("df_in")).cast("double")
    dd = (F.col("__n") - F.col("__n_g") - (F.col("__t_tot") - F.col("df_in"))).cast(
        "double"
    )
    diff = da * dd - db * dc
    chi2 = (F.col("__n").cast("double") * (diff * diff)) / (
        ((da + db) * (dc + dd)) * ((da + dc) * (db + dd))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("chi2"), F.asc("term"))
    return (
        j.withColumn("chi2", chi2)
        .withColumn("df_out", (F.col("__t_tot") - F.col("df_in")))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(group_col, "term", "chi2", "df_in", "df_out")
    )


def cms_counts(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min-Sketch bucket counts: ``depth`` portable md5-derived hash
    rows × ``width`` buckets — (row, bucket, n). The sketch is a pure
    count aggregate (map-side combined, depth rows per input row through
    the shuffle, depth×width total output regardless of cardinality), so
    it merges across partitions/batches by addition — the mergeable-
    frequency analogue of hl1's HLL rollup.

    Because the hash rows are md5-derived (not engine-specific seeds),
    any engine rebuilds the IDENTICAL sketch — estimates included.
    """
    rows = []
    for j in range(depth):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{j}|"), F.col(col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        rows.append(
            df.select(
                F.lit(j).alias("row"), (h % F.lit(width)).cast("int").alias("bucket")
            )
        )
    stacked = rows[0]
    for r in rows[1:]:
        stacked = stacked.unionAll(r)
    return stacked.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("n"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each item: estimate = MIN over hash
    rows of that item's bucket count (the classic CMS upper bound —
    overestimates only, never under). The items side recomputes its
    md5 buckets and joins the depth×width sketch (broadcast)."""
    probes = None
    for j in range(depth):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{j}|"), F.col(col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        p = items.select(
            F.col(col), F.lit(j).alias("row"),
            (h % F.lit(width)).cast("int").alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(col)
        .agg(F.min("n").alias("cms_estimate"))
    )


def good_turing_counts(
    df: DataFrame,
    max_r: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Good-Turing frequency re-estimation over the corpus vocabulary
    (public: Good 1953, "The population frequencies of species"; Gale &
    Sampson 1995 popularized the recipe for LM smoothing) — the unseen-
    mass estimate a tokenizer/LM pipeline wants beside hp1's Heaps
    exponent and zipf1's rank-frequency fit: how much probability mass
    belongs to words we have NOT seen, and what an r-count word's
    frequency SHOULD be.

    From the word-count table, the frequency-of-frequencies histogram
    N_r (how many distinct words occur exactly r times), then the plain
    Turing estimate per row (r ≤ ``max_r``, the head where the raw
    estimator is usable before Gale-Sampson smoothing is needed):

        r*      = (r + 1) · N_{r+1} / N_r        (adjusted count)
        p_r     = r* / T                          (per-word probability)
        p0      = N_1 / T                         (total unseen mass)

    with T = total token occurrences. Everything is pure integer
    algebra: N_r and T are exact BIGINT aggregates, and the published
    estimators are single ratios of integer products, so ONE truncating
    division quantizes each to 1e-9 (r_star_q9 = (r+1)·N_{r+1}·1e9 //
    N_r, the ari1 contract) — N_{r+1} = 0 (a histogram gap) yields the
    mathematically-correct r* = 0, never NULL. p0_q9 rides every row
    (the single-row summary the caller reads off row 1).

    The report keeps the ``max_r`` LOWEST occupied r rows (ORDER BY r
    LIMIT max_r), not r ≤ max_r: Good-Turing's usable head is the
    low-frequency end of whatever histogram the corpus actually has,
    and a corpus whose rarest word still occurs thousands of times
    (small closed vocabularies) must report those rows rather than an
    empty frame.

    Scale shape: ONE map-side-combined word rollup (the module
    docstring's skew note applies), then a count-DOMAIN-sized histogram
    (≤ distinct r values ≪ corpus); the N_{r+1} lookup is a self-join
    on the tiny histogram. Returns (r, n_r, r_star_q9, p_r_q9, p0_q9),
    ordered by r.
    """
    counts = vocab_counts(df, text_col, id_col).select("term", "tf")
    # lazy checkpoint: hist is count-domain-sized but referenced four
    # times (rows, N_{r+1} lookup, T, N_1) — without the barrier each
    # reference re-derives the corpus word rollup (measured: 4 parquet
    # scans; with it, 1)
    hist = (
        counts.groupBy(F.col("tf").alias("r"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_r"))
        .localCheckpoint(eager=False)
    )
    tot = hist.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("t")
    )
    nxt = hist.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    # aggregate, not filter: a corpus with no singleton words must yield
    # n_1 = 0 on a 1-row frame, never an empty frame that would zero the
    # cross join
    n1 = hist.agg(
        F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0))
        .cast("long")
        .alias("n_1")
    )
    k9 = F.lit(1_000_000_000).cast("decimal(38,0)")
    num = (
        (F.col("r") + 1).cast("decimal(38,0)")
        * F.coalesce(F.col("n_r1"), F.lit(0)).cast("decimal(38,0)")
        * k9
    )
    den_r = F.col("n_r").cast("decimal(38,0)")
    den_p = den_r * F.col("t").cast("decimal(38,0)")

    def trunc_div(a, b):
        # all operands non-negative here, so DuckDB // and this agree
        return ((a - a % b) / b).cast("long")

    return (
        hist.orderBy("r")
        .limit(max_r)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            trunc_div(num, den_r).alias("r_star_q9"),
            trunc_div(num, den_p).alias("p_r_q9"),
            trunc_div(
                F.col("n_1").cast("decimal(38,0)") * k9,
                F.col("t").cast("decimal(38,0)"),
            ).alias("p0_q9"),
        )
        .orderBy("r")
    )

