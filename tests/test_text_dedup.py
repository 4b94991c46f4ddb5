"""Text analysis + dedup operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_oms_spark.operators.dedup import (
    exact_dedup,
    hamming_distance,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from etl_oms_spark.operators.text import (
    bpe_token_count,
    fingerprint_md5,
    language_id,
    quality_score,
    rolling_hash,
    whitespace_token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The  quick brown fox jumps over the lazy dog"),  # whitespace/case dup of 1
    (3, "the quick brown fox jumps over the lazy cat today"),  # near-dup of 1
    (4, "completely different content about spark engines and shuffles"),
    (5, "der hund und die katze sind nicht das problem"),  # German
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! a b"), (2, ""), (3, "   ")], ["i", "text"])
    out = {r["i"]: (r["ws"], r["bpe"]) for r in df.select(
        "i",
        whitespace_token_count("text").alias("ws"),
        bpe_token_count("text").alias("bpe"),
    ).collect()}
    assert out[1] == (4, 6)  # ws: [hello, world!, a, b]; bpe: hello , world ! a b
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)


def test_language_id(spark):
    out = {r["doc_id"]: r["l"] for r in _docs(spark).select(
        "doc_id", language_id("text").alias("l")).collect()}
    assert out[1] == "en"
    assert out[5] == "de"
    assert out[4] == "en"  # 'and' hits


def test_quality_score_bounds(spark):
    rows = _docs(spark).select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_fingerprint_normalizes(spark):
    rows = _docs(spark).select("doc_id", fingerprint_md5("text").alias("fp")).collect()
    fp = {r["doc_id"]: r["fp"] for r in rows}
    assert fp[1] == fp[2]  # case/whitespace-insensitive
    assert fp[1] != fp[3]


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "c b a")], ["i", "text"])
    out = {r["i"]: r["h"] for r in df.select("i", rolling_hash("text").alias("h")).collect()}
    assert out[1] != out[2]


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark)).collect()
    ids = {r["doc_id"]: r["dup_count"] for r in out}
    assert len(out) == 4  # docs 1+2 collapse
    assert ids[1] == 2  # min-id representative with count


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], ["i", "text"])
    out = {r["i"]: sorted(r["s"]) for r in df.select("i", shingles("text", 3).alias("s")).collect()}
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == ["a b"]  # shorter than k → whole text


def test_minhash_dedup_drops_near_dup(spark):
    # lots of shared 3-shingles between 1/2/3; 4/5 unique
    out = minhash_dedup(_docs(spark), threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert 1 in kept and 4 in kept and 5 in kept
    assert 2 not in kept  # exact dup (jaccard 1.0) always dropped
    assert len(kept) <= 4


def test_minhash_signature_shape(spark):
    sig = minhash_signatures(_docs(spark), num_hashes=16)
    assert sig.columns == ["doc_id", "minhash"]
    rows = sig.collect()
    assert len(rows) == 5
    assert all(len(r["minhash"]) == 16 for r in rows)


def test_simhash_near_dups_close(spark):
    out = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
    df = _docs(spark).sparkSession.createDataFrame(
        [(out[1], out[2]), (out[1], out[4])], "a long, b long"
    )
    d = df.select(hamming_distance(F.col("a"), F.col("b")).alias("d")).collect()
    assert d[0]["d"] == 0  # identical canonical text → identical simhash
    assert d[1]["d"] > 10  # unrelated text → far fingerprint


def test_ngram_jaccard_exact(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.99, k=1)
    out = [(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs.collect()]
    assert out == [(1, 2, 1.0)]  # only the exact dup at ~1.0


def test_ngram_jaccard_max_df_caps_blowup(spark):
    # with max_df=1 every shared token is dropped → no pairs at all
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.1, k=1, max_df=1)
    assert pairs.count() == 0


def test_quadratic_twins_default_finite_max_df(spark):
    """The exact-pair oracle twins default to a FINITE max_df so a naive
    call on a stopword-heavy corpus can't go all-pairs quadratic."""
    import inspect

    from etl_oms_spark.operators.dedup import containment_pairs

    assert inspect.signature(ngram_jaccard_pairs).parameters["max_df"].default == 1000
    assert inspect.signature(containment_pairs).parameters["max_df"].default == 1000

    # mechanism: 'the' appears in every doc, docs otherwise disjoint —
    # capped (max_df=2) the stopword is excluded and no pair survives;
    # uncapped every one of the C(6,2)=15 pairs joins through 'the'
    docs = [(i, f"the unique{i} word{i}") for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert ngram_jaccard_pairs(df, threshold=0.01, k=1, max_df=2).count() == 0
    assert ngram_jaccard_pairs(df, threshold=0.01, k=1, max_df=None).count() == 15
    assert containment_pairs(df, threshold=0.01, k=1, max_df=2).count() == 0


def test_chunk_documents_udtf(spark):
    from etl_oms_spark.operators.text import chunk_documents_udtf

    spark.udtf.register("chunk_documents_t", chunk_documents_udtf())
    spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "solo"), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("chunk_in")
    rows = spark.sql(
        "SELECT c.* FROM chunk_in, LATERAL chunk_documents_t(doc_id, text, 6, 2) c"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, window 6, step 4 -> chunks [0:6], [4:10]; the loop
    # stops once a window reaches the end (no [8:10] tail chunk)
    spans = [(r["start_tok"], r["end_tok"]) for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])]
    assert spans == [(0, 6), (4, 10)]
    assert by_doc[1][0]["chunk"] == "w0 w1 w2 w3 w4 w5"
    # single-token doc -> one chunk; null text -> no rows
    assert [(r["start_tok"], r["end_tok"]) for r in by_doc[2]] == [(0, 1)]
    assert 3 not in by_doc


def test_jaccard_containment_k3_ansi_no_overflow(spark):
    """Audit: multi-word shingles (k=3) under ANSI mode — string-concat
    shingles and long counts have no overflow surface; results stay sane
    on real testdata."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        jac = ngram_jaccard_pairs(docs, threshold=0.8, k=3)
        rows = jac.collect()
        assert all(0.0 <= r["jaccard"] <= 1.0 for r in rows)
        from etl_oms_spark.operators.dedup import containment_pairs

        cont = containment_pairs(docs, threshold=0.8, k=3).collect()
        assert all(0.0 <= r["containment"] <= 1.0 for r in cont)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_simhash_md5_variant_matches_semantics(spark):
    """The portable md5 simhash ranks similarity the same way as the
    xxhash64 default: identical canonical text → distance 0, unrelated
    text → far; and the fingerprint is deterministic across partitionings."""
    from etl_oms_spark.operators.dedup import simhash

    out = {r["doc_id"]: r["simhash"]
           for r in simhash(_docs(spark), bits=60, hash_method="md5").collect()}
    out2 = {r["doc_id"]: r["simhash"]
            for r in simhash(_docs(spark).repartition(7), bits=60,
                             hash_method="md5").collect()}
    assert out == out2
    df = _docs(spark).sparkSession.createDataFrame(
        [(out[1], out[2]), (out[1], out[4])], "a long, b long"
    )
    d = df.select(hamming_distance(F.col("a"), F.col("b")).alias("d")).collect()
    assert d[0]["d"] == 0
    assert d[1]["d"] > 10

    import pytest

    with pytest.raises(ValueError):
        simhash(_docs(spark), bits=64, hash_method="md5")  # >60 bits


def test_minhash_md5_variant_finds_near_dups(spark):
    """md5-based signatures + string-keyed bands surface the same obvious
    near-dup pair as the xxhash64 path."""
    from etl_oms_spark.operators.dedup import lsh_candidate_pairs

    sigs = minhash_signatures(_docs(spark), hash_method="md5")
    pairs = {(r["id_a"], r["id_b"])
             for r in lsh_candidate_pairs(sigs, hash_method="md5").collect()}
    assert (1, 2) in pairs  # exact dup always a candidate


def test_block_dedup_strips_repeated_boilerplate(spark):
    """The shared license header survives only in the first doc; unique
    body text survives everywhere; fully-duplicate docs empty out."""
    from etl_oms_spark.operators.dedup import block_dedup

    header = "copyright notice all rights reserved do not remove this line"
    rows = [
        (1, header + " alpha beta gamma delta unique first body"),
        (2, header + " epsilon zeta eta theta second body text here"),
        (3, header),  # nothing but the boilerplate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in block_dedup(df, block_words=5).collect()}

    assert out[1]["n_kept"] == out[1]["n_blocks"]  # first occurrence keeps all
    assert out[1]["kept_text"].startswith("copyright notice all rights reserved")
    # doc 2 loses exactly the two full header blocks (10 of its words),
    # keeps its tail blocks (header tail merges into a distinct block)
    assert out[2]["n_kept"] < out[2]["n_blocks"]
    assert "second body text here" in out[2]["kept_text"]
    assert not out[2]["kept_text"].startswith("copyright notice")
    # doc 3 is the header verbatim: every block already seen -> empties out
    assert out[3]["n_kept"] == 0
    assert out[3]["kept_text"] == ""


def test_block_dedup_partitioning_invariant(spark, sf_dir):
    from etl_oms_spark.operators.dedup import block_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = block_dedup(docs, block_words=8)
    b = block_dedup(docs.repartition(13), block_words=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_intra_doc_block_dedup(spark):
    from etl_oms_spark.operators.dedup import intra_doc_block_dedup

    rep = "alpha beta gamma delta"          # one 4-word block
    df = spark.createDataFrame(
        [
            (1, f"{rep} {rep} epsilon zeta eta theta"),  # block repeated within doc
            (2, rep),                                     # same block in ANOTHER doc: untouched
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in intra_doc_block_dedup(df, block_words=4).collect()}
    assert out[1]["n_blocks"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == f"{rep} epsilon zeta eta theta"
    # cross-doc occurrences are NOT deduped by the intra-doc pass
    assert out[2]["n_kept"] == 1 and out[2]["kept_text"] == rep


def test_intra_doc_block_dedup_null_and_empty_text(spark):
    """NULL text must not explode into sequence(0,-1)'s descending bogus
    positions; both NULL and '' yield one (empty) block, n_blocks=1."""
    from etl_oms_spark.operators.dedup import intra_doc_block_dedup

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "alpha beta gamma delta")],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in intra_doc_block_dedup(df, block_words=4).collect()}
    assert out[1]["n_blocks"] == 1 and out[1]["n_kept"] == 1
    assert out[2]["n_blocks"] == 1 and out[2]["n_kept"] == 1
    assert out[3]["n_kept"] == 1 and out[3]["kept_text"] == "alpha beta gamma delta"


def test_dup_block_rate_hand_case(spark):
    from etl_oms_spark.operators.dedup import dup_block_rate

    blk = "w1 w2 w3 w4 w5 w6 w7 w8"
    uniq_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    uniq_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = spark.createDataFrame(
        [
            (1, f"{blk} {uniq_a}", "s1"),   # 2 blocks: dup + unique
            (2, f"{blk} {uniq_b}", "s2"),   # 2 blocks: dup + unique
            (3, uniq_b, "s2"),              # 1 block: duplicated within s2
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {r["source"]: r for r in dup_block_rate(df, block_words=8).collect()}
    # s1: blocks [blk, uniq_a]; blk appears in s2 too -> 1/2 dup
    assert got["s1"]["n_blocks"] == 2 and got["s1"]["n_dup"] == 1
    assert got["s1"]["dup_rate"] == 0.5
    # s2: blocks [blk, uniq_b, uniq_b] -> all three are duplicated somewhere
    assert got["s2"]["n_blocks"] == 3 and got["s2"]["n_dup"] == 3
    assert got["s2"]["dup_rate"] == 1.0


# ---------------------------------------------------------------------------
# cross-document exact-substring spans (Lee et al. 2022 style)


def _spans(df, **kw):
    from etl_oms_spark.operators.dedup import repeated_substring_spans

    rows = repeated_substring_spans(df, **kw).collect()
    return sorted((r["doc_id"], r["span_start"], r["span_len"]) for r in rows)


def test_repeated_substring_spans_merges_overlapping_windows(spark):
    shared = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (1, "prefix " + shared + " suffix words here"),
            (2, shared + " and other trailing content goes here"),
            (3, "completely different text with no repeats at all whatsoever"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    # the 10 shared tokens hold three 8-token windows per doc; they merge
    # into ONE maximal span each: doc 1 at offset 2 (after "prefix"),
    # doc 2 at offset 1, both exactly 10 tokens long
    assert _spans(df, min_len_tokens=8, min_docs=2) == [(1, 2, 10), (2, 1, 10)]


def test_repeated_substring_spans_within_doc_repeats_do_not_qualify(spark):
    blk = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, blk + " filler " + blk), (2, "nothing in common with that one ok")],
        "doc_id long, text string",
    )
    # the 8-token block repeats only INSIDE doc 1 -> count(distinct doc)=1
    assert _spans(df, min_len_tokens=8, min_docs=2) == []


def test_repeated_substring_spans_distinct_gaps_stay_separate(spark):
    a = "one two three four five six seven eight"
    b = "alpha beta gamma delta epsilon zeta eta theta"
    gap = "x y z w v u t s r q p o n m"  # > 8 tokens between the two hits
    df = spark.createDataFrame(
        [(1, a + " " + gap + " " + b), (2, a + " unrelated tail " + b)],
        "doc_id long, text string",
    )
    got = _spans(df, min_len_tokens=8, min_docs=2)
    # doc 1: spans at 1 (len 8) and 23 (len 8); doc 2: 1 and 11
    assert got == [(1, 1, 8), (1, 23, 8), (2, 1, 8), (2, 11, 8)]


def test_repeated_substring_spans_min_docs_threshold(spark):
    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "another doc entirely unlike the others yes")],
        "doc_id long, text string",
    )
    assert len(_spans(df, min_len_tokens=8, min_docs=2)) == 2
    assert _spans(df, min_len_tokens=8, min_docs=3) == []


# ---------------------------------------------------------------------------
# PPJoin-style prefix-filtered exact Jaccard join


def test_prefix_filtered_jaccard_equals_uncapped_exact(spark):
    """Prefix filtering is an optimization, never an approximation: on a
    corpus slice the pair set and every jaccard value must equal the
    plain uncapped inverted-index join."""
    from etl_oms_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for thr in (0.6, 0.9):
        got = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 12))
            for r in prefix_filtered_jaccard_pairs(d, threshold=thr).collect()
        }
        want = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 12))
            for r in ngram_jaccard_pairs(
                d, threshold=thr, k=1, max_df=None
            ).collect()
        }
        assert got == want and len(got) > 0


def test_prefix_filtered_jaccard_hand_case(spark):
    from etl_oms_spark.operators.dedup import prefix_filtered_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d f"),   # |∩|=4, |∪|=6 → 2/3
            (3, "a b c d e"),   # identical to 1 → 1.0
            (4, "x y z"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in prefix_filtered_jaccard_pairs(df, threshold=0.6).collect()
    }
    assert got == {(1, 2): round(2 / 3, 6), (1, 3): 1.0, (2, 3): round(2 / 3, 6)}


def test_strip_spans_surgery(spark):
    from etl_oms_spark.operators.dedup import strip_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z"), (3, "p q r s")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 3, 4), (3, 1, 4)],  # doc 3 fully covered
        "doc_id long, span_start long, span_len long",
    )
    got = {
        r["doc_id"]: (r["kept_text"], r["n_tokens_removed"])
        for r in strip_spans(docs, spans).collect()
    }
    # doc 2 had no spans -> absent; doc 3 fully removed -> empty text
    assert got == {1: ("a b g h", 4), 3: ("", 4)}


def test_detect_then_repair_roundtrip_removes_all_cross_doc_repeats(spark):
    """After one detect->cut pass over ALL occurrences, no 8-token window
    is shared across documents anymore (the policy's fixpoint-in-one-pass
    property on the strip-everywhere variant)."""
    from etl_oms_spark.operators.dedup import (
        repeated_substring_spans,
        strip_spans,
    )
    from pyspark.sql import functions as F

    shared = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "intro " + shared + " outro one two"),
            (2, shared + " tail words here now ok"),
            (3, "fully distinct text without any repeated runs at all"),
        ],
        "doc_id long, text string",
    )
    spans = repeated_substring_spans(docs, min_len_tokens=8, min_docs=2)
    repaired = strip_spans(docs, spans)
    # rebuild a corpus: repaired docs replace originals
    rebuilt = (
        docs.join(repaired, "doc_id", "left_anti")
        .select("doc_id", "text")
        .unionByName(
            repaired.select("doc_id", F.col("kept_text").alias("text"))
        )
    )
    again = repeated_substring_spans(rebuilt, min_len_tokens=8, min_docs=2)
    assert again.count() == 0
