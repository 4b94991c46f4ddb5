"""Meta-guards on the driver contract: every query is registered
consistently and rows-only entries are the documented exceptions."""

from __future__ import annotations

import __spark_entry__ as entry_mod

# engine-specific sketches / iterative algorithms with a documented twin
# or pytest verification instead of a SQL oracle
KNOWN_ROWS_ONLY = {
    "a11_approx_distinct",   # HLL sketch; exact twin a10_distinct_agg
    "d3_minhash_candidates", # xxhash64 prod default; exact twin d7
    "d4_simhash",            # xxhash64 prod default; exact twin d6
    "e2_ann_lsh",            # xxhash64 prod default; exact twin e5
    "e3_embedding_neardup",  # xxhash64 prod default; exact twin e6
    "tp1_curation_pipeline", # xxhash64 prod default; exact twin tp2
    "hl1_sketch_rollup",     # HLL sketch union; exact twin hl2
    "pc1_pca_projection",    # eigendecomposition; pytest vs numpy
    "e9_pq_topk",            # iterative k-means codebooks; pytest vs exact path
    "dq2_profile_approx",    # HLL estimates; exact twin dq1_profile
}


def test_every_query_has_oracle_or_documented_exception():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    rows_only = qs - oracles
    assert rows_only == KNOWN_ROWS_ONLY, (
        f"undocumented rows-only queries: {rows_only - KNOWN_ROWS_ONLY}; "
        f"stale exceptions: {KNOWN_ROWS_ONLY - rows_only}"
    )


def test_driver_window_holds_round10_rotation():
    """Positions 1-50 must stay the round-10 rotation (VERDICT r09 item
    2): with the never-driver-checked backlog empty, the window's job
    is staleness control — positions 1-6 the round-10 additions (uniT,
    pj1c, uni2, jl1, kn1, iso1 — first driver check), 7-8 the two green
    anchors, 9-30 the 22 stalest exact-oracle rows (last driver-checked
    r02), 31-50 the 20 alphabetically-first of the 48 next-stalest
    (r03; the additions displaced o3/mx2/mx1/kw1 to the refill-pool
    head). New round-11 queries insert right after the anchors, each
    displacing the least-stale refill entry past position 50 — so the
    assertion is subset-shaped for the refill blocks. NO rows-only
    entry may ever sit in the first 50 — a no_oracle row would waste a
    driver window slot."""
    names = list(entry_mod.queries())
    assert names[:6] == [
        "uniT_unigram_em", "pj1c_prefix_jaccard_capped",
        "uni2_unigram_fertility", "jl1_random_projection",
        "kn1_kneser_ney", "iso1_isotonic_calibration"]
    assert names[6:8] == ["q1_pricing_summary", "star_fact_rollup"]
    r02 = {
        "a4_guard_derive", "cx1_contamination", "d6_simhash_portable",
        "d7_minhash_portable", "e1_cosine_topk", "e4_ivf_topk",
        "e5_ann_portable", "e6_neardup_portable", "e7_kmeans",
        "f11_variant_json", "m1_media_metadata", "pk1_token_packing",
        "q12_late_priority", "sd1_semantic_dedup",
        "sh1_deterministic_shuffle", "sp2_stratified_sample",
        "t2_quality_score", "t3_language_id", "t4_fingerprint",
        "t7_repetition_stats", "t8_pii_redaction", "tp2_curation_portable",
    }
    r03 = {
        "a14_grouping_sets", "a15_conditional_aggs", "a16_group_percentiles",
        "ag1_ordered_string_agg", "cc1_dup_clusters", "cd1_cdc_snapshot",
        "cl1_cluster_stats", "cs1_centroid_similarity", "cv1_coverage_curve",
        "d8_block_dedup", "dq1_profile", "dr1_drift_psi", "ds1_domain_score",
        "dv1_constraints", "ev_hopping", "fn1_funnel", "fz1_fuzzy_pairs",
        "h1_histogram", "iv1_interval_overlap", "ix1_global_index",
    }
    first50 = set(names[:50])
    # the r02 block must all be inside the window (staleness priority);
    # the r03 block fills the rest, tail entries displaced by new queries
    # (uni2/jl1/kn1/iso1 displaced o3_topk_per_group, mx2_mix_apply,
    # mx1_mix_plan and kw1_keywords to the refill-pool head)
    assert r02 <= first50, f"stale r02 rows fell out: {r02 - first50}"
    non_refill = first50 - r02 - r03 - {
        "uniT_unigram_em", "pj1c_prefix_jaccard_capped",
        "uni2_unigram_fertility", "jl1_random_projection",
        "kn1_kneser_ney", "iso1_isotonic_calibration",
        "q1_pricing_summary", "star_fact_rollup"}
    # anything else in the window must be a round-11+ addition sitting
    # between the anchors and the refill (positions 9+)
    for extra in non_refill:
        assert 8 <= names.index(extra) < 50 - len(r02), extra
    assert not (first50 & KNOWN_ROWS_ONLY), (
        "rows-only entries must never occupy a driver window slot"
    )
    # every window entry carries an exact oracle
    assert first50 <= set(entry_mod.oracle_sql())
    # the documented rows-only entries ride directly behind the window,
    # pinned out of any future window by position
    assert set(names[50:60]) == KNOWN_ROWS_ONLY


def test_readme_counts_match_catalog():
    """README's stated query/oracle counts must track the live catalog
    (VERDICT r04/r05: the claim went stale two rounds running)."""
    import os

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    claim = f"{len(entry_mod.queries())} `queries()` ({len(entry_mod.oracle_sql())} with"
    assert claim in readme, (
        f"README count drift: expected the string {claim!r}"
    )


def test_ws_oracle_null_guard():
    """The shared _WS token-count SQL must yield 0 (not NULL) for NULL
    text, mirroring operators/text.whitespace_token_count — otherwise
    engine and oracle diverge the moment documents carries NULL rows."""
    import duckdb

    val = duckdb.sql(
        f"SELECT {entry_mod._WS} AS c "
        "FROM (SELECT CAST(NULL AS VARCHAR) AS text)"
    ).fetchone()[0]
    assert val == 0


def test_oracle_sql_strings_are_wellformed():
    for name, sql in entry_mod.oracle_sql().items():
        assert isinstance(sql, str) and len(sql.strip()) > 20, name
        # non-raw \b would have become a backspace control char (the
        # regex-in-SQL trap documented in the verify skill)
        assert "\x08" not in sql, f"{name}: backspace char — use r-string"
