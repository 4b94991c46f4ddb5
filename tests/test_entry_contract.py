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


def test_driver_window_holds_round8_rotation():
    """Positions 1-50 must stay the round-8 FINAL rotation (VERDICT r07
    item 2): 1-21 the round-7 queue (the last never-driver-checked
    exact-oracle entries), 22-23 the two green anchors, 24-50 the 27
    stalest rows (all last driver-checked in round 1). NO rows-only
    entry may ever sit in the first 50 — a no_oracle row would waste a
    driver window slot."""
    names = list(entry_mod.queries())
    assert names[:21] == [
        "auc1_quality_auc", "ks1_score_ks", "rb1_reliability_bins",
        "ap1_average_precision", "sw1_soft_dedup_weights",
        "ld1_l_diversity", "bd1_benford_audit", "js1_source_divergence",
        "en1_char_entropy", "fl1_readability", "zipf1_token_zipf",
        "sb1_release_scorecard", "ndcg1_retrieval_ndcg",
        "mrr1_reciprocal_rank", "tcl1_t_closeness", "acf1_autocorrelation",
        "cpd1_change_point", "hp1_heaps_law", "sv1_survival_hazard",
        "e11_pq_portable", "pc2_pca_portable"]
    assert names[21:23] == ["q1_pricing_summary", "star_fact_rollup"]
    assert set(names[23:50]) == {
        "p2_p3_reconcile", "p6_p7_filters", "j1_dim_join",
        "j2_multikey_join", "p9_semi_join", "j4_anti_join",
        "a1_a6_surrogate_dim", "a2_keep_last", "w1_lag_diff", "o1_topk",
        "r1_unpivot", "r2_pivot", "r2_pivot_roundtrip",
        "f1_tolerant_dates", "f5_f6_rate_math", "f7_unit_map",
        "f8_json_extract", "f12_decimal_sums", "u3_chunk_udtf",
        "s4_source_classify", "j5_upsert_merge", "ev_window_agg",
        "q3_shipping_priority", "q5_supplier_volume",
        "q17_avg_quantity_filter", "a8_rollup", "w2_window_frames"}
    first50 = set(names[:50])
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
