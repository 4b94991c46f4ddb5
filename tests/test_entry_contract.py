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


def test_driver_window_holds_round9_rotation():
    """Positions 1-50 must stay the round-9 rotation (VERDICT r08 item
    1): 1-3 the round-8 additions (the only never-driver-checked
    exact-oracle entries left), then the two green anchors, then the 18
    stalest rows (last driver-checked r01) and the 27 next-stalest
    (r02). New round-9 queries are inserted right after the anchors,
    each displacing the least-stale refill entry past position 50 — so
    the assertion is subset-shaped for the refill blocks. NO rows-only
    entry may ever sit in the first 50 — a no_oracle row would waste a
    driver window slot."""
    names = list(entry_mod.queries())
    assert names[:3] == [
        "bpe1_bpe_merges", "bpe2_bpe_fertility", "sdd1_streaming_dedup"]
    assert names[3:5] == ["q1_pricing_summary", "star_fact_rollup"]
    assert names[5:10] == [
        "wp1_wordpiece_merges", "kcs1_kcenter_coreset",
        "ssw1_streaming_sessions", "rag1_context_assembly",
        "uni1_unigram_segments"]
    refill = {
        # last checked r01
        "q9_product_type_profit", "q2_min_cost_supplier",
        "q13_customer_distribution", "s_set_ops", "f9_string_funcs",
        "a9_having_filter", "q4_order_priority", "q19_disjunctive",
        "q22_global_avg_filter", "n1_null_semantics", "q7_volume_shipping",
        "q8_market_share", "q10_returned_items", "q14_promo_ratio",
        "q18_large_volume", "q6_forecast_revenue", "q11_important_parts",
        "q15_top_supplier",
        # last checked r02
        "q16_supplier_part_count", "q20_potential_promotion",
        "q21_waiting_suppliers", "ar1_array_funcs", "ar2_explode_wordcount",
        "w3_rank_functions", "t5_regex_extract", "f10_date_funcs",
        "tj1_asof_join", "tj2_range_join", "rl1_time_rollup",
        "ev_sessionize", "a10_distinct_agg", "a12_cube", "a13_exact_median",
        "u2_grouped_ema", "d1_exact_dedup", "d2_ngram_jaccard",
        "d5_containment", "t6_quality_filter", "sp1_deterministic_split",
        "t1_token_stats", "t2_quality_score", "t3_language_id",
        "t4_fingerprint", "e1_cosine_topk", "e4_ivf_topk",
    }
    # the r01 block must all be inside the window (staleness priority);
    # the r02 block fills the rest, tail entries displaced by new queries
    r01 = {n for n in refill if n in {
        "q9_product_type_profit", "q2_min_cost_supplier",
        "q13_customer_distribution", "s_set_ops", "f9_string_funcs",
        "a9_having_filter", "q4_order_priority", "q19_disjunctive",
        "q22_global_avg_filter", "n1_null_semantics", "q7_volume_shipping",
        "q8_market_share", "q10_returned_items", "q14_promo_ratio",
        "q18_large_volume", "q6_forecast_revenue", "q11_important_parts",
        "q15_top_supplier"}}
    first50 = set(names[:50])
    assert r01 <= first50, f"stale r01 rows fell out: {r01 - first50}"
    non_refill = first50 - refill - {
        "bpe1_bpe_merges", "bpe2_bpe_fertility", "sdd1_streaming_dedup",
        "q1_pricing_summary", "star_fact_rollup"}
    # anything else in the window must be a round-9+ addition sitting
    # between the anchors and the refill (positions 6+)
    for extra in non_refill:
        assert 5 <= names.index(extra) < 50 - len(r01), extra
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
