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


def test_driver_window_holds_round12_rotation():
    """Positions 1-50 must stay the round-12 rotation (VERDICT r11 item
    1): the window's job is staleness control — round-12 additions
    first (first driver check), then the two green anchors, then the 39
    alphabetically-first of the 48 exact-oracle rows last driver-checked
    in r05 (a20 leads; the six alphabetically-last r05 rows are
    displaced to the refill head and lead the r13 fill). NO rows-only
    entry may ever sit in the first 50 — a no_oracle row would waste a
    driver window slot."""
    names = list(entry_mod.queries())
    r12_new = [
        "sps1_streaming_psi", "mk2_mann_kendall", "ts2_theil_sen",
        "kp1_cohens_kappa", "crv1_cramers_v", "kt1_kendall_tau",
        "cld1_cliffs_delta", "dlg1_auc_delong_se", "rbo1_rank_overlap",
    ]
    anchors = ["q1_pricing_summary", "star_fact_rollup"]
    r05 = [
        "a20_abc_analysis", "an1_revenue_anomalies", "br1_bounce_rate",
        "cc2_dup_hubs", "ck1_table_checksum", "cl2_cluster_keywords",
        "cx2_split_leakage", "d10_incremental_dedup",
        "d11_minhash_calibration", "d12_url_dedup",
        "d13_dup_rate_by_source", "d9_priority_dedup",
        "dc1_dataset_card", "dr2_quality_drift", "e10_cosine_topk_arrow",
        "e8_sq_topk", "em1_embedding_covariance", "f13_map_funcs",
        "fi1_frequent_pairs", "fi2_association_rules", "gn1_revenue_gini",
        "hh1_supplier_concentration", "hn1_hard_negatives",
        "iet1_interpurchase_histogram", "ir1_retrieval_report",
        "ln1_lorenz_deciles", "mm1_media_similarity", "pf1_top_values",
        "pk2_packing_report", "pr1_pagerank", "qn1_percent_rank",
        "qsel1_classifier_topfrac", "rfm1_customer_segments",
        "rrf1_rank_fusion", "t10_gopher_gate", "t12_blocklist_gate",
        "tc1_table_diff", "tj4_asof_tolerance", "tm1_temperature_mix",
        "tm2_temperature_apply", "tp3_repair_pipeline",
        "tp4_release_pipeline", "tr1_triangles", "u4_llm_annotate",
        "un1_unicode_normalize", "url1_canonical_urls",
        "x1_chi2_keywords", "yoy1_revenue_growth",
    ]
    assert len(r05) == 48 and r05 == sorted(r05)
    n_new = len(r12_new)
    assert names[:n_new] == r12_new
    assert names[n_new : n_new + 2] == anchors
    fill_n = 50 - n_new - 2
    assert names[n_new + 2 : 50] == r05[:fill_n]
    first50 = set(names[:50])
    assert not (first50 & KNOWN_ROWS_ONLY), (
        "rows-only entries must never occupy a driver window slot"
    )
    # every window entry carries an exact oracle
    assert first50 <= set(entry_mod.oracle_sql())
    # the documented rows-only entries ride directly behind the window,
    # pinned out of any future window by position
    assert set(names[50:60]) == KNOWN_ROWS_ONLY
    # the displaced r05 tail leads the refill pool (r13's first fill)
    assert names[60 : 60 + (48 - fill_n)] == r05[fill_n:]


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
