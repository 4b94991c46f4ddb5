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


def test_driver_window_holds_never_checked_round3_block():
    """Positions 1-50 must stay the round-4 rotation plan: 48 round-3/3b
    additions that have never had a driver CORRECTNESS row, plus the two
    green anchors (COVERAGE.md rotation note). Position 51+ leads with
    the 31-query round-5 queue."""
    names = list(entry_mod.queries())
    first50 = set(names[:50])
    assert {"un1_unicode_normalize", "d13_dup_rate_by_source",
            "tp4_release_pipeline", "tp3_repair_pipeline", "tr1_triangles",
            "qn1_percent_rank", "em1_embedding_covariance",
            "q1_pricing_summary", "star_fact_rollup"} <= first50
    # the round-5 queue sits immediately after the window
    assert set(names[50:81]) == {
        "ga1_activity_islands", "mk1_event_transitions",
        "tw1_time_weighted_avg", "zo1_zorder_key", "cp1_compaction_plan",
        "nv1_ngram_novelty", "pc1_pca_projection", "so1_set_ops",
        "hl1_sketch_rollup", "hl2_exact_rollup", "h2_time_heatmap",
        "ps1_supply_relation", "qa1_revenue_momentum", "t11_dup_block_rate",
        "zf1_zipf_slope", "a17_trimmed_mean", "a18_hierarchy_share",
        "o4_topk_with_ties", "a19_group_mode", "im1_mode_impute",
        "e9_pq_topk", "dq2_profile_approx", "uq1_user_similarity",
        "fn2_cohort_funnel", "cm1_cms_heavyhitters", "cal1_calendar_dim",
        "lp1_label_propagation", "knn1_label_transfer",
        "lt1_conversion_latency", "rc1_order_reconciliation",
        "rr1_reorder_rate"}


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
