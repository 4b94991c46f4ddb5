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


def test_driver_window_holds_round13_rotation():
    """Positions 1-50 must stay the round-13 rotation (VERDICT r12 item
    1): the window's job is staleness control — round-13 additions
    first (first driver check), then the two green anchors, then the 9
    r05 rows displaced at the r12 close (they led the refill pool),
    then the 23 alphabetically-first of the 48 exact-oracle rows last
    driver-checked in r07 (a17 leads; the 25 alphabetically-last r07
    rows are displaced to the refill head and lead the r14 fill). NO
    rows-only entry may ever sit in the first 50 — a no_oracle row
    would waste a driver window slot."""
    names = list(entry_mod.queries())
    r13_new = [
        "x13_ngram_decontamination", "d14_quality_canonical",
        "kwh1_kruskal_wallis", "mcc1_matthews_corr",
        "ca1_cochran_armitage", "lb1_ljung_box", "ccc1_lins_concordance",
        "mcn1_mcnemar_gates", "aov1_anova_f", "wel1_welch_t",
        "jt1_jonckheere", "dw1_durbin_watson", "rns1_runs_test",
        "lev1_brown_forsythe", "wsr1_weekly_shift",
        "fr1_friedman_daytype",
    ]
    anchors = ["q1_pricing_summary", "star_fact_rollup"]
    displaced_r05 = [
        "tm2_temperature_apply", "tp3_repair_pipeline",
        "tp4_release_pipeline", "tr1_triangles", "u4_llm_annotate",
        "un1_unicode_normalize", "url1_canonical_urls",
        "x1_chi2_keywords", "yoy1_revenue_growth",
    ]
    r07 = [
        "a17_trimmed_mean", "a18_hierarchy_share", "a19_group_mode",
        "at1_last_touch", "bf1_bloom_decontamination",
        "bfs1_copurchase_hops", "cal1_calendar_dim",
        "cm1_cms_heavyhitters", "cp1_compaction_plan",
        "csd1_cluster_size_histogram", "er1_entity_resolution",
        "fn2_cohort_funnel", "ga1_activity_islands", "h2_time_heatmap",
        "hl2_exact_rollup", "hw1_holt_forecast", "im1_mode_impute",
        "ivm1_incremental_rollup", "je1_join_explosion",
        "ka1_k_anonymity", "kc1_kcore", "knn1_label_transfer",
        "lp1_label_propagation", "lr1_revenue_trend",
        "lt1_conversion_latency", "mk1_event_transitions",
        "nv1_ngram_novelty", "o4_topk_with_ties", "pa1_top_paths",
        "pj1_prefix_jaccard", "pm1_pmi_collocations",
        "pn1_pseudonymize", "ps1_supply_relation",
        "qa1_revenue_momentum", "rc1_order_reconciliation",
        "rr1_reorder_rate", "sc2_pit_join", "sj1_stream_stream_join",
        "so1_set_ops", "ss1_repeated_substrings", "ss2_span_repair",
        "stp1_streaming_ingest", "t11_dup_block_rate",
        "tp5_decontaminated_release", "tw1_time_weighted_avg",
        "uq1_user_similarity", "zf1_zipf_slope", "zo1_zorder_key",
    ]
    assert len(r07) == 48 and r07 == sorted(r07)
    n_new = len(r13_new)
    assert names[:n_new] == r13_new
    assert names[n_new : n_new + 2] == anchors
    fill_n = 50 - n_new - 2
    fill = displaced_r05 + r07[: fill_n - len(displaced_r05)]
    assert names[n_new + 2 : 50] == fill
    first50 = set(names[:50])
    assert not (first50 & KNOWN_ROWS_ONLY), (
        "rows-only entries must never occupy a driver window slot"
    )
    # every window entry carries an exact oracle
    assert first50 <= set(entry_mod.oracle_sql())
    # the documented rows-only entries ride directly behind the window,
    # pinned out of any future window by position
    assert set(names[50:60]) == KNOWN_ROWS_ONLY
    # the displaced r07 tail leads the refill pool (r14's first fill)
    n_disp = len(r07) - (fill_n - len(displaced_r05))
    assert names[60 : 60 + n_disp] == r07[fill_n - len(displaced_r05):]


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
