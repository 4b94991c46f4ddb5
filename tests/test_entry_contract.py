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


def test_driver_window_holds_round11_rotation():
    """Positions 1-50 must stay the round-11 rotation (VERDICT r10 item
    2): the window's job is staleness control — round-11 additions
    first (first driver check), then the two green anchors, then the 37
    stalest exact-oracle rows (last driver-checked r03, 8 rounds
    stale), then the alphabetically-first of the 48 next-stalest (r05)
    as fill. New round-11 queries insert before the anchors, each
    displacing the least-stale r05 fill entry past position 50 — so the
    assertion is subset-shaped for the fill block. NO rows-only entry
    may ever sit in the first 50 — a no_oracle row would waste a driver
    window slot."""
    names = list(entry_mod.queries())
    r11_new = {
        "ct1p_rank_langid_prefix", "uniT2_unigram_em_pruned",
        "gt1_good_turing", "db1_davies_bouldin",
        "sr1_spearman_quality_length", "cusum1_event_changepoint",
        "cf1_conformal_coverage", "ot1_wasserstein_quality",
        "qq1_quality_deciles", "eta1_quality_by_source",
        "scs1_streaming_cusum",
    }
    anchors = ["q1_pricing_summary", "star_fact_rollup"]
    # additions lead; anchors ride immediately behind them
    n_new = len(r11_new)
    assert set(names[:n_new]) == r11_new
    assert names[n_new : n_new + 2] == anchors
    r03 = {
        "dr1_drift_psi", "ds1_domain_score", "dv1_constraints",
        "ev_hopping", "fn1_funnel", "fz1_fuzzy_pairs", "h1_histogram",
        "iv1_interval_overlap", "ix1_global_index", "kw1_keywords",
        "mx1_mix_plan", "mx2_mix_apply", "o3_topk_per_group",
        "pp1_lm_fluency", "pp2_perplexity_buckets",
        "qc1_quality_classifier", "r4_pivot_multi", "rs1_resample_ffill",
        "rt1_retention", "sc1_scd2", "sk1_salted_join", "sk2_skew_report",
        "sp3_domain_cap", "st1_grouped_stats", "st2_correlation",
        "st3_entropy", "t9_intra_dedup", "tj3_asof_forward", "ts1_bm25",
        "v1_vocab_topk", "v2_bigram_merge_rank", "vs1_source_overlap",
        "w4_winsorize", "w5_range_frame", "w6_rolling_distinct",
        "w7_mad_outliers", "wt1_weighted_sample",
    }
    assert len(r03) == 37
    first50 = set(names[:50])
    # the full r03 cohort must be inside the window (staleness
    # priority); r05 alphabetical fill takes the remaining slots
    assert r03 <= first50, f"stale r03 rows fell out: {r03 - first50}"
    fill = first50 - r03 - r11_new - set(anchors)
    r05_head = [
        "a20_abc_analysis", "an1_revenue_anomalies", "br1_bounce_rate",
        "cc2_dup_hubs", "ck1_table_checksum", "cl2_cluster_keywords",
        "cx2_split_leakage", "d10_incremental_dedup",
        "d11_minhash_calibration", "d12_url_dedup",
    ]
    # fill must be a prefix of the r05 alphabetical cohort
    assert fill == set(r05_head[: len(fill)]), fill
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
