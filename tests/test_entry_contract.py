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


def test_driver_window_holds_never_checked_round2_block():
    """Positions 1-50 must stay the round-3 rotation plan: the 48 round-2
    additions plus the two green anchors (COVERAGE.md rotation note)."""
    names = list(entry_mod.queries())
    first50 = set(names[:50])
    assert {"d8_block_dedup", "cc1_dup_clusters", "cs1_centroid_similarity",
            "q1_pricing_summary", "star_fact_rollup"} <= first50


def test_oracle_sql_strings_are_wellformed():
    for name, sql in entry_mod.oracle_sql().items():
        assert isinstance(sql, str) and len(sql.strip()) > 20, name
        # non-raw \b would have become a backspace control char (the
        # regex-in-SQL trap documented in the verify skill)
        assert "\x08" not in sql, f"{name}: backspace char — use r-string"
