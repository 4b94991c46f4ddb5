"""Plan-shape pins for the round-10 late operators: the properties that
keep each one 100 TB-safe must survive refactors. These assert on the
OPTIMIZED/EXECUTED plan, not on timings — plan regressions are caught
at review time, not at scale (the PLAN_STATS.json round-over-round
practice, localized to the new ops)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().lower()


def test_bs1_single_corpus_aggregation(spark):
    """bs1 must reach its one-row answer through ONE corpus groupBy
    (the 10-bin exchange) — one parquet scan, no join, no window."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.bs1_brier_calibration(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan and "broadcasthashjoin" not in plan
    assert "window" not in plan


def test_ct1_profiles_broadcast_never_shuffle_docs_against_langs(spark):
    """ct1's language profiles and langs dim must BROADCAST to the
    candidate build: a shuffle join keyed on (qid/lang) would ship the
    corpus. Windows are only doc-/lang-partitioned (hash exchanges);
    no global range sort in the query path besides the final tiny
    orderBy over the L x L confusion matrix."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.ct1_rank_langid(spark, SF_DIR))
    assert "broadcasthashjoin" in plan
    # the ONLY sort-merge join allowed is none: every join side is
    # either broadcast (profiles, langs) or re-keyed by doc_id
    assert "sortmergejoin" not in plan


def test_pt1_windows_are_cluster_partitioned(spark):
    """pt1's ranking/counting windows must partition by cluster — a
    global (unpartitioned) window would serialize the corpus through
    one task."""
    from etl_oms_spark.operators.clustering import prototype_prune

    assigned = spark.createDataFrame(
        [(1, 0, 5), (2, 0, 6), (3, 1, 7)],
        "vec_id long, cluster int, dist2 long",
    )
    plan = _plan(prototype_prune(assigned))
    assert "partitionby" not in plan  # plan strings spell it differently
    import re

    # every Window node must carry a partition spec mentioning cluster
    for m in re.finditer(r"window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "cluster" in m.group(1)


def test_prf1_second_pass_is_semi_pruned(spark):
    """prf1's full-tf tokenization pass must be pruned to the feedback
    docs BEFORE its groupBy — a left-semi (or broadcast-semi) join must
    appear below the ftf aggregate, so the second pass never shuffles
    corpus-sized token counts."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.prf1_rm3_expansion(spark, SF_DIR))
    assert "leftsemi" in plan
    assert "sortmergejoin" not in plan


def test_mmr1_selection_runs_on_checkpointed_frames(spark):
    """mmr1 must scan the corpus exactly TWICE (relevance pass + the
    candidate embedding fetch) regardless of k_select: the unrolled
    selection rounds operate on lazy-checkpointed candidate/sim frames,
    never re-deriving them from parquet."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.mmr1_diversified_topk(spark, SF_DIR))
    assert plan.count("scan parquet") <= 3
    assert "scan existingrdd" in plan or "logicalrdd" in plan


def test_wf1_windows_doc_partitioned_and_join_hub_capped(spark):
    """wf1's two windows must partition by doc_id, and the pair join
    must consume the max_df-pruned posting lists (a join/aggregate over
    the fingerprint hash domain), never a cross join."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.wf1_winnow_matches(spark, SF_DIR))
    assert "cartesianproduct" not in plan
    assert "crossjoin" not in plan
    import re

    for m in re.finditer(r"window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "doc_id" in m.group(1)


def test_wf1_two_windows_share_one_sort_and_exchange(spark):
    """The round-11 audit outcome (SCALING.md, VERDICT r10 item 6):
    wf1's lead()-k-gram and rolling-min windows share (doc_id, pos)
    partitioning/ordering, so Catalyst must stack BOTH Window nodes on
    ONE Sort over ONE doc-keyed Exchange — two pipelined operators, not
    two corpus passes. The measured alternative (fully fused
    interpreted-HOF array form) was 6.5x slower at the 10x decade and
    is deliberately NOT shipped; this pin keeps the stacked shape from
    regressing into per-window re-sorts."""
    from etl_oms_spark.operators.dedup import winnow_fingerprints

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(winnow_fingerprints(docs))
    import re

    assert len(re.findall(r"\bwindow\b", plan)) == 2
    assert len(re.findall(r"\bsort\b", plan)) <= 1
    assert len(re.findall(r"\bexchange hashpartitioning\(doc_id", plan)) <= 1


def test_ari1_contingency_is_domain_sized(spark):
    """ari1's everything-after-the-contingency must run on k x L rows:
    the MI cell join joins the contingency against two BROADCAST
    marginals, never shuffling the corpus a second time."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.ari1_cluster_agreement(spark, SF_DIR))
    assert "broadcasthashjoin" in plan
    assert "cartesianproduct" not in plan or "broadcastnestedloop" in plan
