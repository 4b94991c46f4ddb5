"""Plan-shape pins for the round-12 operators: the properties that keep
each one 100 TB-safe must survive refactors (the test_round11_plans
practice). Pins assert on the OPTIMIZED/EXECUTED plan, not timings."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().lower()


def test_mk2_pair_join_runs_on_day_domain(spark):
    """mk2's only corpus-sized stage is the day rollup; the S pair join
    and the tie histogram run on the checkpointed day-domain frame —
    one parquet scan, never a corpus join."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.mk2_mann_kendall(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan


def test_ts2_windows_and_pairs_on_domains_only(spark):
    """ts2: day-domain pair join, slope-DOMAIN cumulative histogram —
    the corpus is scanned once inside the barrier; the median probe is
    a broadcast against the bounded cumulative frame."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.ts2_theil_sen(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan


def test_kp1_single_scan_no_join(spark):
    """kp1 is ONE conditional-aggregate pass: no join of any kind, no
    window — the 2×2 confusion and the kappa algebra are scalar."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.kp1_cohens_kappa(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan
    assert "window" not in plan


def test_crv1_contingency_barrier_and_broadcasts(spark):
    """crv1: one corpus scan into the checkpointed contingency table;
    marginals/totals/χ² all join back BROADCAST over the domain-sized
    frame — no SortMergeJoin, no corpus re-scan."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.crv1_cramers_v(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan
    assert "broadcast" in plan


def test_kt1_cell_self_join_broadcast(spark):
    """kt1: one corpus rollup to the ≤11×8 contingency frame; the C/D
    pair self-join and both marginal tie sums run on the checkpointed
    cells — broadcast non-equi join, one parquet scan."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.kt1_kendall_tau(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan


def test_sr1_joint_histogram_single_scan(spark):
    """Regression pin for VERDICT r11 item 4 (also pinned in
    test_round11_plans, kept here beside its round-12 siblings): sr1 is
    ONE corpus scan into the joint histogram."""
    import __spark_entry__ as entry_mod

    plan = _plan(
        entry_mod.sr1_spearman_quality_length(spark, SF_DIR)
    )
    assert plan.count("scan parquet") <= 1


def test_dr1_value_rollup_single_scan(spark):
    """dr1 after the psi_from_value_counts refactor: the union is ONE
    map-side-combined value rollup; bounds/buckets/PSI run on the
    checkpointed value-domain frame."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.dr1_drift_psi(spark, SF_DIR))
    # dr1 unions two filtered reads of the same parquet: each side is
    # column-pruned and filter-pushed; the union feeds one groupBy.
    # The value-domain algebra must sit on the checkpointed frame.
    assert "existingrdd" in plan
    assert "sortmergejoin" not in plan


def test_cld1_windows_on_histogram(spark):
    """cld1 shares _quality_label_hist: one corpus scan inside the
    barrier; both cumulative windows and the pair algebra run on the
    score-domain frame."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.cld1_cliffs_delta(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan


def test_dlg1_two_windows_share_one_sort(spark):
    """dlg1's two cumulative windows (pos + neg prefix sums) share ONE
    Window node over the checkpointed histogram (the wf1 fact: same
    partition/order spec => same exchange+sort); one corpus scan."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.dlg1_auc_delong_se(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan
    # exactly ONE physical Window operator evaluating both specs
    assert plan.count("window [") == 1
    assert plan.count("windowspecdefinition") == 2


def test_rbo1_no_smj_tail(spark):
    """rbo1's RBO tail must stay k²-sized: the depth×overlap join is a
    broadcast (never SMJ); upstream cost is the two rankers."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.rbo1_rank_overlap(spark, SF_DIR))
    assert "sortmergejoin" not in plan
    assert "broadcast" in plan
