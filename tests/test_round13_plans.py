"""Plan-shape pins for the round-13 operators: the properties that keep
each one 100 TB-safe must survive refactors (the test_round12_plans
practice). Pins assert on the OPTIMIZED/EXECUTED plan, not timings."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().lower()


def test_x13_single_scan_via_checkpointed_grams(spark):
    """x13's exploded gram frame carries the split label and is lazily
    checkpointed, so benchmark-distinct, train totals and the hit semi
    join all reuse ONE corpus scan (the sr1 one-scan discipline)."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.x13_ngram_decontamination(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1


def test_kwh1_windows_on_score_domain_only(spark):
    """kwh1: one corpus rollup to the (sq, lang) histogram; the rank
    window and every join below it run on the checkpointed domain-sized
    frame — one parquet scan, no SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.kwh1_kruskal_wallis(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan


def test_mcc1_single_scan_no_join(spark):
    """mcc1 is ONE conditional-aggregate pass (kp1's shape): no join,
    no window — the 2×2 confusion and the MCC algebra are scalar."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.mcc1_matthews_corr(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan
    assert "window" not in plan


def test_ca1_single_scan_no_join(spark):
    """ca1: one corpus rollup to the ≤11-cell dose table; the trend
    algebra is scalar — no join, no window, one scan."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.ca1_cochran_armitage(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan
    assert "window" not in plan


def test_lb1_lag_join_broadcast_on_day_domain(spark):
    """lb1 shares acf1's shape: the lag equi-join runs on the bounded
    daily grid with the 10-row lag frame broadcast — never a corpus
    join, no SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.lb1_ljung_box(spark, SF_DIR))
    assert "broadcast" in plan
    assert "sortmergejoin" not in plan


def test_ccc1_single_scan_no_join(spark):
    """ccc1 is ONE moment-aggregate pass: six decimal sums, scalar
    algebra after — no join, no window."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.ccc1_lins_concordance(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan
    assert "window" not in plan


def test_d14_single_fingerprint_shuffle(spark):
    """d14 costs the same single shuffle as d1: one scan, one window
    over the fingerprint partition — no join anywhere."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.d14_quality_canonical(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan


def test_mcn1_single_scan_no_join(spark):
    """mcn1 is ONE conditional-aggregate pass to the paired 2x2
    (mcc1's shape): no join, no window."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.mcn1_mcnemar_gates(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan
    assert "window" not in plan


def test_aov1_single_scan_no_window(spark):
    """aov1: one corpus rollup to the per-source moment triples; the
    SSB/SSW algebra is a k-row second aggregate — no join, no window,
    one scan."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.aov1_anova_f(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan
    assert "window" not in plan


def test_wt1_single_scan_no_join(spark):
    """wt1 is ONE conditional-aggregate pass to both groups' moment
    triples: no join, no window."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.wel1_welch_t(spark, SF_DIR))
    assert plan.count("scan parquet") == 1
    assert "join" not in plan
    assert "window" not in plan


def test_jt1_domain_joins_only(spark):
    """jt1: one corpus rollup to the (decile, token-count) histogram;
    the dense grid, cumulative window and pair join all run on the
    checkpointed domain frame — one scan, no SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.jt1_jonckheere(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan


def test_dw1_lag_join_broadcast_on_day_domain(spark):
    """dw1 shares lb1/acf1's shape: the lag-1 equi-join runs on the
    bounded daily grid with the lagged side broadcast — never a corpus
    join, no SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.dw1_durbin_watson(spark, SF_DIR))
    assert "broadcast" in plan
    assert "sortmergejoin" not in plan


def test_rns1_day_domain_only(spark):
    """rns1: median rank, sign sequence and the lag window run on the
    checkpointed day grid; the single-partition windows are the
    documented bounded day-domain exception — no SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.rns1_runs_test(spark, SF_DIR))
    assert "sortmergejoin" not in plan
    assert "broadcast" in plan


def test_lev1_domain_work_after_one_scan(spark):
    """lev1: one corpus rollup to the (source, sq) histogram; medians,
    transformed moments and the F algebra run on the checkpointed
    domain frame — one scan, no SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.lev1_brown_forsythe(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan


def test_wsr1_day_domain_broadcast(spark):
    """wsr1 shares dw1/lb1's shape: the lag-7 join and the |d|
    histogram run on the bounded daily grid with broadcast joins — no
    SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.wsr1_weekly_shift(spark, SF_DIR))
    assert "broadcast" in plan
    assert "sortmergejoin" not in plan


def test_fr1_domain_rank_join(spark):
    """fr1: one corpus rollup to the day-by-type counts; the zero-fill
    grid, the k-per-block rank self-join and every aggregate below run
    on the checkpointed (days x types) domain frame — one scan, no
    SortMergeJoin."""
    import __spark_entry__ as entry_mod

    plan = _plan(entry_mod.fr1_friedman_daytype(spark, SF_DIR))
    assert plan.count("scan parquet") <= 1
    assert "existingrdd" in plan or plan.count("scan parquet") == 1
    assert "sortmergejoin" not in plan
