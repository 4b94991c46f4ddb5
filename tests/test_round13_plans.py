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
