"""Round-12 operators: exactness replays and equivalence pins."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- sps1
def test_streaming_psi_equals_batch(spark):
    """The streamed daily value histogram, summed per side of the cut,
    must reproduce dr1's batch value rollup exactly (watermark > span:
    nothing late, nothing dropped; the sentinel dance flushes every real
    day's histogram), so sps1 == dr1 row-for-row — same bucket edges,
    same Laplace smoothing, same quantized contributions."""
    import __spark_entry__ as entry_mod

    got = entry_mod.sps1_streaming_psi(spark, SF).collect()
    want = (
        entry_mod.dr1_drift_psi(spark, SF).orderBy("bucket").collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_windowed_value_counts_batch_equals_raw_rollup(spark):
    """windowed_value_counts in BATCH mode must equal the hand-built
    (day, value) rollup — the plan is identical batch/streaming, which
    is what the sps1 exactness argument leans on."""
    from pyspark.sql import functions as F

    from etl_oms_spark.streaming.events import windowed_value_counts

    rows = [
        ("2024-01-01 10:00:00", 5),
        ("2024-01-01 11:00:00", 5),
        ("2024-01-01 12:00:00", 7),
        ("2024-01-02 09:00:00", 5),
    ]
    df = spark.createDataFrame(rows, "ts_s string, cents long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "cents"
    )
    got = {
        (str(r["window_start"]), r["v"]): r["n"]
        for r in windowed_value_counts(df, "cents").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 5): 2,
        ("2024-01-01 00:00:00", 7): 1,
        ("2024-01-02 00:00:00", 5): 1,
    }


# ------------------------------------------------------------- mk2
def test_mann_kendall_vs_brute_replay(spark):
    """Literal S/VarS replay on a shifted daily series: sign sum over
    all day pairs, Hirsch tie correction, Z from the textbook formula."""
    import math

    from pyspark.sql import functions as F

    from etl_oms_spark.operators.temporal import mann_kendall_trend

    # 6 days: counts 2,2,3,5,5,7 (ties at 2 and 5) => upward trend
    counts = {1: 2, 2: 2, 3: 3, 4: 5, 5: 5, 6: 7}
    rows = [
        (f"2024-01-0{d} 0{i}:00:00",)
        for d, c in counts.items()
        for i in range(c)
    ]
    df = spark.createDataFrame(rows, "ts_s string").select(
        F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = mann_kendall_trend(df).collect()[0]
    xs = [counts[d] for d in sorted(counts)]
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    n = len(xs)
    tie_sizes = [2, 2]  # two groups of 2 tied days
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in tie_sizes)
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    z = (s - 1) / math.sqrt(var18 / 18.0)
    assert got["n_days"] == n and got["s"] == s
    assert got["var18"] == var18
    assert got["z"] == z


def test_mann_kendall_flat_series_pins_zero(spark):
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.temporal import mann_kendall_trend

    rows = [(f"2024-01-0{d} 00:00:00",) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "ts_s string").select(
        F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = mann_kendall_trend(df).collect()[0]
    # every day has count 1: S = 0 AND all-tied variance = 0
    assert got["s"] == 0 and got["var18"] == 0 and got["z"] == 0.0


# ------------------------------------------------------------- ts2
def test_theil_sen_vs_brute_replay(spark):
    """Median pairwise slope replay, including the signed trunc-div
    quantization and the lower-median nearest-rank rule."""
    from etl_oms_spark.operators.temporal import theil_sen_from_daily

    import datetime

    days = [(datetime.date(2024, 1, d), x) for d, x in
            [(1, 10), (2, 13), (4, 9), (7, 30)]]
    df = spark.createDataFrame(days, "day date, x long")
    got = theil_sen_from_daily(df).collect()[0]
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            dx = days[j][1] - days[i][1]
            dd = (days[j][0] - days[i][0]).days
            q, r = divmod(abs(dx) * 10**9, dd)
            slopes.append((q if dx >= 0 else -q))  # trunc toward zero
    slopes.sort()
    m = len(slopes)
    med = slopes[(m + 1) // 2 - 1]  # lower median, 1-based ceil(m/2)
    assert got["n_days"] == 4 and got["n_pairs"] == m
    assert got["slope_q9"] == med


def test_theil_sen_single_day_pins_null(spark):
    import datetime

    from etl_oms_spark.operators.temporal import theil_sen_from_daily

    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), 5)], "day date, x long"
    )
    got = theil_sen_from_daily(df).collect()[0]
    assert got["n_days"] == 1 and got["n_pairs"] == 0
    assert got["slope_q9"] is None


# ------------------------------------------------------------- kp1
def test_cohens_kappa_textbook(spark):
    """Cohen 1960's worked shape: confusion (20,5,10,15) → po/pe/kappa
    replayed with Fractions."""
    from fractions import Fraction

    from etl_oms_spark.operators.classifier import cohens_kappa

    rows = (
        [(True, True)] * 20
        + [(True, False)] * 5
        + [(False, True)] * 10
        + [(False, False)] * 15
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    got = cohens_kappa(df, "a", "b").collect()[0]
    n = 50
    po = Fraction(20 + 15, n)
    pe = Fraction(25 * 30 + 25 * 20, n * n)
    kappa = (po - pe) / (1 - pe)
    assert (got["n"], got["n11"], got["n10"], got["n01"], got["n00"]) == (
        50, 20, 5, 10, 15,
    )
    assert got["po_q9"] == int(po * 10**9)
    assert got["pe_q9"] == int(pe * 10**9)
    # trunc toward zero for the (here positive) kappa
    assert got["kappa_q9"] == int(kappa * 10**9)


def test_cohens_kappa_degenerates(spark):
    from etl_oms_spark.operators.classifier import cohens_kappa

    # below-chance agreement: kappa < 0 (signed truncation contract)
    rows = [(True, False)] * 30 + [(False, True)] * 30 + [(True, True)] * 1
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    got = cohens_kappa(df, "a", "b").collect()[0]
    assert got["kappa_q9"] < 0
    # forced agreement (both raters constant True): pe = 1 -> pin 1e9
    dfc = spark.createDataFrame([(True, True)] * 5, "a boolean, b boolean")
    assert cohens_kappa(dfc, "a", "b").collect()[0]["kappa_q9"] == 10**9
    # empty input: n = 0, rates NULL
    dfe = spark.createDataFrame([], "a boolean, b boolean")
    g = cohens_kappa(dfe, "a", "b").collect()[0]
    assert g["n"] == 0 and g["kappa_q9"] is None and g["po_q9"] is None


# ------------------------------------------------------------- crv1
def test_cramers_v_perfect_and_independent(spark):
    """Perfect association pins V = 1; an exactly independent table
    pins chi2 = 0, V = 0; a hand 2x2 replays with Fractions."""
    import math
    from fractions import Fraction

    from etl_oms_spark.operators.validate import cramers_v

    perfect = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", "y")] * 10, "s string, l string"
    )
    got = cramers_v(perfect, "s", "l").collect()[0]
    assert got["v"] == 1.0
    indep = spark.createDataFrame(
        [("a", "x")] * 6 + [("a", "y")] * 6
        + [("b", "x")] * 3 + [("b", "y")] * 3,
        "s string, l string",
    )
    got = cramers_v(indep, "s", "l").collect()[0]
    assert got["chi2_q9"] == 0 and got["v"] == 0.0
    hand = spark.createDataFrame(
        [("a", "x")] * 12 + [("a", "y")] * 4
        + [("b", "x")] * 6 + [("b", "y")] * 10,
        "s string, l string",
    )
    got = cramers_v(hand, "s", "l").collect()[0]
    n = 32
    obs = [(12, 16, 18), (4, 16, 14), (6, 16, 18), (10, 16, 14)]
    chi2 = sum(
        (Fraction((n * o - r * c) ** 2, n * r * c) for o, r, c in obs),
        Fraction(0),
    )
    # engine quantization: per observed cell, floor((nO-rc)^2*1e9/(nrc))
    # minus floor(rc*1e9/n), plus the global n*1e9 expectation total
    chi2_q9 = (
        sum(
            (n * o - r * c) ** 2 * 10**9 // (n * r * c)
            - r * c * 10**9 // n
            for o, r, c in obs
        )
        + n * 10**9
    )
    assert got["chi2_q9"] == chi2_q9
    assert got["v"] == math.sqrt((chi2_q9 / 1e9) / (n * 1))
    assert abs(got["v"] - math.sqrt(float(chi2) / n)) < 1e-8


def test_cramers_v_counts_empty_cells(spark):
    """Zero cells of the contingency table contribute their expectation
    (the full-table chi-square, not the observed-cells-only one): a
    perfectly diagonal 3x3 with UNOBSERVED off-diagonal cells must reach
    chi2 = n*(k-1) exactly — the V = 1.0 certificate."""
    from etl_oms_spark.operators.validate import cramers_v

    rows = (
        [("a", "x")] * 4 + [("b", "y")] * 7 + [("c", "z")] * 9
    )
    got = cramers_v(
        spark.createDataFrame(rows, "s string, l string"), "s", "l"
    ).collect()[0]
    n = 20
    assert got["chi2_q9"] == n * 2 * 10**9  # chi2 = n*(k-1), k = 3
    assert got["v"] == 1.0


def test_cramers_v_single_column_pins_zero(spark):
    from etl_oms_spark.operators.validate import cramers_v

    df = spark.createDataFrame(
        [("a", "x")] * 3 + [("b", "x")] * 3, "s string, l string"
    )
    got = cramers_v(df, "s", "l").collect()[0]
    assert got["n_cols"] == 1 and got["v"] == 0.0


# ------------------------------------------------------------- kt1
def test_kendall_tau_b_vs_brute_replay(spark):
    """τ-b replay from raw pairs on a small table with ties — C, D and
    both tie corrections computed by hand."""
    import math

    from etl_oms_spark.operators.classifier import (
        kendall_tau_b_from_cells,
    )

    raw = [(0, 1), (0, 1), (0, 2), (1, 1), (1, 3), (2, 2), (2, 3), (2, 3)]
    cells = {}
    for xy in raw:
        cells[xy] = cells.get(xy, 0) + 1
    df = spark.createDataFrame(
        [(x, y, c) for (x, y), c in cells.items()], "x long, y long, c long"
    )
    got = kendall_tau_b_from_cells(df).collect()[0]
    conc = disc = 0
    for i in range(len(raw)):
        for j in range(i + 1, len(raw)):
            dx = raw[j][0] - raw[i][0]
            dy = raw[j][1] - raw[i][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n = len(raw)
    tx = sum(
        t * (t - 1)
        for t in [sum(c for (x, _), c in cells.items() if x == v)
                  for v in {x for x, _ in raw}]
    )
    uy = sum(
        t * (t - 1)
        for t in [sum(c for (_, y), c in cells.items() if y == v)
                  for v in {y for _, y in raw}]
    )
    d1 = n * (n - 1) - tx
    d2 = n * (n - 1) - uy
    assert (got["n"], got["conc"], got["disc"]) == (n, conc, disc)
    assert (got["d1"], got["d2"]) == (d1, d2)
    assert got["tau_b"] == 2.0 * (conc - disc) / math.sqrt(
        float(d1) * float(d2)
    )


def test_kendall_tau_b_pins(spark):
    from etl_oms_spark.operators.classifier import (
        kendall_tau_b_from_cells,
    )

    # perfect concordance: tau = 1
    df = spark.createDataFrame(
        [(0, 0, 3), (1, 1, 4), (2, 2, 5)], "x long, y long, c long"
    )
    assert kendall_tau_b_from_cells(df).collect()[0]["tau_b"] == 1.0
    # constant x margin: d1 = 0 -> pinned 0.0
    dfc = spark.createDataFrame(
        [(0, 0, 3), (0, 1, 4)], "x long, y long, c long"
    )
    got = kendall_tau_b_from_cells(dfc).collect()[0]
    assert got["d1"] == 0 and got["tau_b"] == 0.0


# ------------------------------------------------------------- cld1
def test_cliffs_delta_vs_brute_pairs(spark):
    """Brute replay: collect every (score, lang) at sf0.001 and count
    A>B / A<B pairs literally; delta = signed trunc-div at 1e-9."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.text import quality_score

    got = entry_mod.cld1_cliffs_delta(spark, SF).collect()[0]
    d = spark.read.parquet(f"{SF}/documents.parquet")
    sq = F.coalesce(
        F.floor(quality_score("text") * 1e6 + F.lit(0.5)).cast("long"),
        F.lit(-1),
    )
    rows = d.select(
        sq.alias("sq"), (F.col("lang") == "en").alias("en")
    ).collect()
    a = sorted(r["sq"] for r in rows if r["en"])
    b = sorted(r["sq"] for r in rows if not r["en"])
    import bisect

    gt = sum(bisect.bisect_left(b, x) for x in a)  # b values < x
    lt = sum(len(b) - bisect.bisect_right(b, x) for x in a)
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert (got["n_gt"], got["n_lt"]) == (gt, lt)
    num = (gt - lt) * 10**9
    den = len(a) * len(b)
    trunc = abs(num) // den * (1 if num >= 0 else -1)
    assert got["delta_q9"] == trunc


def test_cliffs_delta_pins(spark):
    """Disjoint distributions pin delta to ±1e9; an empty side pins
    NULL — exercised through a monkeypatched histogram."""
    import __spark_entry__ as entry_mod

    def fake_hist(rows):
        def h(spark_, sf_):
            return spark.createDataFrame(
                rows, "sq long, n_pos long, n_neg long"
            )
        return h

    orig = entry_mod._quality_label_hist
    try:
        # all A above all B -> delta = +1
        entry_mod._quality_label_hist = fake_hist(
            [(1, 0, 5), (10, 7, 0)]
        )
        got = entry_mod.cld1_cliffs_delta(spark, SF).collect()[0]
        assert got["delta_q9"] == 10**9 and got["n_gt"] == 35
        # empty B side -> NULL
        entry_mod._quality_label_hist = fake_hist([(1, 3, 0)])
        got = entry_mod.cld1_cliffs_delta(spark, SF).collect()[0]
        assert got["delta_q9"] is None
    finally:
        entry_mod._quality_label_hist = orig


# ------------------------------------------------------------- dlg1
def test_delong_se_vs_brute_placements(spark):
    """Brute DeLong replay at sf0.001: placement values per positive /
    negative computed literally, sample variances, SE by the textbook
    formula; also pins the doubled-placement identity Σq·w == Σr·w == u2
    (both equal 2·m·n·AUC)."""
    import math

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.text import quality_score

    got = entry_mod.dlg1_auc_delong_se(spark, SF).collect()[0]
    d = spark.read.parquet(f"{SF}/documents.parquet")
    sq = F.coalesce(
        F.floor(quality_score("text") * 1e6 + F.lit(0.5)).cast("long"),
        F.lit(-1),
    )
    rows = d.select(
        sq.alias("sq"), (F.col("lang") == "en").alias("en")
    ).collect()
    pos = sorted(r["sq"] for r in rows if r["en"])
    neg = sorted(r["sq"] for r in rows if not r["en"])
    m, n = len(pos), len(neg)
    import bisect

    # doubled placements: q = 2*(neg below) + (neg tied)
    qs = [
        2 * bisect.bisect_left(neg, v)
        + (bisect.bisect_right(neg, v) - bisect.bisect_left(neg, v))
        for v in pos
    ]
    rs = [
        2 * (m - bisect.bisect_right(pos, v))
        + (bisect.bisect_right(pos, v) - bisect.bisect_left(pos, v))
        for v in neg
    ]
    assert sum(qs) == sum(rs) == got["u2"]
    assert got["n_pos"] == m and got["n_neg"] == n
    assert got["auc"] == sum(qs) / (2.0 * m * n)
    s10num = m * sum(q * q for q in qs) - sum(qs) ** 2
    s01num = n * sum(r * r for r in rs) - sum(rs) ** 2
    se = math.sqrt(
        s10num / (4.0 * m * m * (m - 1.0) * n * n)
        + s01num / (4.0 * n * n * (n - 1.0) * m * m)
    )
    # identical exact integers; the double combination may associate
    # differently in this replay than in the engine's single expression
    assert abs(got["se"] - se) < 1e-15
    # cross-check the variance definition: placements p=q/(2n), sample var
    ps = [q / (2.0 * n) for q in qs]
    mean = sum(ps) / m
    s10 = sum((p - mean) ** 2 for p in ps) / (m - 1)
    assert abs(s10num / (4.0 * m * (m - 1.0) * n * n) - s10) < 1e-9


def test_delong_se_degenerate_class_pins_null(spark):
    """A single-member class (m < 2) has no sample variance: SE NULL,
    AUC still defined — exercised through a monkeypatched histogram."""
    import __spark_entry__ as entry_mod

    orig = entry_mod._quality_label_hist
    try:
        entry_mod._quality_label_hist = lambda s_, sf_: spark.createDataFrame(
            [(1, 1, 0), (5, 0, 4)], "sq long, n_pos long, n_neg long"
        )
        got = entry_mod.dlg1_auc_delong_se(spark, SF).collect()[0]
        assert got["n_pos"] == 1 and got["se"] is None
        # the one positive (sq=1) sits below all 4 negatives: AUC = 0
        assert got["auc"] == 0.0
    finally:
        entry_mod._quality_label_hist = orig


# ------------------------------------------------------------- rbo1
def test_rbo_vs_brute_fractions(spark):
    """Fraction replay of Webber et al.'s truncated RBO on constructed
    rankings with partial overlap — per-depth X_d counted by hand,
    (1-p)p^(d-1)X_d/d summed exactly, floor-quantized at 1e-12 per
    term (the engine's per-term truncation)."""
    from etl_oms_spark.operators.search import rbo_from_ranks

    a = [(i, r) for r, i in enumerate([1, 2, 3, 4, 5], start=1)]
    b = [(i, r) for r, i in enumerate([2, 1, 6, 3, 7], start=1)]
    dfa = spark.createDataFrame(a, "doc_id long, rank long")
    dfb = spark.createDataFrame(b, "doc_id long, rank long")
    got = rbo_from_ranks(dfa, dfb, k=5).collect()[0]
    ra = {i: r for i, r in a}
    rb = {i: r for i, r in b}
    want = 0
    for d in range(1, 6):
        x = sum(
            1 for i in ra if ra[i] <= d and i in rb and rb[i] <= d
        )
        want += x * 9 ** (d - 1) * 10 ** (12 - d) // d
        if d == 5:
            x5 = x
    assert got["k"] == 5 and got["overlap_at_k"] == x5
    assert got["rbo_q12"] == want


def test_rbo_pins(spark):
    """Identical prefixes pin rbo to Σ(1-p)p^(d-1) (the truncated
    geometric mass — NOT 1e12 for finite k); disjoint rankings pin 0."""
    from etl_oms_spark.operators.search import rbo_from_ranks

    same = spark.createDataFrame(
        [(i, i) for i in range(1, 11)], "doc_id long, rank long"
    )
    got = rbo_from_ranks(same, same, k=10).collect()[0]
    mass = sum(10 ** (12 - d) * 9 ** (d - 1) * d // d for d in range(1, 11))
    assert got["rbo_q12"] == mass  # = (1-p)·Σp^(d-1)·d/d·1e12 exactly
    disj = spark.createDataFrame(
        [(100 + i, i) for i in range(1, 11)], "doc_id long, rank long"
    )
    got = rbo_from_ranks(same, disj, k=10).collect()[0]
    assert got["rbo_q12"] == 0 and got["overlap_at_k"] == 0
