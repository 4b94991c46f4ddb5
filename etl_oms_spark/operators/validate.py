"""Constraint validation: the declarative twin of the reference's DDL.

The reference enforces integrity in PostgreSQL — UNIQUE constraints and
sequences declared in `GENERATION de la BDD/BDD Création.txt:4-29`, upserts
keyed on (id_region, date). A lakehouse has no engine-enforced constraints,
so every load validates them explicitly instead: primary-key uniqueness,
foreign-key closure, and not-null checks as ordinary aggregates over the
loaded data.

Each check is one key-bounded shuffle (groupBy on the key or a left-anti
probe); the report is checks-sized, never data-sized. At 100 TB run the
checks on the same scan as the load (they are plain DataFrame plans — union
them into the write job) rather than as separate passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows-per-duplicated-key beyond the first: groupBy(key) HAVING n>1.
    Returns (key..., n_rows) per violating key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Child rows whose NON-NULL key has no parent — left-anti join
    (broadcast when the parent is dim-sized, shuffle otherwise; Catalyst
    decides). SQL FK semantics: a NULL foreign key is never a violation
    (that is the not-null check's job), and NULL parent keys cannot match
    anything, so both sides drop NULLs before the probe."""
    p = (
        parent.filter(F.col(parent_key).isNotNull())
        .select(F.col(parent_key).alias(child_key))
        .distinct()
    )
    return child.filter(F.col(child_key).isNotNull()).join(p, child_key, "left_anti")


def constraint_report(checks: dict[str, DataFrame]) -> DataFrame:
    """Fold named violation frames into one (check_name, n_violations)
    report — a union of count aggregates, one tiny row per check."""
    parts = []
    for name, df in checks.items():
        parts.append(
            df.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).cast("long").alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level snapshot diff: (keys..., diff_status) with status in
    {'added', 'removed', 'changed', 'unchanged'} — the audit step between
    two loads of the same table (what did this batch actually do?), the
    read-side complement of `merge`'s write-side upserts.

    One full-outer join on the keys; change detection is a NULL-safe
    equality fold over ``compare_cols`` (default: all shared non-key
    columns), so NULL→value and value→NULL both count as changes. Cost is
    one co-partitioned join; at 100 TB run it on bucketed snapshots and
    the shuffle disappears.
    """
    if compare_cols is None:
        shared = set(before.columns) & set(after.columns)
        compare_cols = [c for c in before.columns if c in shared and c not in keys]
    b = before.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(1).alias("__in_b"),
    )
    a = after.select(
        *keys, *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        F.lit(1).alias("__in_a"),
    )
    joined = b.join(a, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__b_{c}").eqNullSafe(F.col(f"__a_{c}"))
    status = (
        F.when(F.col("__in_b").isNull(), F.lit("added"))
        .when(F.col("__in_a").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("diff_status"))


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two snapshots of an integer
    column — the drift monitor run before trusting a new data drop
    against the distribution a model (or mix plan) was built on.

    Buckets are fixed-width over the UNION's global min/max (integer
    arithmetic, same edges for both sides); per-bucket proportions use
    Laplace-smoothed counts so empty buckets stay finite. Output is one
    row per bucket with the PSI contribution quantized to 1e-9 (BIGINT)
    — summing the quantized contributions is order-independent, so the
    total is bit-stable on any partitioning/engine; the conventional
    >0.2 "significant drift" threshold applies to the (double) total.

    Cost: ONE map-side-combined value rollup over the union (round 12 —
    formerly a bounds scan plus a bucketing scan); bounds, bucket edges
    and the PSI algebra all run on the value-DOMAIN frame via
    `psi_from_value_counts`.
    """
    tagged = base.select(F.col(value_col).cast("long").alias("__v")).withColumn(
        "__side", F.lit(0)
    ).unionByName(
        current.select(F.col(value_col).cast("long").alias("__v")).withColumn(
            "__side", F.lit(1)
        )
    )
    vcounts = tagged.groupBy(F.col("__v").alias("v")).agg(
        F.count_if(F.col("__side") == 0).alias("n_base"),
        F.count_if(F.col("__side") == 1).alias("n_cur"),
    )
    return psi_from_value_counts(vcounts, n_buckets)


def psi_from_value_counts(
    vcounts: DataFrame,
    n_buckets: int = 10,
) -> DataFrame:
    """psi_drift's algebra over an already-built per-VALUE count frame
    ``(v, n_base, n_cur)`` — split out so a STREAMING histogram
    maintainer (sps1: tumbling daily value counts kept by Structured
    Streaming) feeds the identical bucket edges, Laplace smoothing and
    quantized contributions. Everything here is value-DOMAIN-sized:
    bounds, bucket rollup, totals, and the final buckets-sized result.
    """
    vcounts = vcounts.localCheckpoint(eager=False)
    bounds = vcounts.agg(
        F.min("v").alias("__lo"), F.max("v").alias("__hi")
    )
    span = F.col("__hi") - F.col("__lo") + F.lit(1)
    idx = F.floor(
        (F.col("v") - F.col("__lo")) * F.lit(n_buckets) / span
    ).cast("int")
    counts = (
        vcounts.crossJoin(F.broadcast(bounds))
        .select(idx.alias("bucket"), "n_base", "n_cur")
        .groupBy("bucket")
        .agg(
            F.sum("n_base").alias("n_base"),
            F.sum("n_cur").alias("n_cur"),
        )
    )
    totals = counts.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_base") + F.lit(1)) / (F.col("__tb") + F.lit(n_buckets))
    q = (F.col("n_cur") + F.lit(1)) / (F.col("__tc") + F.lit(n_buckets))
    contrib = (q - p) * F.log(q / p)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.col("n_base").cast("long").alias("n_base"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.floor(contrib * F.lit(1e9) + F.lit(0.5)).cast("long").alias("psi_q9"),
        )
    )


def cramers_v(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cramér's V association between two categorical columns (public:
    Cramér 1946, §21.9) — the nominal-nominal companion to eta1
    (categorical→numeric) and st2 (numeric-numeric): how strongly does
    source predict language?

        χ² = Σ_cells (O − E)²/E,  E = r_a·c_b/n
           = Σ_cells (n·O − r_a·c_b)² / (n·r_a·c_b)     (exact rational)
        V  = √( χ² / (n·(min(R,C) − 1)) )

    The sum runs over ALL R×C cells including EMPTY ones (an empty
    cell contributes E = r·c/n). Empty cells are never materialized:
    since Σ_all-cells E = n,

        χ² = Σ_observed [ (n·O − r·c)²/(n·r·c) − r·c/n ] + n

    so one pass over the OBSERVED cells suffices (the same device as
    ks1's complement trick). Per-cell contributions are quantized at
    1e-9: the squared term by the STAGED exact division (q·1e9 +
    (rem·1e9)//B — floor(A·1e9/B) without ever forming A·1e9, so
    decimal(38)/HUGEINT headroom holds to n ≈ 2·10⁹), the subtracted
    expectation by one truncating division. Floor artifacts can leave
    the total a few 1e-9 below 0 on exactly-independent tables —
    clamped to 0. chi2_q9 is emitted as BIGINT (valid while χ² ≤
    9.2·10⁹, i.e. any corpus below ~10⁹ rows); V is ONE double
    expression. Degenerate tables (n = 0 or a single-row/column table)
    pin V = 0.0. Returns one row: (n, n_rows, n_cols, chi2_q9, v).

    Scale shape: ONE map-side-combined corpus scan into the (A×B)
    contingency table behind a lazy-checkpoint barrier; marginals,
    totals and the χ² rollup are all contingency-domain-sized with
    broadcast joins.
    """
    cells = (
        df.groupBy(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    ra = cells.groupBy("a").agg(F.sum("o").cast("long").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("o").cast("long").alias("cb"))
    tot = cells.agg(
        F.coalesce(F.sum("o"), F.lit(0)).cast("long").alias("n")
    )
    dims = (
        ra.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(
            F.broadcast(
                cb.agg(F.count(F.lit(1)).cast("long").alias("n_cols"))
            )
        )
        .crossJoin(F.broadcast(tot))
    )
    d38 = "decimal(38,0)"
    k9 = F.lit(1_000_000_000).cast(d38)
    j = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot.select(F.col("n").alias("__n"))))
    )
    nn = F.col("__n").cast(d38)
    dev = nn * F.col("o").cast(d38) - F.col("ra").cast(d38) * F.col(
        "cb"
    ).cast(d38)
    a_ = dev * dev
    b_ = nn * F.col("ra").cast(d38) * F.col("cb").cast(d38)
    q = (a_ - a_ % b_) / b_
    rc9 = F.col("ra").cast(d38) * F.col("cb").cast(d38) * k9
    contrib = (
        q.cast(d38) * k9
        + (((a_ % b_) * k9 - ((a_ % b_) * k9) % b_) / b_).cast(d38)
        # minus this cell's expectation (r·c/n)·1e9 — the observed-cells
        # rewrite of the full-table sum (empty cells contribute only E,
        # and Σ_all E = n is added back below)
        - ((rc9 - rc9 % nn) / nn).cast(d38)
    )
    chi = j.agg(
        F.coalesce(F.sum(contrib), F.lit(0).cast(d38))
        .cast(d38)
        .alias("__chi_part")
    )
    kmin = F.least(F.col("n_rows"), F.col("n_cols"))
    return (
        dims.crossJoin(F.broadcast(chi))
        .select(
            "n",
            "n_rows",
            "n_cols",
            F.greatest(
                (
                    F.col("__chi_part")
                    + F.col("n").cast(d38) * k9
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("chi2_q9"),
            F.when(
                (F.col("n") == 0) | (kmin <= 1), F.lit(0.0)
            )
            .otherwise(
                F.sqrt(
                    (F.col("chi2_q9").cast("double") / F.lit(1e9))
                    / (F.col("n") * (kmin - 1)).cast("double")
                )
            )
            .alias("v"),
        )
    )


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    pos_col: str,
) -> DataFrame:
    """Cochran-Armitage trend test across ORDERED groups (public:
    Cochran 1954, Armitage 1955) — the missing member between crv1
    (nominal×nominal) and mk2 (trend in a series): does a binary rate
    rise or fall MONOTONICALLY with an ordered bucket, e.g. does the
    positive-class share trend with the quality decile?

    Input is per-row (w, pos) with w the integer group score and pos
    0/1. One map-side-combined rollup to the ≤k-cell table, then with
    N = Σn_j, R = Σr_j, Sw = Σw·n_j, Swr = Σw·r_j, Sw2 = Σw²·n_j:

        T   = Σw·r_j − R·Sw/N            (the trend statistic)
        A   = N·Swr − R·Sw               (= N·T, exact and signed)
        Var = R(N−R)·(N·Sw2 − Sw²)/N³
        z   = T/√Var = A / √(R(N−R)(N·Sw2 − Sw²)/N)

    A and the variance product are exact decimal(38) (headroom to
    N ≈ 10⁹ with single-digit scores, the crv1 class); z_q6 is ONE
    double expression from exact integers, half-up at 1e-6, pinned 0
    when the variance is 0 (constant outcome or a single group).
    Returns one row: (n, r, n_groups, trend_num, z_q6).
    """
    d38 = "decimal(38,0)"
    cells = (
        df.select(
            F.col(score_col).cast("long").alias("__w"),
            F.col(pos_col).cast("long").alias("__p"),
        )
        .groupBy("__w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.coalesce(F.sum("__p"), F.lit(0)).cast("long").alias("__r"),
        )
    )
    w = F.col("__w").cast(d38)
    agg = cells.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast(d38).alias("n"),
        F.coalesce(F.sum("__r"), F.lit(0)).cast(d38).alias("r"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.coalesce(F.sum(w * F.col("__n")), F.lit(0).cast(d38)).alias("sw"),
        F.coalesce(F.sum(w * F.col("__r")), F.lit(0).cast(d38)).alias("swr"),
        F.coalesce(F.sum(w * w * F.col("__n")), F.lit(0).cast(d38)).alias(
            "sw2"
        ),
    )
    n, r = F.col("n"), F.col("r")
    a_num = n * F.col("swr") - r * F.col("sw")
    var_prod = (
        r * (n - r) * (n * F.col("sw2") - F.col("sw") * F.col("sw"))
    )
    return agg.select(
        n.cast("long").alias("n"),
        r.cast("long").alias("r"),
        "n_groups",
        a_num.cast("long").alias("trend_num"),
        F.when(var_prod == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                a_num.cast("double")
                / F.sqrt(var_prod.cast("double") / n.cast("double"))
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("z_q6"),
    )


def jonckheere_terpstra(
    hist: DataFrame,
    group_col: str = "g",
    value_col: str = "v",
    count_col: str = "c",
) -> DataFrame:
    """Jonckheere–Terpstra ordered-alternative test over a per-group
    value HISTOGRAM (public: Jonckheere 1954, Terpstra 1952) — the
    k-group trend companion to mwu1 (two groups) and ca1 (binary
    outcome): does a NUMERIC response shift monotonically across
    ordered groups, judged on all between-group pairs?

        U = Σ_{i<j} [ #{x∈gᵢ, y∈gⱼ : x<y} + ½·#{x=y} ]

    emitted doubled (u2 = 2U) so ties stay exact integers — mwu1's
    doubled-rank device. Off the (g, v, c) histogram the pair counts
    come from per-group cumulative counts on the DENSE value grid
    (distinct values × groups, zero-filled): for each value v present
    in group j, the pairs against group i < j are c_j(v)·(2·cum_i(v) +
    c_i(v)) with cum_i(v) = #{x∈gᵢ : x<v}. The grid explode and the
    cumulative window are (|V|·k)-sized — value-DOMAIN work, never
    corpus work; the corpus contact is whatever one rollup built the
    histogram upstream.

    The normal approximation uses the UNTIED null moments (Lehmann
    1975): with N = Σn_g,

        μ  = (N² − Σn_g²)/4                (emitted ×4, exact)
        σ² = (N²(2N+3) − Σn_g²(2n_g+3))/72
        z  = (U − μ)/σ = (2·u2 − mu4) / (4·√σ²)

    z_q6 is ONE double expression from exact decimal(38) integers,
    pinned 0 for degenerate designs (σ² = 0, i.e. a single group; the
    all-ties case zeroes the NUMERATOR exactly since then u2 = mu4/2).
    Heavy ties make the untied σ² conservative — the
    documented approximation, matching the classic tables. Returns one
    row: (n, n_groups, u2, mu4, z_q6).
    """
    d38 = "decimal(38,0)"
    from pyspark.sql import Window

    h = hist.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(count_col).cast("long").alias("c"),
    ).localCheckpoint(eager=False)
    values = h.select("v").distinct()
    groups = h.select("g").distinct()
    # dense (group × value) grid so cum_i(v) exists for every value in
    # the JOINT domain, zero-filled where group i never saw v
    grid = (
        groups.crossJoin(values)
        .join(h, ["g", "v"], "left")
        .select("g", "v", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "g",
        "v",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum"),
    )
    lo = cum.select(
        F.col("g").alias("gi"),
        F.col("v"),
        F.col("c").cast(d38).alias("ci"),
        F.col("cum").cast(d38).alias("cumi"),
    )
    hi = h.select(
        F.col("g").alias("gj"), F.col("v"), F.col("c").cast(d38).alias("cj")
    )
    pairs = lo.join(hi, "v").filter(F.col("gi") < F.col("gj"))
    u2 = pairs.agg(
        F.coalesce(
            F.sum(F.col("cj") * (2 * F.col("cumi") + F.col("ci"))),
            F.lit(0).cast(d38),
        ).alias("u2")
    )
    sizes = h.groupBy("g").agg(F.sum("c").cast(d38).alias("ng"))
    mom = sizes.agg(
        F.coalesce(F.sum("ng"), F.lit(0).cast(d38)).alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.coalesce(F.sum(F.col("ng") * F.col("ng")), F.lit(0).cast(d38)).alias(
            "sn2"
        ),
        F.coalesce(
            F.sum(F.col("ng") * F.col("ng") * (2 * F.col("ng") + 3)),
            F.lit(0).cast(d38),
        ).alias("sn23"),
    )
    n = F.col("n")
    mu4 = n * n - F.col("sn2")
    var72 = n * n * (2 * n + 3) - F.col("sn23")
    return mom.crossJoin(F.broadcast(u2)).select(
        n.cast("long").alias("n"),
        "n_groups",
        F.col("u2").cast("long").alias("u2"),
        mu4.cast("long").alias("mu4"),
        F.when(var72 <= 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                (2 * F.col("u2") - mu4).cast("double")
                / (
                    F.lit(4.0)
                    * F.sqrt(var72.cast("double") / F.lit(72.0))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("z_q6"),
    )


def friedman_from_cells(
    cells: DataFrame,
    block_col: str = "b",
    treat_col: str = "g",
    value_col: str = "x",
) -> DataFrame:
    """Friedman rank test over a COMPLETE (block, treatment, value)
    design (public: Friedman 1937; tie-corrected form as in Conover
    1999) — the within-block companion to kwh1: kwh1 ranks one pooled
    sample across k groups; Friedman ranks the k treatments WITHIN
    each block, so block-level shifts (busy days, seasonal level)
    cancel by construction.

    Callers must pass a complete design (every treatment present in
    every block — zero-fill counts upstream). Within each block the k
    values get average ranks via mwu1's DOUBLED-rank device
    (r2 = 2·(#smaller) + (#equal) + 1, an exact integer), then with
    R2_j = Σ_blocks r2(b, j), A4 = Σ r2², C4 = b·k·(k+1)²:

        χ²_F = (k−1) · Σ_j (R2_j − b(k+1))² / (A4 − C4)

    — exact integers everywhere except the final staged division,
    emitted as chi2_q6 by the remainder-trick (trunc) division.
    A4 = C4 (every block fully tied) pins 0. Returns one row:
    (n_blocks, k, chi2_q6).

    Scale shape: ranks come from a k²-per-block self-join (window-free
    conditional counts) on the (block × treatment) frame — the input
    is DOMAIN-sized (blocks × treatments), so every step below the
    caller's rollup is domain work.
    """
    d38 = "decimal(38,0)"
    c = cells.select(
        F.col(block_col).alias("b"),
        F.col(treat_col).alias("g"),
        F.col(value_col).cast("long").alias("x"),
    ).localCheckpoint(eager=False)
    other = c.select(
        F.col("b"), F.col("g").alias("g2"), F.col("x").alias("x2")
    )
    # doubled average rank within block: r2 = 2·(#strictly smaller)
    # + (#equal INCLUDING self) + 1; the join counts equals EXCLUDING
    # self, so the constant is +2 (unique smallest: 0 + 0 + 2 = 2 =
    # doubled rank 1)
    ranked = (
        # the rank self-join runs on the DOMAIN frame (blocks × k);
        # broadcast the probe side — a checkpointed ExistingRDD has no
        # stats, so Catalyst would otherwise pick a SortMergeJoin
        c.join(F.broadcast(other), "b")
        .groupBy("b", "g", "x")
        .agg(
            F.sum(F.when(F.col("x2") < F.col("x"), 2).otherwise(0)).alias(
                "lt2"
            ),
            F.sum(
                F.when(
                    (F.col("x2") == F.col("x")) & (F.col("g2") != F.col("g")),
                    1,
                ).otherwise(0)
            ).alias("eq"),
        )
        .select(
            "b",
            "g",
            (F.col("lt2") + F.col("eq") + 2).cast("long").alias("r2"),
        )
    )
    dims = c.agg(
        F.countDistinct("b").cast(d38).alias("nb"),
        F.countDistinct("g").cast(d38).alias("k"),
    )
    sums = ranked.groupBy("g").agg(
        F.sum(F.col("r2").cast(d38)).alias("rj")
    )
    a4 = ranked.agg(
        F.coalesce(
            F.sum(F.col("r2").cast(d38) * F.col("r2").cast(d38)),
            F.lit(0).cast(d38),
        ).alias("a4")
    )
    nb, k = F.col("nb"), F.col("k")
    dev = F.col("rj") - nb * (k + 1)
    num = sums.crossJoin(F.broadcast(dims)).agg(
        F.coalesce(F.sum(dev * dev), F.lit(0).cast(d38)).alias("ssdev")
    )
    k6 = F.lit(1_000_000).cast(d38)
    den = F.col("a4") - nb * k * (k + 1) * (k + 1)
    chi_num = (k - 1) * F.col("ssdev")
    return (
        dims.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(a4))
        .select(
            nb.cast("long").alias("n_blocks"),
            k.cast("long").alias("k"),
            F.when(den <= 0, F.lit(0).cast("long"))
            .otherwise(
                (
                    _fd(chi_num, den) * k6
                    + _fd((chi_num % den) * k6, den)
                ).cast("long")
            )
            .alias("chi2_q6"),
        )
    )


def _fd(a, b):
    """Exact trunc division via the remainder trick (classifier.
    _floordiv_dec's device) — requires b > 0."""
    return (a - a % b) / b
