"""Property-based tests (hypothesis) for driver-side pure logic, plus
fixed-seed invariants for distributed operators."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_oms_spark.operators.dedup import _minhash_params
from etl_oms_spark.reconcile import build_rename_map, normalize_column_name
from etl_oms_spark.schema import SYNONYM_MAP
from etl_oms_spark.sources.writers import upsert_sql

col_names = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=1,
    max_size=40,
)


@given(col_names)
@settings(max_examples=200)
def test_normalize_idempotent(name):
    once = normalize_column_name(name)
    assert normalize_column_name(once) == once
    assert once == once.lower()
    assert "__" not in once
    assert not once.startswith("_") and not once.endswith("_")


@given(st.lists(col_names, min_size=0, max_size=12, unique=True))
@settings(max_examples=100)
def test_rename_map_invariants(cols):
    rename, unmatched = build_rename_map(cols)
    # partition: every source column is either renamed or unmatched
    assert sorted(list(rename) + unmatched) == sorted(cols)
    # injective: no two source columns claim the same canonical name
    assert len(set(rename.values())) == len(rename)
    # targets are always canonical
    assert set(rename.values()) <= set(SYNONYM_MAP)


@given(st.integers(min_value=0, max_value=1023))
def test_minhash_params_ansi_safe(j):
    a, b = _minhash_params(j)
    assert a % 2 == 1  # odd multiplier
    assert 0 < a < 2**31 and 0 <= b < 2**31
    # worst-case product stays inside signed 64-bit
    assert a * 0xFFFFFFFF + b < 2**63


def test_minhash_params_distinct():
    seen = {_minhash_params(j) for j in range(64)}
    assert len(seen) == 64


@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=20),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=20),
        min_size=1,
        max_size=5,
        unique=True,
    ),
)
@settings(max_examples=50)
def test_upsert_sql_well_formed(keys, updates):
    updates = [u for u in updates if u not in keys]
    if not updates:
        return
    sql = upsert_sql("t", "s", keys, updates)
    assert sql.count("EXCLUDED.") == len(updates)
    assert f"ON CONFLICT ({', '.join(keys)})" in sql


# ---------------------------------------------------------------------------
# fixed-seed distributed invariants


def test_merge_idempotent(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 100)) for i in range(50)]
    updates_rows = [(i, rng.randint(0, 100)) for i in range(25, 75)]
    from etl_oms_spark.merge import merge_dataframes

    e = spark.createDataFrame(rows, "k int, v int")
    u = spark.createDataFrame(updates_rows, "k int, v int")
    once = merge_dataframes(e, u, ["k"])
    twice = merge_dataframes(once, u, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == 75  # 0..74


def test_minhash_estimate_tracks_true_jaccard(spark):
    """Estimated Jaccard from 64 minhashes should approximate true shingle
    Jaccard within ~0.2 for controlled overlap levels."""
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.dedup import (
        estimate_jaccard,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    base = [f"w{i}" for i in range(40)]
    docs = [
        (0, " ".join(base)),
        (1, " ".join(base[:30] + [f"x{i}" for i in range(10)])),  # ~60% 3-shingle overlap
        (2, " ".join(f"z{i}" for i in range(40))),  # disjoint
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = minhash_signatures(df).cache()
    pairs = spark.createDataFrame([(0, 1), (0, 2)], ["id_a", "id_b"])
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in estimate_jaccard(sigs, pairs).collect()}

    sets = {r["doc_id"]: set(r["s"]) for r in df.select(
        "doc_id", shingles("text", 3).alias("s")).collect()}
    true01 = len(sets[0] & sets[1]) / len(sets[0] | sets[1])
    assert abs(est[(0, 1)] - true01) < 0.2
    assert est[(0, 2)] < 0.15
    # and LSH at 16 bands / r=4 must surface the similar pair
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 1) in cands


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 8),
)
@settings(max_examples=10, deadline=None)
def test_per_group_cap_invariants(spark, rows, cap):
    """Cap respected per group; kept set is a subset and deterministic."""
    from etl_oms_spark.operators.sampling import per_group_cap

    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    out = per_group_cap(df, ["source"], "doc_id", cap=cap).collect()
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert all(n <= cap for n in per.values())
    kept = {r["doc_id"] for r in out}
    assert kept <= {t[0] for t in rows}
    # groups smaller than the cap are kept whole
    sizes = {}
    for i, s in rows:
        sizes[s] = sizes.get(s, 0) + 1
    for s, n in sizes.items():
        assert per.get(s, 0) == min(n, cap)


@given(
    st.lists(
        st.tuples(
            st.integers(1, 5),                      # key
            st.integers(0, 1_000_000),              # ts offset seconds
            st.sampled_from(["I", "U", "D"]),
            st.integers(-100, 100),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_cdc_snapshot_partitioning_independent(spark, ops):
    """Snapshot is identical on any input partitioning (deterministic
    tie-breaks), and snapshot(snapshot ∪ nothing) is a fixed point."""
    import datetime as dt

    from etl_oms_spark.merge import cdc_snapshot

    base = dt.datetime(2024, 1, 1)
    rows = [(k, base + dt.timedelta(seconds=s), op, v) for k, s, op, v in ops]
    log = spark.createDataFrame(rows, "k INT, ts TIMESTAMP, op STRING, v INT")

    def snap(df):
        return sorted(
            (r["k"], r["ts"], r["op"], r["v"])
            for r in cdc_snapshot(df, ["k"], "ts", "op", ["v"]).collect()
        )

    s1 = snap(log)
    s2 = snap(log.repartition(7))
    assert s1 == s2
    assert all(op != "D" for _, _, op, _ in s1)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.integers(0, 50)),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=30, deadline=None)
def test_bpe_encode_word_reconstructs(evts):
    """BPE encoding must always concatenate back to the original word,
    regardless of the merge list."""
    from etl_oms_spark.operators.tokenize import bpe_encode_word

    rnd = random.Random(evts[0][1])
    word = "".join(rnd.choice("abcd") for _ in range(1 + evts[0][2] % 12))
    merges = {}
    for i, (a, b, _) in enumerate(evts):
        merges[("abcd"[a % 4], "abcd"[b % 4])] = i
    toks = bpe_encode_word(word, merges)
    assert "".join(toks) == word
    assert all(toks)


@given(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1))
@settings(max_examples=200)
def test_morton_python_model_roundtrip(x, y):
    """Pure-python model of the column expressions: interleave/deinterleave
    are inverse bijections on the 16-bit grid."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (rx, ry) == (x, y)
    assert z < 1 << 32


def test_canonicalize_url_idempotent(spark):
    """canon(canon(u)) == canon(u) for a full grid of messy URLs —
    canonical form is a fixed point."""
    from etl_oms_spark.operators.text import canonicalize_url

    urls = []
    for scheme in ("http", "HTTPS", "ftp"):
        for host in ("WWW.Site.COM", "a.b.org", "www.x.co.uk", "HOST"):
            for path in ("", "/a/B/docs", "/p1"):
                for slash in ("", "/"):
                    for q in ("", "?id=1&utm_source=x", "?utm_c=2", "?q=Y&"):
                        for frag in ("", "#frag"):
                            urls.append(
                                (f"{scheme}://{host}{path}{slash}{q}{frag}",)
                            )
    df = spark.createDataFrame(urls, ["u"])
    bad = df.select(
        "u",
        canonicalize_url("u").alias("c1"),
        canonicalize_url(canonicalize_url("u")).alias("c2"),
    ).filter("c1 <> c2")
    assert bad.count() == 0, bad.limit(5).collect()


def test_temperature_mix_invariants(spark):
    from pyspark.sql import functions as F

    from etl_oms_spark.operators.sampling import temperature_mix

    rows = (
        [("a", i) for i in range(97)]
        + [("b", i) for i in range(2)]
        + [("c", i) for i in range(1)]
    )
    df = spark.createDataFrame(rows, ["g", "x"])
    for alpha in (0.0, 0.3, 0.7, 1.0):
        out = temperature_mix(df, budget_docs=50, alpha=alpha, group_col="g").collect()
        # planned never exceeds availability or (summed) the budget
        assert all(r["planned_docs"] <= r["n_docs"] for r in out)
        assert sum(r["desired_docs"] for r in out) <= 50
        # mix fractions sum to ~1 and each is within (0, 1]
        s = sum(r["mix_frac"] for r in out)
        assert abs(s - 1.0) < 1e-12
    # flattening is monotone: lower alpha → smaller head fraction
    heads = {}
    for alpha in (0.0, 0.5, 1.0):
        out = temperature_mix(df, budget_docs=50, alpha=alpha, group_col="g").collect()
        heads[alpha] = next(r["mix_frac"] for r in out if r["g"] == "a")
    assert heads[0.0] <= heads[0.5] <= heads[1.0]


def test_priority_dedup_partition_invariance(spark):
    """Winners don't depend on the physical partitioning (argmin is an
    order-independent aggregate)."""
    from etl_oms_spark.operators.dedup import priority_dedup

    rows = [
        (i, f"s{i % 3}", f"text {i % 5}") for i in range(30)
    ]  # 5 dup groups × 6 copies
    df1 = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    df8 = df1.repartition(8)
    pri = {"s2": 0, "s0": 1, "s1": 2}
    a = sorted(map(tuple, priority_dedup(df1, pri).collect()))
    b = sorted(map(tuple, priority_dedup(df8, pri).collect()))
    assert a == b
    # every winner carries the highest-priority source present in its group
    assert all(r[1] == "s2" for r in a)  # s2 present in every mod-5 group


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=0, max_value=10**9),
        ),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=40),
)
@settings(max_examples=25, deadline=None)
def test_merge_rollup_state_equals_full_recompute(rows, split):
    """Algebraic-MV law: agg(base) ⊕ agg(delta) == agg(base ∪ delta) for
    any split point — the property ivm1's oracle checks at one split,
    hypothesis checks at arbitrary ones (driver-side model, exact)."""
    base, delta = rows[:split], rows[split:]

    def agg(part):
        out: dict[str, list[int]] = {}
        for k, n, s in part:
            acc = out.setdefault(k, [0, 0])
            acc[0] += n
            acc[1] += s
        return out

    merged = agg(base)
    for k, (n, s) in agg(delta).items():
        acc = merged.setdefault(k, [0, 0])
        acc[0] += n
        acc[1] += s
    assert merged == agg(rows)


@given(st.integers(min_value=1, max_value=10**12), st.integers(min_value=1, max_value=4096))
@settings(max_examples=200)
def test_suggest_num_planes_occupancy_bound(n, target):
    from etl_oms_spark.operators.similarity import suggest_num_planes

    p = suggest_num_planes(n, target)
    assert 1 <= p <= 63
    # expected occupancy never exceeds the target (up to the k=1 floor)
    assert n <= target or n / (2**p) <= target
    # and one fewer plane would overshoot (tightness), except at the floor
    if n > 2 * target:
        assert n / (2 ** (p - 1)) > target
