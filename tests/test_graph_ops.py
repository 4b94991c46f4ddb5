"""k-core decomposition: peeling semantics on hand-built graphs."""

from __future__ import annotations


def test_k_core_peels_chains_keeps_cliques(spark):
    from etl_oms_spark.operators.graph import k_core

    # K4 (1-4) + a tail 4-5-6 + an isolated edge 7-8: 2-core = the K4
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (7, 8)],
        "id_a long, id_b long",
    )
    out = {r["id"]: r["core_degree"] for r in k_core(edges, k=2).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # 3-core of the same graph is still the K4; 4-core is empty
    assert {r["id"] for r in k_core(edges, k=3).collect()} == {1, 2, 3, 4}
    assert k_core(edges, k=4).count() == 0


def test_k_core_cascading_peel(spark):
    from etl_oms_spark.operators.graph import k_core

    # a chain: every round exposes a new endpoint; tests multi-round peel
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    assert k_core(edges, k=2).count() == 0


# ---------------------------------------------------------------------------
# multi-source BFS


def _bfs(spark, edges, seeds, max_hops=4):
    from etl_oms_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(edges, "u long, v long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return {
        r["id"]: r["hops"] for r in bfs_hops(e, s, max_hops=max_hops).collect()
    }


def test_bfs_chain_distances(spark):
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1])
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_multi_source_takes_min(spark):
    # seeds at both ends of a 5-chain: middle node is 2 from either end
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1, 5])
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_bfs_max_hops_truncates(spark):
    got = _bfs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1], max_hops=2)
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_unreachable_excluded_isolated_seed_at_zero(spark):
    # component {1,2} seeded; {3,4} unreachable; 99 is an isolated seed
    got = _bfs(spark, [(1, 2), (3, 4)], [1, 99])
    assert got == {1: 0, 2: 1, 99: 0}


def test_bfs_undirected_follows_reverse_edges(spark):
    got = _bfs(spark, [(2, 1), (3, 2)], [1])
    assert got == {1: 0, 2: 1, 3: 2}
