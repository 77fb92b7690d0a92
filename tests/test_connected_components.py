"""connected_components (alternating star contraction) vs a driver-side
union-find ground truth, plus the degenerate shapes the fixpoint logic must
survive: empty edge sets, isolated vertices, self-loops, duplicate /
reversed edges, and a long chain (the diameter case that kills naive
min-label propagation)."""

import random

from eurostat_energy_etl_pipeline_spark.operators.dedup import connected_components


def _union_find(n, edges):
    parent = list(range(n))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


def _spark_cc(spark, n, edges):
    edf = spark.createDataFrame(edges or [(0, 0)], ["id_a", "id_b"])
    ndf = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    rows = connected_components(edf, nodes=ndf).collect()
    assert len(rows) == n
    return {r["id"]: r["component"] for r in rows}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(17)
    for n, m in [(40, 20), (120, 90), (80, 200)]:
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        assert _spark_cc(spark, n, edges) == _union_find(n, edges)


def test_long_chain_converges(spark):
    # 150-node path: naive propagation needs ~150 rounds; star contraction
    # must finish inside the operator's max_iter and label everything 0.
    n = 150
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _spark_cc(spark, n, edges)
    assert set(got.values()) == {0}


def test_no_edges_all_singletons(spark):
    got = _spark_cc(spark, 25, [])
    assert got == {i: i for i in range(25)}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(3, 3), (1, 2), (2, 1), (1, 2), (7, 7)]
    got = _spark_cc(spark, 10, edges)
    expected = {i: i for i in range(10)}
    expected[2] = 1
    assert got == expected


def test_isolated_nodes_keep_own_label(spark):
    # nodes frame is wider than the edge endpoints
    edges = [(0, 1)]
    got = _spark_cc(spark, 6, edges)
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4, 5: 5}


def test_default_nodes_are_edge_endpoints(spark):
    edf = spark.createDataFrame([(5, 9), (9, 11)], ["id_a", "id_b"])
    rows = connected_components(edf).collect()
    assert {r["id"]: r["component"] for r in rows} == {5: 5, 9: 5, 11: 5}
