"""Connected components vs a pure-Python union-find oracle on adversarial
graphs (chains, stars, cliques, random) — reference analog: the chained-links
doc of find_connected_ids (/root/reference/utils/dataset_ingestion_utils.py:
487-540)."""

import random

from nhse_probabilistic_linkage_spark.operators.connected_components import (
    assign_components,
    connected_components,
)


def _oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        if a != b:  # self-loop-only nodes are singletons: backfilled by
            union(a, b)  # assign_components, absent from connected_components
    return {n: find(n) for n in parent}


def _check(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, "src long, dst long")
    # default path (local union-find finish once the frontier is small) and
    # the pure distributed star loop must agree with the oracle — and each other
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == _oracle(edges)
    dist = {
        r.id: r.component
        for r in connected_components(df, local_finish_edges=0).collect()
    }
    assert dist == got


def test_cc_chain(spark):
    _check(spark, [(i, i + 1) for i in range(60)])


def test_cc_star_and_reverse_star(spark):
    _check(spark, [(100, i) for i in range(20)] + [(j, 200) for j in range(300, 320)])


def test_cc_two_cliques_bridged(spark):
    clique1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _check(spark, clique1 + clique2 + [(4, 10)])


def test_cc_random_graph(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_cc_self_loops_and_duplicates(spark):
    _check(spark, [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)])


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_cc_local_finish_mid_loop_handoff(spark):
    # threshold below the initial edge count but above the contracted
    # frontier: the loop must run distributed star rounds first, then hand
    # the shrunken frontier to the union-find — same assignment as both
    # pure paths
    rng = random.Random(7)
    edges = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    oracle = _oracle(edges)
    star_edges = len(oracle) - len(set(oracle.values()))  # converged frontier size
    canon = len({(max(a, b), min(a, b)) for a, b in edges})
    assert canon > star_edges  # premise: round 0 MUST run distributed...
    df = spark.createDataFrame(edges, "src long, dst long")
    mid = {
        r.id: r.component
        # ...and the frontier contracts to star_edges, so the union-find
        # handoff is guaranteed to trigger before distributed convergence
        for r in connected_components(df, local_finish_edges=star_edges).collect()
    }
    assert mid == oracle


def test_assign_components_backfills_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.doc_id: r.cluster_id for r in assign_components(docs, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}
