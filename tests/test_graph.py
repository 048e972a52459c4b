"""Link-graph operators: degree_stats and integer-fixed-point PageRank
(doonop_spark/operators/graph.py) pinned against a dict-based Python
replay of the exact integer recurrence — bit-identical, any partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from doonop_spark.operators.graph import degree_stats, pagerank_fixed_point

# a small irregular digraph: 0 is a hub, 4 dangles, 5 is isolated,
# 1→2→1 is a cycle, and 0→2 duplicates nothing
EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 1), (3, 4)]
NODES = [0, 1, 2, 3, 4, 5]


def _frames(spark, nodes=NODES, edges=EDGES):
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return n, e


def pagerank_py(nodes, edges, iterations=4, scale=10**12, dnum=85, dden=100):
    """Reference replay of the operator's documented recurrence in exact
    python ints."""
    n = len(nodes)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    init = scale // n
    base = ((dden - dnum) * init) // dden
    r = {v: init for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if v not in outdeg)
        share = dang // n
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // outdeg[s]
        r = {v: base + (dnum * (inc[v] + share)) // dden for v in nodes}
    return r


def test_degree_stats(spark):
    n, e = _frames(spark)
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(n, e).collect()}
    assert got == {0: (3, 0), 1: (1, 2), 2: (1, 2), 3: (1, 1), 4: (0, 1), 5: (0, 0)}


def test_pagerank_matches_python_reference(spark):
    n, e = _frames(spark)
    got = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(n, e).collect()}
    assert got == pagerank_py(NODES, EDGES)


def test_pagerank_partitioning_invariant(spark):
    """Integer arithmetic ⇒ bit-identical ranks under any shuffle layout."""
    n, e = _frames(spark)
    base = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(n, e).collect()}
    n2, e2 = n.repartition(7), e.repartition(5)
    got = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(n2, e2).collect()}
    assert got == base
    got1 = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(n.coalesce(1), e.coalesce(1)).collect()
    }
    assert got1 == base


def test_pagerank_all_dangling(spark):
    """No edges at all: every node keeps base + damped share of the whole
    dangling mass each round — equal ranks, no crash, no division blowup."""
    n = spark.createDataFrame([(x,) for x in range(4)], "node long")
    e = spark.createDataFrame([], "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(n, e).collect()}
    ref = pagerank_py(list(range(4)), [])
    assert got == ref
    assert len(set(got.values())) == 1


def test_pagerank_hub_ranks_highest(spark):
    """Star graph: everything points at 0 ⇒ 0's rank dominates."""
    nodes = list(range(6))
    edges = [(i, 0) for i in range(1, 6)]
    n, e = _frames(spark, nodes, edges)
    got = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(n, e).collect()}
    assert got == pagerank_py(nodes, edges)
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(1, 6))


def test_pagerank_mass_approximately_conserved(spark):
    """Floor-div loses < 1 unit per node per step; total stays within
    iterations·n units of scale."""
    n, e = _frames(spark)
    got = pagerank_fixed_point(n, e, iterations=4)
    total = got.agg(F.sum("rank_fp")).collect()[0][0]
    scale = 10**12
    assert scale - 4 * len(NODES) * 200 <= total <= scale
