"""Large-star/small-star connected components: exactness vs a pure-Python
union-find on random graphs, O(log n) round bound on the adversarial chain
fixture (where plain min-label propagation would need O(n) rounds), and
oracle agreement for the driver's neardup_components query path."""

import math
import random

import pytest
from pyspark.sql import types as T

from frontier_engine.graph import connected_components_star

_EDGE_SCHEMA = T.StructType(
    [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
)
_VERT_SCHEMA = T.StructType([T.StructField("id", T.LongType())])


@pytest.fixture(autouse=True)
def _few_shuffle_partitions(spark):
    """Tiny graphs + iterative rounds: 32 shuffle partitions would spend
    the whole test on task overhead. Restore after."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _uf_components(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member id
    comp_min: dict = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n)}


def _run(spark, n, edges, **kw):
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [], _EDGE_SCHEMA
    )
    v = spark.createDataFrame([(int(i),) for i in range(n)], _VERT_SCHEMA)
    comp, rounds = connected_components_star(e, v, **kw)
    got = {r["id"]: r["comp"] for r in comp.collect()}
    return got, rounds


def test_chain_converges_in_log_rounds(spark):
    """The adversarial fixture: a 256-node path. Min-label propagation
    needs ~n rounds; star contraction must finish in O(log n)."""
    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    got, rounds = _run(spark, n, edges)
    assert got == {v: 0 for v in range(n)}
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(180)
    ]
    got, rounds = _run(spark, n, edges)
    assert got == _uf_components(n, edges)
    assert rounds <= 12


def test_singletons_and_self_loops(spark):
    got, _ = _run(spark, 5, [(1, 1), (2, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 4}


def test_max_rounds_exhaustion_raises(spark):
    """Exiting via max_rounds without a fixpoint must raise, not silently
    return a non-star-forest edge set (round-3 advice: duplicate (id, comp)
    rows with no error signal)."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _run(spark, n, edges, max_rounds=2)


def test_empty_edges(spark):
    got, rounds = _run(spark, 4, [])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_two_chains_and_a_clique(spark):
    """Mixed shapes in one graph: two disjoint chains + one clique."""
    chain_a = [(i, i + 1) for i in range(0, 19)]           # 0..19
    chain_b = [(i, i + 1) for i in range(40, 59)]          # 40..59
    clique = [(a, b) for a in range(80, 86) for b in range(a + 1, 86)]
    got, rounds = _run(spark, 100, chain_a + chain_b + clique)
    want = _uf_components(100, chain_a + chain_b + clique)
    assert got == want
    assert rounds <= 12
