"""Pure-Python fixed-point PageRank twin — NO pyspark imports.

Lives outside graph.py so the pure-Python refspec oracle (refspec.py) can
consume the rank build without transitively importing pyspark: with
cfg.host_rank_every on, the oracle's rank math must stay runnable in an
environment that has only the stdlib (the point of a refspec). graph.py
re-exports both names, so Spark-side callers are unchanged.
"""

PR_SCALE = 1_000_000  # fixed-point rank scale
PR_BASE = 15 * PR_SCALE // 100  # damping base = floor(0.15 * scale)


def integer_pagerank_py(edge_list, iters: int = 3) -> dict:
    """Pure-Python twin of graph.integer_pagerank (golden oracle):
    rank0 = PR_SCALE per node; each round
    ``rank_v = 150000 + (17 * Σ_{u->v} (rank_u div outdeg_u)) div 20``
    (damping 0.85 via floor divisions — aggregation-order-exact)."""
    e = sorted({(s, d) for s, d in edge_list if s != d})
    outdeg: dict = {}
    nodes = set()
    for s, d in e:
        outdeg[s] = outdeg.get(s, 0) + 1
        nodes.add(s)
        nodes.add(d)
    rnk = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        s_in: dict = {}
        for s, d in e:
            s_in[d] = s_in.get(d, 0) + rnk[s] // outdeg[s]
        rnk = {n: PR_BASE + (17 * s_in.get(n, 0)) // 20 for n in nodes}
    return rnk
