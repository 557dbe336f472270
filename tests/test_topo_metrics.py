"""Topology-weighted IR metrics (SURVEY §2.8 M8-M9) vs a direct
loop reimplementation of the reference formulas
(tests/test_6_beir_new_score.py:330-395)."""

import math

import pytest
from pyspark.sql import functions as F

from pyarrowspace_spark.operators import topo_metrics as TM

K = 3
# toy graph: triangle 0-1-2 plus pendant 3
EDGES = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 0.5), (2, 3, 0.25)]
# one query, ranking [1, 2, 3] with rel [1, 0, 1]
RANKING = [(0, 1, 1, 1), (0, 2, 2, 0), (0, 3, 3, 1)]
COMMS = [(0, 10), (1, 10), (2, 10), (3, 20)]


@pytest.fixture(scope="module")
def dfs(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long, weight double")
    rankings = spark.createDataFrame(
        RANKING, "query_id long, item_id long, rank int, rel int")
    comms = spark.createDataFrame(COMMS, "node long, community long")
    return edges, rankings, comms


def _degrees():
    deg = {}
    for s, d, w in EDGES:
        deg[s] = deg.get(s, 0.0) + w
        deg[d] = deg.get(d, 0.0) + w
    return deg


def _cond(prefix):
    deg = _degrees()
    vol_t = sum(deg.values())
    vol_s = sum(deg.get(n, 0.0) for n in prefix)
    cut = sum(w for s, d, w in EDGES if (s in prefix) != (d in prefix))
    m = min(vol_s, vol_t - vol_s)
    return 1.0 if m <= 0 else cut / m


def _share(prefix):
    c = {0: 10, 1: 10, 2: 10, 3: 20}
    counts = {}
    for n in prefix:
        counts[c[n]] = counts.get(c[n], 0) + 1
    return max(counts.values()) / len(prefix)


def test_prefix_conductance(dfs):
    edges, rankings, _ = dfs
    got = {r["d"]: r["cond"] for r in
           TM.prefix_conductance(edges, rankings, K).collect()}
    items = [1, 2, 3]
    for d in (1, 2, 3):
        assert got[d] == pytest.approx(_cond(set(items[:d])), abs=1e-12), d


def test_prefix_max_share(dfs):
    edges, rankings, comms = dfs
    got = {r["d"]: r["max_share"] for r in
           TM.prefix_max_share(rankings, comms, K).collect()}
    items = [1, 2, 3]
    for d in (1, 2, 3):
        assert got[d] == pytest.approx(_share(items[:d]), abs=1e-12), d


def test_graph_aware_metrics_reference_loops(dfs, spark):
    # fixed t-factors; compare to straight loops over the reference
    # formulas (g_rbp :330, td_ndcg :339, it_err :354, mrr_topo :367)
    rel = [1, 0, 1]
    t = [0.8, 0.5, 0.6]
    ranked = spark.createDataFrame(
        [(0, i + 1, i + 1, rel[i], t[i]) for i in range(3)],
        "query_id long, item_id long, rank int, rel int, t_factor double")
    row = TM.graph_aware_metrics(ranked, K, p=0.9, max_grade=3).collect()[0]

    p = 0.9
    g_rbp = sum((1 - p) * rel[i] * p ** i * t[i] for i in range(3))
    dcg = sum((2 ** rel[i] - 1) * t[i] / math.log2(i + 2) for i in range(3))
    ideal = sorted(rel, reverse=True)
    idcg = sum((2 ** r - 1) * max(t) / math.log2(i + 2)
               for i, r in enumerate(ideal))
    err, stop = 0.0, 0.0
    for i in range(3):
        rt = rel[i] / 3 * t[i]
        err += (1 - stop) * rt / (i + 1)
        stop += (1 - stop) * rt
    assert row["g_rbp"] == pytest.approx(g_rbp, abs=1e-12)
    assert row["td_ndcg"] == pytest.approx(dcg / idcg, abs=1e-12)
    assert row["it_err"] == pytest.approx(err, abs=1e-12)
    assert row["mrr_topo"] == pytest.approx(t[0] / 1, abs=1e-12)


def test_mrr_topo_no_relevant(dfs, spark):
    ranked = spark.createDataFrame(
        [(0, i + 1, i + 1, 0, 0.5) for i in range(3)],
        "query_id long, item_id long, rank int, rel int, t_factor double")
    row = TM.graph_aware_metrics(ranked, K).collect()[0]
    assert row["mrr_topo"] == 0.0
    assert row["td_ndcg"] == 0.0
    assert row["g_rbp"] == 0.0


def test_greedy_modularity_two_cliques(spark):
    """CNM greedy (reference algorithm family,
    test_6_beir_new_score.py:256-263) recovers two cliques joined by a
    weak bridge, and its modularity beats-or-ties weighted LPA on the
    same graph."""
    from pyarrowspace_spark.operators import topology as TOP
    import pyspark.sql.functions as F

    cl1, cl2 = [0, 1, 2, 3], [10, 11, 12, 13]
    rows = []
    for grp in (cl1, cl2):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                rows.append((grp[i], grp[j], 1.0))
    rows.append((3, 10, 0.05))  # weak bridge
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")

    comm = TOP.greedy_modularity_communities(edges)
    got = {r["node"]: r["community"] for r in comm.collect()}
    assert len({got[n] for n in cl1}) == 1
    assert len({got[n] for n in cl2}) == 1
    assert got[0] != got[10]

    q_greedy = TOP.modularity(edges, comm).agg(
        F.sum("q_c")).collect()[0][0]
    lpa = TOP.label_propagation(edges, iters=4)
    q_lpa = TOP.modularity(edges, lpa).agg(F.sum("q_c")).collect()[0][0]
    assert q_greedy >= q_lpa - 1e-12
    assert q_greedy > 0.3   # two-community split of 2 cliques: Q ~ 0.5


def test_greedy_modularity_max_nodes_guard(spark):
    from pyarrowspace_spark.operators import topology as TOP
    import pytest as _pt

    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(20)],
        "src long, dst long, weight double")
    with _pt.raises(ValueError, match="max_nodes"):
        TOP.greedy_modularity_communities(edges, max_nodes=5)
