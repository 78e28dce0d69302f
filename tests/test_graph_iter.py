"""Iterative graph operators: eigenvector centrality (power iteration) and
connected components (min-label propagation) on graphs with known answers."""

from __future__ import annotations

import numpy as np
import pytest


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "g long, a long, b long").selectExpr(
        "g", "a", "b"
    )


def test_connected_components_two_chains(spark):
    from spark_pit.operators.graph import connected_components

    # entity 1: chain 1-2-3-4 and isolated pair 10-11; entity 2: triangle
    rows = [(1, 1, 2), (1, 2, 3), (1, 3, 4), (1, 10, 11),
            (2, 5, 6), (2, 6, 7), (2, 5, 7)]
    out = connected_components(_edges_df(spark, rows), "g").toPandas()
    comp = {(r.g, r.node): r.component for r in out.itertuples()}
    assert comp[(1, 1)] == comp[(1, 2)] == comp[(1, 3)] == comp[(1, 4)] == 1
    assert comp[(1, 10)] == comp[(1, 11)] == 10
    assert comp[(2, 5)] == comp[(2, 6)] == comp[(2, 7)] == 5


def test_connected_components_long_chain_converges(spark):
    from spark_pit.operators.graph import connected_components

    n = 20  # diameter 19 > naive per-step reach; min-label still converges
    rows = [(1, i, i + 1) for i in range(n)]
    out = connected_components(_edges_df(spark, rows), "g").toPandas()
    assert set(out["component"]) == {0}
    assert len(out) == n + 1


def test_eigenvector_centrality_star(spark):
    from spark_pit.operators.graph import eigenvector_centrality

    # star: center 0 linked to 1..4 — center gets the max centrality and
    # all leaves are symmetric-equal; compare against numpy eig on A
    rows = [(1, 0, i) for i in range(1, 5)]
    out = eigenvector_centrality(_edges_df(spark, rows), "g", n_iter=8).toPandas()
    c = dict(zip(out["node"], out["centrality"]))
    assert c[0] > c[1]
    assert len({c[i] for i in range(1, 5)}) == 1
    a = np.zeros((5, 5))
    for _, i, j in rows:
        a[i, j] = a[j, i] = 1.0
    w, v = np.linalg.eigh(a)
    lead = np.abs(v[:, np.argmax(w)])
    lead = lead / np.linalg.norm(lead)
    got = np.array([c[i] for i in range(5)])
    assert np.allclose(got, lead, atol=1e-3)


def test_shortest_paths_and_stats(spark):
    from spark_pit.operators.graph import (
        closeness_centrality, path_stats, shortest_paths,
    )

    # entity 1: path graph 0-1-2-3 (known distances); entity 2: triangle + isolate pair
    rows = [(1, 0, 1), (1, 1, 2), (1, 2, 3), (2, 0, 1), (2, 1, 2), (2, 0, 2), (2, 8, 9)]
    sp = shortest_paths(_edges_df(spark, rows), "g").toPandas()
    d = {(r.g, r.src, r.node): r.dist for r in sp.itertuples()}
    assert d[(1, 0, 3)] == 3 and d[(1, 0, 2)] == 2 and d[(1, 1, 3)] == 2
    assert d[(2, 0, 2)] == 1 and d[(2, 8, 9)] == 1
    assert (2, 0, 8) not in d  # disconnected pair never materializes

    st = path_stats(shortest_paths(_edges_df(spark, rows), "g"), "g").toPandas()
    st = st.set_index("g")
    assert st.loc[1, "diameter"] == 3
    # path graph P4: ordered connected pairs 12, sum dist = 2*(1+2+3)+2*(1+2)+2*1 = 20
    assert st.loc[1, "avg_path_len"] == 20 / 12
    assert st.loc[2, "diameter"] == 1  # triangle and pair both diameter 1

    # closeness matches the networkx Wasserman-Faust formula on P4:
    # end node: r=4, sum=1+2+3=6 -> (3/6)*(3/3)=0.5 ; middle: sum=1+1+2=4 -> 0.75
    cl = closeness_centrality(shortest_paths(_edges_df(spark, rows), "g"), "g").toPandas()
    c = {(r.g, r.node): r.closeness for r in cl.itertuples()}
    assert c[(1, 0)] == 0.5 and c[(1, 1)] == 0.75
    # entity 2 disconnected: triangle node r=3, sum=2, n=5 -> (2/2)*(2/4)=0.5
    assert c[(2, 0)] == 0.5


def test_betweenness_path_and_star(spark):
    """Brandes sweeps vs hand-computed networkx-normalized values:
    P4 (0-1-2-3): middles raw 2 -> 2*2/(3*2) = 0.666667, ends 0.
    Star K1,4: center raw 6 -> 6*2/(4*3) = 1.0, leaves 0."""
    import pytest as _pt

    from spark_pit.operators.graph import betweenness_centrality

    rows = [(1, 0, 1), (1, 1, 2), (1, 2, 3)] + [(2, 0, i) for i in range(1, 5)]
    out = betweenness_centrality(_edges_df(spark, rows), "g").toPandas()
    b = {(r.g, r.node): r.betweenness for r in out.itertuples()}
    assert b[(1, 0)] == 0.0 and b[(1, 3)] == 0.0
    assert b[(1, 1)] == _pt.approx(2 * 2 / (3 * 2))
    assert b[(1, 2)] == _pt.approx(2 * 2 / (3 * 2))
    assert b[(2, 0)] == _pt.approx(1.0)
    assert all(b[(2, i)] == 0.0 for i in range(1, 5))


def test_betweenness_multiple_shortest_paths(spark):
    """4-cycle 0-1-2-3-0: (0,2) has TWO shortest paths (via 1 and via 3),
    so each of 1 and 3 gets 0.5 from that pair; raw 0.5 -> 0.5*2/(3*2)."""
    import pytest as _pt

    from spark_pit.operators.graph import betweenness_centrality

    rows = [(1, 0, 1), (1, 1, 2), (1, 2, 3), (1, 0, 3)]
    out = betweenness_centrality(_edges_df(spark, rows), "g").toPandas()
    b = dict(zip(out["node"], out["betweenness"]))
    for v in range(4):
        assert b[v] == _pt.approx(0.5 * 2 / (3 * 2)), v


def test_dbscan_core_border_noise(spark):
    """1-D chain: {0,1,2} with eps=1 makes node1 core (3-point hood) and
    0/2 borders; {5,6,7} is a second cluster; 10 is noise."""
    from spark_pit.operators.graph import contact_edges, dbscan_clusters

    vals = [0.0, 1.0, 2.0, 5.0, 6.0, 7.0, 10.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "g long, node long, v double"
    )
    edges = contact_edges(df, "g", "node", "v", cutoff=1.0)
    out = dbscan_clusters(edges, df.select("g", "node"), "g", min_pts=3).toPandas()
    m = out.set_index("node")
    assert bool(m.loc[1, "is_core"]) and not bool(m.loc[0, "is_core"])
    assert m.loc[0, "cluster"] == 1 and m.loc[1, "cluster"] == 1 and m.loc[2, "cluster"] == 1
    assert m.loc[3, "cluster"] == 4 and m.loc[4, "cluster"] == 4 and m.loc[5, "cluster"] == 4
    assert not bool(m.loc[6, "is_core"]) and pd_isna(m.loc[6, "cluster"])


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def _brandes_brute(edges):
    """Reference Brandes on one small graph, networkx-normalized."""
    from collections import deque

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    bet = {v: 0.0 for v in nodes}
    for s in nodes:
        stack, pred = [], {v: [] for v in nodes}
        sigma = {v: 0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[s], dist[s] = 1, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bet[w] += delta[w]
    n = len(nodes)
    scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else 0.0  # /2 undirected * 2/((n-1)(n-2))
    return {v: bet[v] * scale for v in nodes}


def test_betweenness_random_graphs_match_brute(spark):
    """Five seeded random graphs (one entity each, ONE Spark job) vs the
    pure-Python Brandes reference — covers branching, multiple shortest
    paths, and disconnected remainders."""
    rng = np.random.default_rng(123)
    from spark_pit.operators.graph import betweenness_centrality

    all_rows, want = [], {}
    for g in range(5):
        k = int(rng.integers(6, 11))
        cand = [(a, b) for a in range(k) for b in range(a + 1, k)]
        m = int(rng.integers(k - 1, len(cand)))
        idx = rng.choice(len(cand), size=m, replace=False)
        edges = [cand[i] for i in idx]
        all_rows += [(g, a, b) for a, b in edges]
        for v, x in _brandes_brute(edges).items():
            want[(g, v)] = x
    out = betweenness_centrality(_edges_df(spark, all_rows), "g").toPandas()
    got = {(r.g, r.node): r.betweenness for r in out.itertuples()}
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-9), key


def test_eigenvector_centrality_is_per_entity(spark):
    from spark_pit.operators.graph import eigenvector_centrality

    rows = [(1, 0, 1), (1, 1, 2), (2, 0, 1)]  # different graphs share node ids
    out = eigenvector_centrality(_edges_df(spark, rows), "g", n_iter=8).toPandas()
    assert len(out) == 5
    g2 = out[out["g"] == 2]["centrality"].to_numpy()
    assert np.allclose(g2, [1 / np.sqrt(2)] * 2, atol=1e-6)


def test_betweenness_sampled_sources(spark):
    """Brandes–Pich sampled-source estimator: with s >= V the sample is the
    full source set and the V/s scale is 1, so values equal exact Brandes
    bit-for-bit; with s < V the seeded estimator still ranks the bridge
    endpoints of the barbell graph on top and stays within a loose
    absolute band of exact (deterministic seed → stable assertion)."""
    from spark_pit.operators.graph import betweenness_centrality

    # barbell: two 4-cliques joined by a 2-edge path through node 8
    clique = lambda off: [(a + off, b + off) for a in range(4) for b in range(a + 1, 4)]
    rows = [(1, a, b) for a, b in clique(0) + clique(4) + [(3, 8), (8, 7)]]
    df = _edges_df(spark, rows)
    exact = betweenness_centrality(df, "g").toPandas()
    full = betweenness_centrality(df, "g", sample_sources=100).toPandas()
    e = dict(zip(exact["node"], exact["betweenness"]))
    f = dict(zip(full["node"], full["betweenness"]))
    assert set(e) == set(f)
    for v in e:
        assert f[v] == pytest.approx(e[v], abs=1e-9)

    samp = betweenness_centrality(df, "g", sample_sources=5, seed=7).toPandas()
    s = dict(zip(samp["node"], samp["betweenness"]))
    # bridge path (3, 8, 7) dominates in both exact and sampled rankings
    top3 = sorted(s, key=s.get, reverse=True)[:3]
    assert set(top3) == {3, 7, 8}
    for v in e:
        assert abs(s[v] - e[v]) < 0.25, (v, s[v], e[v])


def test_pagerank_properties(spark):
    """PageRank on a known star + path fixture: per-entity ranks sum to
    ~1e9 nanos, the star center outranks every leaf, symmetric nodes tie
    exactly (integer iterates), and a brute-force numpy power iteration
    with the SAME nano-quantization reproduces the values bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from spark_pit.operators.graph import pagerank

    # entity 1: star 1-2, 1-3, 1-4; entity 2: path 1-2-3
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"g": [1, 1, 1, 2, 2], "a": [1, 1, 1, 1, 2], "b": [2, 3, 4, 2, 3]}
        )
    )
    out = pagerank(edges, "g", n_iter=6).toPandas()
    for g, grp in out.groupby("g"):
        total = grp["pagerank_nano"].sum()
        assert abs(total - 1_000_000_000) < 100, (g, total)  # floor drift only
    star = out[out["g"] == 1].set_index("node")["pagerank_nano"]
    assert star[1] > star[2] == star[3] == star[4]
    path = out[out["g"] == 2].set_index("node")["pagerank_nano"]
    assert path[2] > path[1] == path[3]
    # brute-force twin with identical quantization
    for g, nbrs in ((1, {1: [2, 3, 4], 2: [1], 3: [1], 4: [1]}),
                    (2, {1: [2], 2: [1, 3], 3: [2]})):
        nodes = sorted(nbrs)
        nn = len(nodes)
        q = {n: int(np.floor(1e9 / nn + 0.5)) for n in nodes}
        for _ in range(6):
            c = {n: int(np.floor(q[n] / len(nbrs[n]) + 0.5)) for n in nodes}
            s = {n: sum(c[m] for m in nbrs[n]) for n in nodes}
            q = {
                n: int(np.floor(0.15e9 / nn + 0.85 * s[n] + 0.5)) for n in nodes
            }
        got = out[out["g"] == g].set_index("node")["pagerank_nano"]
        for n in nodes:
            assert int(got[n]) == q[n], (g, n, int(got[n]), q[n])
