"""PageRank / indegree: distributed result must match a dense numpy
reference (same damping, uniform teleport, uniform dangling
redistribution) to float tolerance. ONE distributed run is shared across
assertions — each distributed iteration costs several Ray executions, so
iteration counts here are deliberately small (the math is
iteration-count-independent)."""

import numpy as np
import pandas as pd
import ray.data
import ray.data as rd

from north_cloud_ray.stages.graph import indegree, pagerank


def _pagerank_dense(edges, d=0.85, iters=10):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    out = np.zeros(n)
    for s, t in edges:
        out[idx[s]] += 1
    for s, t in edges:
        M[idx[t], idx[s]] += 1.0 / out[idx[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (M @ r + dangling / n)
    return dict(zip(nodes, r))


def _edges_ds(edges):
    return ray.data.from_pandas(pd.DataFrame(
        {"src": [s for s, _ in edges], "dst": [t for _, t in edges]}
    )).repartition(3)


def test_pagerank_distributed_matches_dense_and_driver(ray_session):
    """One 3-iteration DISTRIBUTED run (forced via threshold=0, the
    100-TB shape) against BOTH the dense numpy reference and the
    size-adaptive driver path."""
    rng = np.random.default_rng(11)
    nodes = [f"h{i}" for i in range(30)]
    edges = [(nodes[rng.integers(30)], nodes[rng.integers(30)])
             for _ in range(150)]
    edges = [(s, t) for s, t in edges if s != t]
    want = _pagerank_dense(edges, iters=3)
    dist = pagerank(_edges_ds(edges), n_iters=3, num_partitions=4,
                    driver_edge_threshold=0).to_pandas()
    drv = pagerank(_edges_ds(edges), n_iters=3).to_pandas()
    dm = dict(zip(dist["node"], dist["rank"]))
    vm = dict(zip(drv["node"], drv["rank"]))
    assert set(dm) == set(want) == set(vm)
    for n in want:
        assert abs(dm[n] - want[n]) < 1e-9, (n, dm[n], want[n])
        assert abs(dm[n] - vm[n]) < 1e-12
    assert abs(sum(dm.values()) - 1.0) < 1e-9  # rank mass conserved


def test_pagerank_dangling_and_star(ray_session):
    """Star graph through the driver path: hub accumulates rank; the
    dense reference agrees (driver path IS the dense math on CSR)."""
    edges = [(f"leaf{i}", "hub") for i in range(5)]
    got = pagerank(_edges_ds(edges), n_iters=20).to_pandas()
    m = dict(zip(got["node"], got["rank"]))
    want = _pagerank_dense(edges, iters=20)
    for n in want:
        assert abs(m[n] - want[n]) < 1e-9
    assert m["hub"] > max(v for k, v in m.items() if k != "hub")


def test_indegree(ray_session):
    edges = [("a", "b"), ("c", "b"), ("a", "c"), ("b", "c"), ("c", "b")]
    got = indegree(_edges_ds(edges)).to_pandas().set_index("node")
    assert got.loc["b", "indegree"] == 3
    assert got.loc["c", "indegree"] == 2
    assert "a" not in got.index


def test_pagerank_empty_string_node(ray_session):
    """A node literally named '' must keep its own contribution bucket —
    the dangling-mass partials are flagged by column, not by a magic node
    value (regression: distributed path conflated the two)."""
    edges = [("a", ""), ("b", ""), ("", "c"), ("a", "c")]
    want = _pagerank_dense(edges, iters=5)
    dist = pagerank(_edges_ds(edges), n_iters=5, num_partitions=3,
                    driver_edge_threshold=0).to_pandas()
    drv = pagerank(_edges_ds(edges), n_iters=5).to_pandas()
    dm = dict(zip(dist["node"], dist["rank"]))
    vm = dict(zip(drv["node"], drv["rank"]))
    for n in want:
        assert abs(dm[n] - want[n]) < 1e-9, (n, dm[n], want[n])
        assert abs(vm[n] - want[n]) < 1e-9


def test_link_queries_over_crawl_graph(ray_session):
    """The crawl-graph queries must satisfy PageRank/indegree invariants:
    rank mass 1, node set == graph nodes, indegree totals == edge count."""
    from north_cloud_ray.pipelines import queries as Q

    edges = Q._crawl_page_edges().to_pandas()
    assert len(edges) > 100 and (edges["src"] != edges["dst"]).all()
    pr = Q.QUERIES["link_pagerank"]("/root/testdata/sf0.001").to_pandas()
    nodes = set(edges["src"]) | set(edges["dst"])
    assert set(pr["node"]) == nodes
    assert abs(pr["rank"].sum() - 1.0) < 1e-9
    assert (pr["rank"] > 0).all()
    ind = Q.QUERIES["link_indegree"]("/root/testdata/sf0.001").to_pandas()
    assert ind["indegree"].sum() == len(edges)
    assert set(ind["node"]) <= nodes


def test_triangle_counts_known_graph(ray_session):
    """K4 plus a pendant edge: every K4 node closes C(3,2)=3 triangles,
    the pendant closes none; duplicate/reversed/self edges collapse."""
    import ray.data as rd

    from north_cloud_ray.stages.graph import triangle_counts

    e = pd.DataFrame({
        "src": [0, 0, 0, 1, 1, 2, 2, 3, 4, 0],
        "dst": [1, 2, 3, 2, 3, 3, 1, 0, 0, 0],  # dupes + reverse + loop
    })
    out = (triangle_counts(rd.from_pandas(e).repartition(3))
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = pd.DataFrame({"node": np.array([0, 1, 2, 3], "int64"),
                         "n_triangles": np.array([3, 3, 3, 3], "int64")})
    pd.testing.assert_frame_equal(out, want, check_exact=True)


def test_triangle_counts_partition_independent(ray_session):
    import ray.data as rd

    from north_cloud_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(7)
    e = pd.DataFrame({"src": rng.integers(0, 60, 500),
                      "dst": rng.integers(0, 60, 500)})
    a = (triangle_counts(rd.from_pandas(e).repartition(1),
                         num_partitions=2)
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (triangle_counts(rd.from_pandas(e).repartition(9),
                         num_partitions=5)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_triangle_counts_negative_ids_raise(ray_session):
    import pytest
    import ray.data as rd

    from north_cloud_ray.stages.graph import triangle_counts

    e = pd.DataFrame({"src": [-1, 0], "dst": [0, 1]})
    with pytest.raises(Exception):
        triangle_counts(rd.from_pandas(e)).to_pandas()


def test_triangle_counts_matches_bruteforce(ray_session):
    """Random graph vs O(n^3) brute force over the adjacency matrix."""
    import ray.data as rd

    from north_cloud_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(123)
    n = 40
    e = pd.DataFrame({"src": rng.integers(0, n, 300),
                      "dst": rng.integers(0, n, 300)})
    got = (triangle_counts(rd.from_pandas(e).repartition(4))
           .to_pandas().sort_values("node").reset_index(drop=True))

    A = np.zeros((n, n), dtype=bool)
    s, d = e["src"].to_numpy(), e["dst"].to_numpy()
    keep = s != d
    A[s[keep], d[keep]] = True
    A |= A.T
    counts = np.zeros(n, dtype=np.int64)
    for x in range(n):
        for y in range(x + 1, n):
            if not A[x, y]:
                continue
            for z in range(y + 1, n):
                if A[x, z] and A[y, z]:
                    counts[[x, y, z]] += 1
    nodes = np.flatnonzero(counts)
    want = pd.DataFrame({"node": nodes.astype("int64"),
                         "n_triangles": counts[nodes]})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_exact=True)


def test_bfs_hops_min_distance_and_horizon(ray_session):
    """Diamond graph with a shortcut: hop must be the MINIMUM distance;
    nodes beyond max_hops and disconnected nodes must be absent; a
    revisited node must keep its smaller hop."""
    from north_cloud_ray.stages.graph import bfs_hops

    # 0->1->2->3->4->5 chain, plus shortcut 0->3; node 9 disconnected
    e = pd.DataFrame({"src": [0, 1, 2, 3, 4, 0],
                      "dst": [1, 2, 3, 4, 5, 3]})
    seeds = pd.DataFrame({"node": [0]})
    got = (bfs_hops(rd.from_pandas(e).repartition(3),
                    rd.from_pandas(seeds), max_hops=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # shortcut 0->3 pulls 4 and 5 inside the horizon: 3@1, 4@2, 5@3
    want = pd.DataFrame({"node": [0, 1, 2, 3, 4, 5],
                         "hop": [0, 1, 2, 1, 2, 3]}).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), want,
                                  check_exact=True)


def test_bfs_hops_matches_bruteforce(ray_session):
    """Random sparse digraph vs a driver BFS."""
    from collections import deque

    from north_cloud_ray.stages.graph import bfs_hops

    rng = np.random.default_rng(11)
    n, m, K = 200, 600, 4
    e = pd.DataFrame({"src": rng.integers(0, n, m),
                      "dst": rng.integers(0, n, m)})
    seed_ids = [0, 50, 199]
    adj = {}
    for s, d in zip(e["src"], e["dst"]):
        adj.setdefault(int(s), []).append(int(d))
    dist = {s: 0 for s in seed_ids}
    dq = deque(seed_ids)
    while dq:
        u = dq.popleft()
        if dist[u] >= K:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    got = (bfs_hops(rd.from_pandas(e).repartition(8),
                    rd.from_pandas(pd.DataFrame({"node": seed_ids})),
                    max_hops=K)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = (pd.DataFrame({"node": sorted(dist),
                          "hop": [dist[k] for k in sorted(dist)]})
            .astype("int64"))
    pd.testing.assert_frame_equal(got.astype("int64"), want,
                                  check_exact=True)
