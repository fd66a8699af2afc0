"""PageRank (ops/graph.py): both distribution strategies against a dense
numpy power-iteration reference, including dangling-node mass."""

import numpy as np
import pandas as pd
import pytest


def _graph(n_nodes=60, n_edges=400, seed=2):
    rng = np.random.default_rng(seed)
    e = pd.DataFrame(
        {
            "src": [f"n{i}" for i in rng.integers(0, n_nodes, n_edges)],
            "dst": [f"n{i}" for i in rng.integers(0, n_nodes, n_edges)],
            "w": rng.integers(1, 5, n_edges).astype("float64"),
        }
    )
    return e[e.src != e.dst].drop_duplicates(["src", "dst"]).reset_index(drop=True)


def _numpy_pagerank(e: pd.DataFrame, iters: int, damping: float = 0.85):
    ids = sorted(set(e.src) | set(e.dst))
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    W = np.zeros((n, n))
    for s, d, w in zip(e.src, e.dst, e.w):
        W[ix[s], ix[d]] = w
    outw = W.sum(1)
    has_out = outw > 0
    P = np.divide(W, np.where(outw[:, None] > 0, outw[:, None], 1))
    r = np.full(n, 1 / n)
    for _ in range(iters):
        dangling = r[~has_out].sum()
        r = (1 - damping) / n + damping * (P.T @ r + dangling / n)
    return ids, r


@pytest.mark.parametrize("strategy", ["auto", "broadcast", "join"])
def test_pagerank_matches_numpy(ray_session, strategy):
    import ray.data

    from cartography_ray.ops.graph import pagerank

    e = _graph()
    ids, want = _numpy_pagerank(e, iters=15)
    out = (
        pagerank(
            ray.data.from_pandas(e).repartition(3), "src", "dst", weight="w",
            iters=15, strategy=strategy, num_partitions=4,
        )
        .to_pandas()
        .set_index("node")["rank"]
        .reindex(ids)
        .to_numpy()
    )
    assert abs(out.sum() - 1.0) < 1e-9
    assert np.abs(out - want).max() < 1e-12


def test_pagerank_unweighted_and_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from cartography_ray.ops.graph import pagerank
    from cartography_ray.runtime import to_pandas_typed

    # unweighted: a sink node (dangling) still accumulates rank
    e = pd.DataFrame({"src": ["a", "b", "a"], "dst": ["b", "c", "c"], "w": [1.0] * 3})
    out = (
        pagerank(ray.data.from_pandas(e[["src", "dst"]]), "src", "dst", iters=10)
        .to_pandas()
        .set_index("node")["rank"]
    )
    assert abs(out.sum() - 1.0) < 1e-9
    assert out["c"] > out["a"]  # c receives from both, emits nothing

    empty = pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
    )
    res = to_pandas_typed(pagerank(ray.data.from_arrow(empty), "src", "dst", iters=2))
    assert len(res) == 0 and list(res.columns) == ["node", "rank"]

    # ADVICE r03: the empty path must mirror the edges' node dtype —
    # integer node ids get an int64 `node`, not a hard-coded string
    empty_int = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    res_int = pagerank(ray.data.from_arrow(empty_int), "src", "dst", iters=2)
    sch = res_int.schema()
    assert sch.base_schema.field("node").type == pa.int64()


def test_triangles_matches_bruteforce(ray_session):
    import itertools

    import pyarrow as pa
    import ray.data

    from cartography_ray.ops.graph import triangles

    rng = np.random.default_rng(7)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in zip(
                rng.choice(nodes, 150), rng.choice(nodes, 150)
            )
            if a != b
        }
    )
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref = sorted(
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj.get(a, ()) and c in adj.get(a, ()) and c in adj.get(b, ())
    )
    ds = ray.data.from_arrow(
        pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )
    # both tiers of the size split: driver-local (default limit) and the
    # distributed wedge plan (forced with driver_limit=0) must equal the
    # brute-force reference exactly
    for forced_limit in (None, 0):
        out = (
            triangles(ds, driver_limit=forced_limit)
            .to_pandas()
            .sort_values(["node_a", "node_b", "node_c"])
            .reset_index(drop=True)
        )
        assert list(map(tuple, out.to_numpy())) == ref, f"limit={forced_limit}"
    assert len(ref) > 0  # non-vacuous


def test_triangles_empty_and_triangle_free(ray_session):
    import pyarrow as pa
    import ray.data

    from cartography_ray.ops.graph import triangles

    cols = ["node_a", "node_b", "node_c"]
    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    e = triangles(empty)
    assert e.count() == 0 and e.schema().names == cols
    path = ray.data.from_arrow(pa.table({"src": ["a", "b"], "dst": ["b", "c"]}))
    t = triangles(path)
    assert t.count() == 0 and t.schema().names == cols


def _kcore_ref(edges_df, k):
    """Reference peel loop (pure python sets)."""
    adj = {}
    for a, b in zip(edges_df["src"], edges_df["dst"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(s) for n, s in adj.items() if s}


@pytest.mark.parametrize("force_distributed", [False, True])
def test_kcore_matches_reference(ray_session, force_distributed):
    import ray.data

    from cartography_ray.ops.graph import kcore

    rng = np.random.default_rng(47)
    # random graph + a long path appendage (forces multi-round peeling
    # at k=2: the path erodes from its ends, one layer per round)
    n, m = 400, 1200
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    df = pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates()
    # a path appendage erodes one layer per round at k=2 — keep it short
    # on the distributed tier (each round = 1 agg + 2 semi joins)
    path_len = 8 if force_distributed else 30
    path_nodes = np.arange(n, n + path_len)
    df = pd.concat(
        [df, pd.DataFrame({"src": path_nodes[:-1], "dst": path_nodes[1:]})],
        ignore_index=True,
    ).astype("int64")

    for k in (2, 5) if force_distributed else (2, 3, 5):
        want = _kcore_ref(df, k)
        got = kcore(
            ray.data.from_pandas(df).repartition(4), k=k,
            driver_limit=0 if force_distributed else None,
            num_partitions=4,
        ).to_pandas()
        if len(got) == 0:
            # an all-empty to_pandas() loses the schema (Ray 2.49) —
            # compare emptiness only
            assert want == {}, f"k={k}: engine empty, reference {len(want)} nodes"
            continue
        assert dict(zip(got["node"], got["core_deg"])) == want


def test_kcore_empty_and_total_peel(ray_session):
    import ray.data

    from cartography_ray.ops.graph import kcore

    tri = pd.DataFrame({"src": [0, 0, 1], "dst": [1, 2, 2]}).astype("int64")
    ds = ray.data.from_pandas(tri)
    # k=3 peels the triangle away entirely — both tiers
    assert kcore(ds, k=3).count() == 0
    assert kcore(ds, k=3, driver_limit=0, num_partitions=2).count() == 0
    # k=2 keeps it whole
    got = kcore(ds, k=2).to_pandas()
    assert sorted(got["core_deg"]) == [2, 2, 2]


def _bfs_ref(df: pd.DataFrame, seeds, max_hops: int) -> dict:
    """Plain dict/set BFS reference."""
    adj: dict = {}
    for a, b in zip(df["src"], df["dst"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.add(m)
        if not nxt:
            break
        frontier = nxt
    return dist


@pytest.mark.parametrize("force_distributed", [False, True])
def test_bfs_hops_matches_reference(ray_session, force_distributed):
    import ray.data

    from cartography_ray.ops.graph import bfs_hops

    rng = np.random.default_rng(53)
    # sparse random graph + a path appendage so late hops stay non-empty
    n, m = 300, 500
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    df = pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates()
    path_nodes = np.arange(n, n + 10)
    df = pd.concat(
        [df, pd.DataFrame({"src": path_nodes[:-1], "dst": path_nodes[1:]})],
        ignore_index=True,
    ).astype("int64")

    seeds = [0, 1, int(path_nodes[0])]
    for max_hops in (0, 1, 4):
        want = _bfs_ref(df, seeds, max_hops)
        got = bfs_hops(
            ray.data.from_pandas(df).repartition(4),
            ray.data.from_pandas(pd.DataFrame({"node": seeds})),
            max_hops=max_hops,
            driver_limit=0 if force_distributed else None,
            num_partitions=4,
        ).to_pandas()
        assert dict(zip(got["node"], got["hops"])) == want, f"hops={max_hops}"


def test_bfs_hops_edge_cases(ray_session):
    import ray.data

    from cartography_ray.ops.graph import bfs_hops

    tri = pd.DataFrame({"src": [0, 0, 1], "dst": [1, 2, 2]}).astype("int64")
    ds = ray.data.from_pandas(tri)
    # a seed absent from the edge set still reports distance 0
    seeds = ray.data.from_pandas(pd.DataFrame({"node": [0, 99]}))
    got = bfs_hops(ds, seeds, max_hops=2).to_pandas()
    assert dict(zip(got["node"], got["hops"])) == {0: 0, 99: 0, 1: 1, 2: 1}
    # duplicate seed rows dedupe; empty edges → seeds only (both tiers)
    empty = ray.data.from_pandas(
        pd.DataFrame({"src": pd.Series([], dtype="int64"),
                      "dst": pd.Series([], dtype="int64")})
    )
    dup_seeds = ray.data.from_pandas(pd.DataFrame({"node": [7, 7]}))
    got = bfs_hops(empty, dup_seeds, max_hops=3).to_pandas()
    assert dict(zip(got["node"], got["hops"])) == {7: 0}
