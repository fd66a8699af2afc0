"""Iterative graph analytics over edge Datasets: weighted PageRank.

Third iterative-algorithm family in the engine (next to union-find in
stages/canonicalize.py and the IVF k-means in functions/ann.py), and the
same two-tier strategy split connected_components uses:

- ``broadcast`` (default under ``broadcast_limit`` nodes): the node
  vector lives on the driver; edges are pre-indexed ONCE into an
  (src_idx, dst_idx, w_norm) integer Dataset, and each power iteration
  is one streaming pass emitting per-batch (dst_idx, partial_sum) rows
  folded into the rank vector — per-iteration driver state is O(nodes),
  never O(edges).
- ``join`` (the 100-TB path): ranks stay a Dataset; each iteration is
  hash_join(edges, ranks on src) → per-batch contribution partials →
  partial_groupby_agg(dst) → left join back onto the node table with the
  teleport/dangling correction. Nothing node- or edge-sized ever lands
  on the driver; cost is ~3 shuffles × iterations, which is what exact
  distributed PageRank costs.

Dangling nodes (no out-edges) redistribute their mass uniformly each
iteration, so ranks sum to 1 in both strategies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cartography_ray.ops.agg import _to_clean_arrow

BROADCAST_NODE_LIMIT = 2_000_000

# below this edge count the whole graph fits trivially in driver memory
# and the per-iteration Ray rounds (20 by default) dominate: measured
# ~18 s of round orchestration for an 83k-edge graph whose driver-local
# power iteration takes ~50 ms. Same two-tier split as
# canonicalize.DRIVER_CC_LIMIT / triangles.DRIVER_TRI_LIMIT. Only the
# "auto" strategy takes it — explicit broadcast/join always distribute.
DRIVER_PR_LIMIT = 200_000


def _as_node_col(ds, col: str):
    """select+rename via an explicit Arrow map — Dataset.rename_columns
    fuses wrongly with downstream pandas-format UDFs in Ray 2.49 (the
    fused chain hands the rename a pandas DataFrame)."""

    def fn(t: pa.Table) -> pa.Table:
        c = t.column(col)
        return pa.table({"node": c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c})

    return ds.map_batches(fn, batch_format="pyarrow")


def _edge_norm_weights(edges, src: str, dst: str, weight: str | None, num_partitions):
    """(src, dst, w) with w normalized by the src's total out-weight."""
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join

    aggs = {"__outw": ((weight or src), "sum" if weight else "count")}
    outw = partial_groupby_agg(edges, [src], aggs, num_partitions=num_partitions)
    joined = hash_join(
        edges, outw, left_on=src, right_prefix="__r_", num_partitions=num_partitions
    )

    def norm(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = (
            pc.cast(t.column(weight), pa.float64())
            if weight
            else pa.array(np.ones(t.num_rows))
        )
        return pa.table(
            {
                src: t.column(src),
                dst: t.column(dst),
                "__w": pc.divide(w, pc.cast(t.column("__outw"), pa.float64())),
            }
        )

    return joined.map_batches(norm, batch_format="pyarrow"), outw


def pagerank(
    edges,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iters: int = 20,
    strategy: str = "auto",
    broadcast_limit: int = BROADCAST_NODE_LIMIT,
    num_partitions: int | None = None,
    driver_limit: int | None = None,
):
    """Weighted PageRank over a directed edge Dataset. Returns a Dataset
    ``(node, rank)`` with ranks summing to 1.

    ``strategy``: ``broadcast`` | ``join`` | ``auto`` (driver-local
    below ``driver_limit`` edges — default ``DRIVER_PR_LIMIT``, the
    identical iteration math with zero Ray rounds — then broadcast
    while the node count fits ``broadcast_limit``, else join). All
    three tiers are numpy-reference-tested to ≤1e-12.
    """
    from cartography_ray.ops.agg import partial_groupby_agg

    # materialize once up front: the edge set is replayed by out-weight
    # agg, node-set agg and the norm join anyway, and a fully-empty
    # groupby input crashes Ray's hash-shuffle finalize (same hazard
    # ops.joins guards) — early-out instead
    edges = edges.materialize()

    def _empty_result():
        # derive the node dtype from the edge schema so the empty path
        # returns the same schema as the nonempty one (ADVICE r03: callers
        # with integer node ids used to get pa.string() here)
        import ray.data

        sch = edges.schema()
        node_t = (
            sch.base_schema.field(src).type
            if sch is not None and src in sch.names
            else pa.string()
        )
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], node_t), "rank": pa.array([], pa.float64())})
        )

    n_edges = edges.count()
    if n_edges == 0:
        return _empty_result()
    limit = DRIVER_PR_LIMIT if driver_limit is None else driver_limit
    if strategy == "auto" and n_edges <= limit:
        return _pagerank_local(edges, src, dst, weight, damping, iters)
    norm_edges, outw = _edge_norm_weights(edges, src, dst, weight, num_partitions)
    # node table = distinct src ∪ dst
    srcs = _as_node_col(outw, src)
    dsts = partial_groupby_agg(
        _as_node_col(edges, dst),
        ["node"], {"__c": (None, "count")},
        num_partitions=num_partitions,
    ).select_columns(["node"])
    from cartography_ray.runtime import drop_empty_blocks

    nodes = partial_groupby_agg(
        srcs.union(dsts), ["node"], {"__c": (None, "count")},
        num_partitions=num_partitions,
    ).select_columns(["node"])
    n_nodes = nodes.count()
    if n_nodes == 0:
        return _empty_result()
    if strategy == "auto":
        strategy = "broadcast" if n_nodes <= broadcast_limit else "join"
    if strategy == "broadcast":
        return _pagerank_broadcast(norm_edges, nodes, outw, src, dst, damping, iters, n_nodes)
    return _pagerank_join(
        norm_edges, nodes, outw, src, dst, damping, iters, n_nodes, num_partitions
    )


def _pagerank_local(edges, src, dst, weight, damping, iters):
    """Driver tier: the exact per-iteration formula of the distributed
    strategies (out-weight-normalized contributions + dangling mass
    redistributed uniformly), run as a single numpy loop. Bounded by
    ``DRIVER_PR_LIMIT`` edges at the ``pagerank`` gate."""
    import ray.data

    sch = edges.schema()
    try:
        node_t = sch.base_schema.field(src).type
    except AttributeError:  # pandas-backed blocks: let Arrow infer below
        node_t = None
    pdf = edges.to_pandas()
    s = pdf[src].to_numpy()
    d = pdf[dst].to_numpy()
    w = (
        pdf[weight].to_numpy(dtype="float64")
        if weight
        else np.ones(len(pdf), dtype="float64")
    )
    node_ids = np.unique(np.concatenate([s, d]))
    idx = pd.Series(np.arange(len(node_ids)), index=node_ids)
    si = idx.reindex(s).to_numpy(dtype="int64")
    di = idx.reindex(d).to_numpy(dtype="int64")
    n = len(node_ids)
    outw = np.zeros(n)
    np.add.at(outw, si, w)
    has_out = outw > 0
    wn = w / outw[si]
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        acc = np.zeros(n)
        np.add.at(acc, di, rank[si] * wn)
        dangling = rank[~has_out].sum()
        rank = (1.0 - damping) / n + damping * (acc + dangling / n)
    node_arr = pa.array(node_ids, node_t) if node_t is not None else pa.array(node_ids)
    return ray.data.from_arrow(
        pa.table({"node": node_arr, "rank": pa.array(rank, pa.float64())})
    )


def _pagerank_broadcast(norm_edges, nodes, outw, src, dst, damping, iters, n_nodes):
    import ray
    import ray.data

    node_pdf = nodes.to_pandas()  # bounded by broadcast_limit (contract)
    node_ids = node_pdf["node"].to_numpy()
    order = np.argsort(node_ids, kind="stable")
    node_ids = node_ids[order]
    idx_map = pd.Series(np.arange(len(node_ids)), index=node_ids)
    has_out = np.zeros(len(node_ids), dtype=bool)
    has_out[idx_map.reindex(outw.select_columns([src]).to_pandas()[src]).dropna().astype(int)] = True
    map_ref = ray.put(idx_map)

    # index the edges ONCE; iterations then stream ints only
    def to_idx(batch: pd.DataFrame) -> pa.Table:
        m = ray.get(map_ref)
        out = pd.DataFrame(
            {
                "si": m.reindex(batch[src]).to_numpy(dtype="int64"),
                "di": m.reindex(batch[dst]).to_numpy(dtype="int64"),
                "w": batch["__w"].to_numpy(dtype="float64"),
            }
        )
        return _to_clean_arrow(out)

    indexed = norm_edges.map_batches(to_idx, batch_format="pandas").materialize()

    n = len(node_ids)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        r_ref = ray.put(rank)

        def contrib(batch: pd.DataFrame) -> pa.Table:
            r = ray.get(r_ref)
            c = r[batch["si"].to_numpy()] * batch["w"].to_numpy()
            di = batch["di"].to_numpy()
            uniq, inv = np.unique(di, return_inverse=True)
            sums = np.zeros(len(uniq))
            np.add.at(sums, inv, c)
            return _to_clean_arrow(pd.DataFrame({"di": uniq, "c": sums}))

        acc = np.zeros(n)
        for b in indexed.map_batches(contrib, batch_format="pandas").iter_batches(
            batch_format="pandas", batch_size=None
        ):
            if len(b):
                np.add.at(acc, b["di"].to_numpy(), b["c"].to_numpy())
        dangling = rank[~has_out].sum()
        rank = (1.0 - damping) / n + damping * (acc + dangling / n)
    return ray.data.from_arrow(
        pa.table({"node": pa.array(node_ids), "rank": pa.array(rank, pa.float64())})
    )


def _pagerank_join(
    norm_edges, nodes, outw, src, dst, damping, iters, n_nodes, num_partitions
):
    """Everything stays a Dataset; the only driver values are scalars
    (node count, per-iteration dangling mass)."""
    import pyarrow.compute as pc

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    norm_edges = norm_edges.materialize()  # reused every iteration

    def init_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array(np.full(t.num_rows, 1.0 / n_nodes)),
            }
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()
    src_set = _as_node_col(outw, src)

    for _ in range(iters):
        # dangling mass: ranks of nodes with no out-edges (anti semi-join)
        no_out = hash_join(
            ranks, src_set, left_on="node", how="anti", num_partitions=num_partitions
        )
        dangling = 0.0
        for b in no_out.iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                dangling += float(pc.sum(b.column("rank")).as_py() or 0.0)

        joined = hash_join(
            norm_edges, ranks, left_on=src, right_on="node",
            right_prefix="__r_", num_partitions=num_partitions,
        )

        def contrib(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column(dst),
                    "c": pc.multiply(t.column("rank"), t.column("__w")),
                }
            )

        sums = partial_groupby_agg(
            joined.map_batches(contrib, batch_format="pyarrow"),
            ["node"], {"c": ("c", "sum")},
            num_partitions=num_partitions,
        )
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        merged = hash_join(
            nodes, sums, left_on="node", how="left", num_partitions=num_partitions
        )

        def new_rank(t: pa.Table) -> pa.Table:
            c = pc.coalesce(t.column("c"), pa.scalar(0.0, pa.float64()))
            return pa.table(
                {
                    "node": t.column("node"),
                    "rank": pc.add(
                        pa.scalar(base, pa.float64()),
                        pc.multiply(pa.scalar(damping, pa.float64()), c),
                    ),
                }
            )

        ranks = drop_empty_blocks(
            merged.map_batches(new_rank, batch_format="pyarrow")
        ).materialize()
    return ranks


# below this edge count the whole graph fits trivially in driver memory
# and the 5 fixed-cost exchanges (degree agg, 2 degree joins, wedge self
# join, closure semi join) dominate any distributed strategy — same
# two-tier split as canonicalize.DRIVER_CC_LIMIT (measured: ~11 s of
# shuffle orchestration for an 83k-edge graph whose driver-local
# enumeration takes well under a second)
DRIVER_TRI_LIMIT = 200_000


def triangles(edges, src: str = "src", dst: str = "dst",
              num_partitions: int | None = None,
              driver_limit: int | None = None):
    """Distributed triangle enumeration over an UNDIRECTED edge Dataset.

    Input contract: one row per undirected edge with ``src < dst`` (id
    order), no duplicates, no self-loops — the co-mention pair shape.
    Returns ``(node_a, node_b, node_c)`` with ``node_a < node_b <
    node_c``, exactly one row per triangle.

    Degree-ordered wedge plan (the classic fix for the "curse of the
    last reducer": a hub of degree d must NOT enumerate d²/2 wedges):
    orient every edge from its lower-``(degree, id)`` endpoint to the
    higher, enumerate wedges only at each edge's low end via an
    oriented⋈oriented self join, and close wedges with a semi join
    against the edge set. Any graph's oriented out-degree is O(√m), so
    the per-reducer wedge cost is bounded by √m per edge regardless of
    hub size. Cost: 2 degree joins + 1 self join + 1 semi join, all
    reduce-side ``hash_join`` — nothing node- or edge-sized on the
    driver.

    Below ``driver_limit`` edges (default ``DRIVER_TRI_LIMIT``, from the
    materialized count) the SAME degree-ordered kernels run driver-local
    in pandas/numpy instead — per-exchange fixed cost dominates at that
    size (the connected_components two-tier precedent). Both tiers are
    equality-tested; ``driver_limit=0`` forces the distributed plan.
    """
    import pyarrow.compute as pc  # noqa: F401
    import ray.data

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    edges = edges.materialize()  # replayed by degree agg, orient join, closure
    sch = edges.schema()
    node_t = (
        sch.base_schema.field(src).type
        if sch is not None and src in sch.names
        else pa.string()
    )
    out_schema = pa.schema(
        [("node_a", node_t), ("node_b", node_t), ("node_c", node_t)]
    )

    def _empty():
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )

    n_edges = edges.count()
    if n_edges == 0:
        return _empty()
    edges = edges.select_columns([src, dst])
    edge_schema = pa.schema([(src, node_t), (dst, node_t)])

    limit = DRIVER_TRI_LIMIT if driver_limit is None else driver_limit
    if n_edges <= limit:
        import pandas as pd

        pdf = edges.to_pandas()
        s = pdf[src].to_numpy()
        d = pdf[dst].to_numpy()
        deg = pd.concat([pdf[src], pdf[dst]], ignore_index=True).value_counts()
        sd = pdf[src].map(deg).to_numpy()
        dd = pdf[dst].map(deg).to_numpy()
        # orient from the lower-(deg, id) endpoint — identical tie-break
        # to the distributed orient kernel
        src_apex = (sd < dd) | ((sd == dd) & (s < d))
        ori = pd.DataFrame(
            {
                "u": np.where(src_apex, s, d),
                "v": np.where(src_apex, d, s),
                "vd": np.where(src_apex, dd, sd),
            }
        )
        w = ori.merge(ori, on="u", suffixes=("", "_r"))
        v, rv = w["v"].to_numpy(), w["v_r"].to_numpy()
        vd, rvd = w["vd"].to_numpy(), w["vd_r"].to_numpy()
        # each unordered wedge once, legs ordered by the same (deg, id)
        # rank (drops self-pairs) — identical to the distributed wedge
        keep = (vd < rvd) | ((vd == rvd) & (v < rv))
        u, v, rv = w["u"].to_numpy()[keep], v[keep], rv[keep]
        lo = v < rv
        cand = pd.DataFrame(
            {
                "u": u,
                "n2": v,
                "n3": rv,
                "__ca": np.where(lo, v, rv),
                "__cb": np.where(lo, rv, v),
            }
        )
        # closure: edges are unique (src<dst, no dups by contract) so an
        # inner merge IS the semi join
        closed = cand.merge(
            pdf.rename(columns={src: "__ca", dst: "__cb"}), on=["__ca", "__cb"]
        )
        tri = np.stack(
            [closed["u"].to_numpy(), closed["n2"].to_numpy(), closed["n3"].to_numpy()]
        )
        tri.sort(axis=0)
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(tri[0], node_t), pa.array(tri[1], node_t), pa.array(tri[2], node_t)],
                schema=out_schema,
            )
        )

    def both_ends(t: pa.Table) -> pa.Table:
        s = t.column(src).combine_chunks()
        d = t.column(dst).combine_chunks()
        return pa.table({"node": pa.concat_arrays([s, d])})

    deg = partial_groupby_agg(
        edges.map_batches(both_ends, batch_format="pyarrow"),
        ["node"], {"deg": (None, "count")}, num_partitions=num_partitions,
    )
    deg_schema = pa.schema([("node", node_t), ("deg", pa.int64())])

    e1 = hash_join(
        edges, deg, left_on=src, right_on="node",
        left_schema=edge_schema, right_schema=deg_schema,
        num_partitions=num_partitions,
    )
    e1_schema = pa.schema([(src, node_t), (dst, node_t), ("deg", pa.int64())])
    e2 = hash_join(
        e1, deg, left_on=dst, right_on="node", right_prefix="d_",
        left_schema=e1_schema, right_schema=deg_schema,
        num_partitions=num_partitions,
    )

    def orient(t: pa.Table) -> pa.Table:
        s = t.column(src).to_numpy(zero_copy_only=False)
        d = t.column(dst).to_numpy(zero_copy_only=False)
        sd = t.column("deg").to_numpy(zero_copy_only=False)
        dd = t.column("d_deg").to_numpy(zero_copy_only=False)
        # apex = lower (degree, id); src < dst by contract breaks deg ties
        src_apex = (sd < dd) | ((sd == dd) & (s < d))
        return pa.table(
            {
                "u": pa.array(np.where(src_apex, s, d), node_t),
                "v": pa.array(np.where(src_apex, d, s), node_t),
                "vdeg": pa.array(np.where(src_apex, dd, sd).astype("int64"), pa.int64()),
            }
        )

    oriented = drop_empty_blocks(e2.map_batches(orient, batch_format="pyarrow"))
    o_schema = pa.schema([("u", node_t), ("v", node_t), ("vdeg", pa.int64())])
    wedged = hash_join(
        oriented, oriented, left_on="u", right_prefix="r_",
        left_schema=o_schema, right_schema=o_schema,
        num_partitions=num_partitions,
    )

    def wedge(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        rv = t.column("r_v").to_numpy(zero_copy_only=False)
        vd = t.column("vdeg").to_numpy(zero_copy_only=False)
        rvd = t.column("r_vdeg").to_numpy(zero_copy_only=False)
        # each unordered wedge once: legs ordered by the same (deg, id)
        # rank the orientation uses
        keep = (vd < rvd) | ((vd == rvd) & (v < rv))
        u = t.column("u").to_numpy(zero_copy_only=False)[keep]
        v, rv = v[keep], rv[keep]
        lo = v < rv  # closing edge is keyed (min_id, max_id) like the input
        return pa.table(
            {
                "u": pa.array(u, node_t),
                "__n2": pa.array(v, node_t),
                "__n3": pa.array(rv, node_t),
                "__ca": pa.array(np.where(lo, v, rv), node_t),
                "__cb": pa.array(np.where(lo, rv, v), node_t),
            }
        )

    cands = drop_empty_blocks(wedged.map_batches(wedge, batch_format="pyarrow"))
    cand_schema = pa.schema(
        [("u", node_t), ("__n2", node_t), ("__n3", node_t),
         ("__ca", node_t), ("__cb", node_t)]
    )
    closed = hash_join(
        cands, edges, left_on=["__ca", "__cb"], right_on=[src, dst], how="semi",
        left_schema=cand_schema, right_schema=edge_schema,
        num_partitions=num_partitions,
    )

    def proj(t: pa.Table) -> pa.Table:
        tri = np.stack(
            [
                t.column("u").to_numpy(zero_copy_only=False),
                t.column("__n2").to_numpy(zero_copy_only=False),
                t.column("__n3").to_numpy(zero_copy_only=False),
            ]
        )
        tri.sort(axis=0)
        return pa.table(
            {
                "node_a": pa.array(tri[0], node_t),
                "node_b": pa.array(tri[1], node_t),
                "node_c": pa.array(tri[2], node_t),
            }
        )

    out = drop_empty_blocks(closed.map_batches(proj, batch_format="pyarrow"))
    out = out.materialize()  # triangle-sized; typed-empty guard below
    if out.count() == 0:
        return _empty()
    return out


DRIVER_KCORE_LIMIT = 200_000


def _node_dtype(sch, col: str) -> pa.DataType:
    """Node dtype from a Dataset schema — handles Arrow-block schemas
    (``base_schema`` is a pyarrow.Schema) AND pandas-block ones (numpy
    dtypes; ``object`` means strings here)."""
    if sch is None or col not in sch.names:
        return pa.string()
    base = getattr(sch, "base_schema", None)
    if base is not None and hasattr(base, "field"):
        return base.field(col).type
    try:
        t = sch.types[list(sch.names).index(col)]
        if isinstance(t, pa.DataType):
            return t
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        return pa.string()


def kcore(
    edges,
    k: int,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int | None = None,
    driver_limit: int | None = None,
    max_rounds: int = 10_000,
):
    """k-core decomposition for a fixed ``k``: the (unique) maximal
    induced subgraph in which every node has degree ≥ k. Returns
    ``(node, core_deg)`` — the k-core's nodes with their in-core degree.

    Input contract: one row per UNDIRECTED edge with ``src < dst``,
    unique, no self-loops (the co-mention pair shape, same as
    ``triangles``).

    Iterative peeling to FIXPOINT — each round removes every node whose
    degree in the surviving subgraph is < k; the result is unique
    regardless of removal order, so the unrolled-SQL oracle and both
    tiers agree exactly. Fourth iterative family next to union-find,
    IVF k-means and PageRank.

    Tiers (the ``DRIVER_PR_LIMIT`` / ``DRIVER_TRI_LIMIT`` precedent):
    below ``driver_limit`` edges the peel loop runs driver-local
    (numpy ``bincount`` per round — the whole loop is milliseconds at
    that size); above it, each round is one degree aggregation
    (per-batch endpoint combiner → ``partial_groupby_agg``) plus two
    semi ``hash_join``s filtering the edge set to survivors — nothing
    node- or edge-sized on the driver, edge volume only shrinks.
    Parallel-peeling round count is worst-case O(peel depth) (a k=2
    path graph peels from the ends); ``max_rounds`` is a runaway guard
    that RAISES rather than returning a truncated (superset) core.
    """
    import ray.data

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    if k < 1:
        raise ValueError("kcore: k must be >= 1")

    edges = edges.materialize()
    node_t = _node_dtype(edges.schema(), src)
    out_schema = pa.schema([("node", node_t), ("core_deg", pa.int64())])

    def _empty():
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type) for f in out_schema})
        )

    n_edges = edges.count()
    if n_edges == 0:
        return _empty()
    edges = edges.select_columns([src, dst])
    edge_schema = pa.schema([(src, node_t), (dst, node_t)])

    limit = DRIVER_KCORE_LIMIT if driver_limit is None else driver_limit
    if n_edges <= limit:
        pdf = edges.to_pandas()
        codes, uniques = pd.factorize(
            pd.concat([pdf[src], pdf[dst]], ignore_index=True)
        )
        n = len(uniques)
        sc = codes[: len(pdf)]
        dc = codes[len(pdf) :]
        alive = np.ones(len(pdf), dtype=bool)
        deg = np.bincount(sc, minlength=n) + np.bincount(dc, minlength=n)
        while True:
            ok = deg >= k
            nxt = alive & ok[sc] & ok[dc]
            if (nxt == alive).all():
                break
            alive = nxt
            deg = np.bincount(sc[alive], minlength=n) + np.bincount(
                dc[alive], minlength=n
            )
        keep = (deg >= k) & (deg > 0)
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [
                    pa.array(np.asarray(uniques)[keep], node_t),
                    pa.array(deg[keep].astype("int64"), pa.int64()),
                ],
                schema=out_schema,
            )
        )

    def both_ends(t: pa.Table) -> pa.Table:
        s = t.column(src).combine_chunks()
        d = t.column(dst).combine_chunks()
        return pa.table({"node": pa.concat_arrays([s, d])})

    deg_schema = pa.schema([("node", node_t), ("deg", pa.int64())])
    surv_schema = pa.schema([("node", node_t)])
    cur, cur_count = edges, n_edges
    for _ in range(max_rounds):
        deg = partial_groupby_agg(
            cur.map_batches(both_ends, batch_format="pyarrow"),
            ["node"],
            {"deg": (None, "count")},
            num_partitions=num_partitions,
        )

        def ge_k(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.greater_equal(t.column("deg"), pa.scalar(k, pa.int64()))
            return t.filter(m)

        survivors = drop_empty_blocks(
            deg.map_batches(ge_k, batch_format="pyarrow")
        ).materialize()  # consumed by two semi joins
        if survivors.count() == 0:
            return _empty()
        surv_nodes = survivors.select_columns(["node"])
        nxt = hash_join(
            cur, surv_nodes, left_on=src, right_on="node", how="semi",
            left_schema=edge_schema, right_schema=surv_schema,
            num_partitions=num_partitions,
        )
        nxt = hash_join(
            nxt, surv_nodes, left_on=dst, right_on="node", how="semi",
            left_schema=edge_schema, right_schema=surv_schema,
            num_partitions=num_partitions,
        ).materialize()
        nxt_count = nxt.count()
        if nxt_count == cur_count:
            # fixpoint: every endpoint degree is ≥ k; survivors IS the core
            def rename(t: pa.Table) -> pa.Table:
                return pa.table(
                    {"node": t.column("node"), "core_deg": t.column("deg")}
                )

            return survivors.map_batches(rename, batch_format="pyarrow")
        if nxt_count == 0:
            return _empty()
        cur, cur_count = nxt, nxt_count
    raise RuntimeError(
        f"kcore: no fixpoint within max_rounds={max_rounds} "
        f"(pathological peel depth; raise max_rounds)"
    )


DRIVER_BFS_LIMIT = 200_000


def bfs_hops(
    edges,
    seeds,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
    num_partitions: int | None = None,
    driver_limit: int | None = None,
):
    """Multi-source BFS: minimum hop distance from any seed, cut off at
    ``max_hops``. Returns ``(node, hops)`` for every node reachable
    within the cutoff (seeds at 0, including seeds absent from the edge
    set — distance 0 from themselves). Min-distance is unique, so the
    unrolled-CTE DuckDB twin (``sql_kg_reach``) matches exactly — the
    kcore/pagerank fixed-iteration oracle idiom. Fifth iterative family
    (union-find / IVF k-means / PageRank / k-core peel / frontier walk).

    Input contract: one row per UNDIRECTED edge (``src < dst``, unique,
    no self-loops — the co-mention shape); symmetrized internally.
    ``seeds``: a Dataset with one ``node`` column (deduped here).

    Tiers (the ``DRIVER_PR/TRI/KCORE_LIMIT`` precedent): below
    ``driver_limit`` edges the walk is a few numpy scatter rounds
    driver-local (round orchestration would dominate). Above it, each
    hop is one semi ``hash_join`` (edges leaving the frontier), a
    node-dedup combiner, and one anti ``hash_join`` against the visited
    set — frontier and visited stay Datasets, nothing node- or
    edge-sized lands on the driver. Rounds are bounded by ``max_hops``
    (a fixed small constant — no fixpoint scan needed), and the
    frontier semi-join touches only edges adjacent to it, so late
    sparse hops cost less than early dense ones.
    """
    import ray.data

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    if max_hops < 0:
        raise ValueError("bfs_hops: max_hops must be >= 0")

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges:
        edges = edges.select_columns([src, dst])
        node_t = _node_dtype(edges.schema(), src)
    else:
        # an all-empty dataset loses its schema (Ray 2.49) — don't
        # project it; type the output from the seeds instead
        node_t = _node_dtype(seeds.schema(), "node")
    out_schema = pa.schema([("node", node_t), ("hops", pa.int64())])

    limit = DRIVER_BFS_LIMIT if driver_limit is None else driver_limit
    if n_edges <= limit:
        # driver tier: seeds are node-scale, edges bound node count
        pdf = (
            edges.to_pandas()
            if n_edges
            else pd.DataFrame({src: [], dst: []})
        )
        seed_vals = pd.unique(seeds.to_pandas()["node"].dropna())
        codes, uniques = pd.factorize(
            pd.concat([pdf[src], pdf[dst]], ignore_index=True)
        )
        n = len(uniques)
        sc = codes[: len(pdf)]
        dc = codes[len(pdf):]
        idx = pd.Index(uniques).get_indexer(seed_vals)
        in_graph = idx >= 0
        INF = np.iinfo(np.int64).max
        dist = np.full(n, INF, dtype=np.int64)
        frontier = np.zeros(n, dtype=bool)
        frontier[idx[in_graph]] = True
        dist[idx[in_graph]] = 0
        for h in range(1, max_hops + 1):
            if not frontier.any():
                break
            cand = np.zeros(n, dtype=bool)
            cand[dc[frontier[sc]]] = True
            cand[sc[frontier[dc]]] = True
            new = cand & (dist == INF)
            if not new.any():
                break
            dist[new] = h
            frontier = new
        reached = dist != INF
        nodes = list(np.asarray(uniques)[reached])
        hops = list(dist[reached])
        # seeds that never appear in an edge still report distance 0
        for v in seed_vals[~in_graph]:
            nodes.append(v)
            hops.append(0)
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(nodes, node_t), pa.array(hops, pa.int64())],
                schema=out_schema,
            )
        )

    sym_schema = pa.schema([("a", node_t), ("b", node_t)])
    node_schema = pa.schema([("node", node_t)])

    def sym(t: pa.Table) -> pa.Table:
        s = t.column(src).combine_chunks().cast(node_t)
        d = t.column(dst).combine_chunks().cast(node_t)
        return pa.table(
            {"a": pa.concat_arrays([s, d]), "b": pa.concat_arrays([d, s])},
            schema=sym_schema,
        )

    e = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def _dedup_nodes(ds):
        out = partial_groupby_agg(
            ds,
            ["node"],
            {"__c": (None, "count")},
            num_partitions=num_partitions,
            empty_schema=pa.schema([("node", node_t), ("__c", pa.int64())]),
        )
        return out.select_columns(["node"])

    def _with_hops(h: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    "hops": pa.array([h] * len(t), pa.int64()),
                },
                schema=out_schema,
            )

        return fn

    frontier = _dedup_nodes(
        drop_empty_blocks(seeds.select_columns(["node"]))
    ).materialize()
    visited = frontier.map_batches(
        _with_hops(0), batch_format="pyarrow"
    ).materialize()
    for h in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        touched = hash_join(
            e, frontier, left_on="a", right_on="node", how="semi",
            left_schema=sym_schema, right_schema=node_schema,
            num_partitions=num_partitions,
        )

        def nbr(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("b")}, schema=node_schema)

        cand = _dedup_nodes(
            drop_empty_blocks(touched.map_batches(nbr, batch_format="pyarrow"))
        )
        new = hash_join(
            cand, visited.select_columns(["node"]),
            left_on="node", right_on="node", how="anti",
            left_schema=node_schema, right_schema=node_schema,
            num_partitions=num_partitions,
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(
            new.map_batches(_with_hops(h), batch_format="pyarrow")
        ).materialize()
        frontier = new
    return visited
