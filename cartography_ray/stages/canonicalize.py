"""Distributed union-find canonicalization (groupby min-label propagation).

The analogue of Cartography's MERGE-and-dedup + ontology merge-by-canonical-id
semantics (reference cartography/graph/querybuilder.py:1266-1279 upsert;
cartography/intel/ontology/utils.py:60-81 merge by canonical email key),
generalized to transitive alias chains: mentions produce candidate entity
keys, alias declarations produce (a, b) edges between keys, and connected
components of the alias graph define canonical entities. The component
root (lexicographic min member) is the canonical entity id.

Realized Ray-Data-first as iterated min-label propagation:

    labels₀(x)   = min(x, min neighbor y)            -- fused first round
    labelsₜ₊₁(x) = min(labelsₜ(x), min_{y∈N(x)} labelsₜ(y))

each round = one hash join (edges ⋈ labels on the neighbor endpoint) +
one groupby-min — both all-to-all exchanges on the node key. Skew /
volume control, in order of leverage:

1. **per-batch combiner**: duplicate alias declarations (hot entities are
   re-declared in thousands of turns) are deduped inside ``map_batches``
   BEFORE any shuffle, so a hot key contributes one edge per batch, not
   one per occurrence;
2. **global edge dedup** via groupby on (a, b) — after the combiner this
   is small;
3. rounds needed = O(log(component diameter)); alias graphs are
   star-/chain-shaped (diameter ≤ 4 in our corpus), and convergence is
   detected with a driver-side label-hashsum aggregate (one small
   ``Sum`` per round), bounded by ``max_rounds``.

Scale note: every structure here is a Dataset — nothing materializes the
corpus; only the per-round hashsum (a scalar) reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _dedup_batch_ab(batch: pa.Table) -> pa.Table:
    """Local combiner: distinct (a,b) within a batch (pre-shuffle dedup)."""
    if batch.num_rows == 0:
        return batch
    key = pc.binary_join_element_wise(batch.column("a"), batch.column("b"), "\x1f")
    first_idx = pa.table({"k": key, "i": pa.array(np.arange(len(key)))})
    # group-take-first via pandas (small per-batch), keeps arbitrary-but-
    # deterministic representative (values identical for duplicate keys)
    pdf = first_idx.to_pandas().drop_duplicates("k")
    return batch.take(pa.array(pdf["i"].to_numpy()))


def distinct_edges(edges_ds):
    """Distinct (a, b) pairs: per-batch combiner then a groupby reduce."""
    import ray.data  # noqa: F401

    combined = edges_ds.map_batches(_dedup_batch_ab, batch_format="pyarrow")

    def head1(group: "pa.Table") -> pa.Table:
        return group.slice(0, 1)

    return combined.groupby(["a", "b"]).map_groups(head1, batch_format="pyarrow")


def _hashsum(ds) -> int:
    """Order-independent fingerprint of a (node, label) dataset.

    The labels table is small by construction (bounded by distinct aliased
    keys), and it is already materialized each round — so we hash its
    blocks driver-side instead of paying another distributed pass per
    round. Blocks are fetched zero-copy from the local object store.
    """
    import pandas as pd
    import ray

    total = 0
    for blk in ray.get(ds.to_arrow_refs()):
        if blk.num_columns == 0 or blk.num_rows == 0:
            continue
        joined = pc.binary_join_element_wise(blk.column("node"), blk.column("label"), "\x1f")
        hv = pd.util.hash_array(joined.to_numpy(zero_copy_only=False))
        total = (total + int(hv.sum() % (1 << 62))) % (1 << 62)
    return total


BROADCAST_LABEL_LIMIT = 2_000_000
# below this deduped-edge count the whole alias graph fits trivially in
# driver memory and per-round Ray task overhead dominates any distributed
# strategy (measured: 4.6 s of round orchestration for a 19k-edge graph
# whose driver-local propagation takes ~30 ms)
DRIVER_CC_LIMIT = 200_000

_MIN_REDUCE = None


def _min_reduce_task():
    """Lazy remote task: merge a chunk of (node,label) partial blocks by
    per-node min (the tree-reduce step of the broadcast CC strategy)."""
    global _MIN_REDUCE
    if _MIN_REDUCE is None:
        import ray

        @ray.remote(num_cpus=1)
        def min_reduce(*blocks) -> pa.Table:
            import pandas as pd

            frames = [b.to_pandas() for b in blocks if b.num_columns and b.num_rows]
            if not frames:
                return pa.table(
                    {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
                )
            merged = (
                pd.concat(frames, ignore_index=True)
                .groupby("node", sort=False)["label"]
                .min()
                .reset_index()
            )
            return pa.table(
                {
                    "node": pa.array(merged["node"], pa.string()),
                    "label": pa.array(merged["label"], pa.string()),
                }
            )

        _MIN_REDUCE = min_reduce
    return _MIN_REDUCE


def connected_components(
    edges_ds,
    num_partitions: int = 16,
    max_rounds: int = 25,
    strategy: str = "auto",
):
    """(a,b) alias-edge Dataset → (node, label) Dataset of component roots.

    Two propagation strategies per round:

    - ``broadcast`` (default when the label table is small): the current
      (node → label) map is broadcast via ``ray.put``; each edge batch
      emits (a, label(b)) messages with a LOCAL min-combiner, and one
      groupby-min merges them — ONE shuffle per round. The label table is
      bounded by the number of distinct *aliased* keys, orders of
      magnitude below corpus size, so this is the common case.
    - ``join`` (scale fallback): labels too big to broadcast — the
      propagation becomes a reduce-side hash join (ops/joins.py) against
      the label Dataset, then the same groupby-min. Three shuffles per
      round but nothing is ever driver-resident.

    Convergence: driver-side hashsum of the (small, materialized) label
    table per round, bounded by ``max_rounds``. Rounds needed =
    O(diameter of the alias graph).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Min

    from cartography_ray.runtime import drop_empty_blocks

    # Local (per-batch) dedup only: min-label propagation is idempotent to
    # duplicate edges, so the global distinct groupby would buy nothing but
    # an extra all-to-all. The combiner still collapses hot-entity repeats.
    edges = edges_ds.map_batches(_dedup_batch_ab, batch_format="pyarrow")

    if strategy in ("auto", "local"):
        # tiny alias graphs (the common case — distinct aliased keys ≪
        # corpus) propagate driver-locally: one distributed combiner pass,
        # then pure pandas rounds. Zero per-round task orchestration.
        mat = edges.materialize()
        if strategy == "local" or mat.count() <= DRIVER_CC_LIMIT:
            return _cc_driver_local(mat)
        edges = mat

    swapped = edges.map_batches(
        lambda t: pa.table({"a": t.column("b"), "b": t.column("a")}),
        batch_format="pyarrow",
    )
    # cache the symmetrized edge list — reused every round — and strip
    # empty blocks (they bypass map UDFs and break downstream shuffles)
    sym = drop_empty_blocks(edges.union(swapped))

    # strategy decision without materializing labels first: the label set
    # is bounded by sym's node count (≤ sym row count)
    n_sym = sym.count()
    use_broadcast = strategy == "broadcast" or (
        strategy == "auto" and n_sym <= 2 * BROADCAST_LABEL_LIMIT
    )

    if use_broadcast:
        # The (node → label) map lives on the driver between rounds (it is
        # broadcast-size by precondition). Per round: ONE distributed map
        # over the edge list emitting per-batch partial minima (the
        # combiner collapses hot nodes to one row per batch), then a tiny
        # driver-side final merge. Round 1 falls out of the same code with
        # an empty map (label(x) defaults to x). Convergence = map equality.
        import pandas as pd

        lmap: dict[str, str] = {}
        for _ in range(max_rounds):
            lmap_ref = ray.put(lmap)

            def messages(batch: pa.Table) -> pa.Table:
                # vectorized: map both endpoints through the label dict with
                # identity fallback, take the elementwise min, then a local
                # per-node min combiner — no Python row loop
                m = ray.get(lmap_ref)
                a = pd.Series(batch.column("a").to_numpy(zero_copy_only=False))
                b = pd.Series(batch.column("b").to_numpy(zero_copy_only=False))
                la = a.map(m).fillna(a)
                lb = b.map(m).fillna(b)
                cand = la.where(la < lb, lb)
                best = (
                    pd.DataFrame({"node": a, "label": cand})
                    .groupby("node", sort=False)["label"]
                    .min()
                )
                return pa.table(
                    {
                        "node": pa.array(best.index.to_numpy(), pa.string()),
                        "label": pa.array(best.to_numpy(), pa.string()),
                    }
                )

            refs = sym.map_batches(messages, batch_format="pyarrow").to_arrow_refs()
            # tree-reduce the partial minima in tasks so the driver only
            # merges ~#chunks pre-reduced tables, not every block
            reduce_task = _min_reduce_task()
            chunk = 8
            red_refs = [
                reduce_task.remote(*refs[i : i + chunk]) for i in range(0, len(refs), chunk)
            ]
            partial_blocks = [
                blk.to_pandas() for blk in ray.get(red_refs) if blk.num_rows
            ]
            if partial_blocks:
                merged = (
                    pd.concat(partial_blocks, ignore_index=True)
                    .groupby("node", sort=False)["label"]
                    .min()
                )
                new_map = merged.to_dict()
            else:
                new_map = {}
            if new_map == lmap:
                break
            lmap = new_map
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(list(lmap.keys()), pa.string()),
                    "label": pa.array(list(lmap.values()), pa.string()),
                }
            )
        )

    # ---- join strategy (labels too large to broadcast) ---------------------
    # fused round 1: candidates = neighbor labels ∪ self labels
    self_pairs = sym.map_batches(
        lambda t: pa.table({"node": t.column("a"), "label": t.column("a")}),
        batch_format="pyarrow",
    )
    nbr_pairs = sym.map_batches(
        lambda t: pa.table({"node": t.column("a"), "label": t.column("b")}),
        batch_format="pyarrow",
    )
    labels = drop_empty_blocks(
        self_pairs.union(nbr_pairs)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )
    prev_fp = _hashsum(labels)

    for _ in range(max_rounds):
        if True:
            from cartography_ray.ops.joins import hash_join

            prop = drop_empty_blocks(
                hash_join(
                    sym,
                    labels,
                    left_on="b",
                    right_on="node",
                    how="inner",
                    num_buckets=max(8, num_partitions),
                )
            ).map_batches(
                lambda t: pa.table(
                    {
                        "node": pc.cast(t.column("a"), pa.string()),
                        "label": pc.cast(t.column("label"), pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
            labels = drop_empty_blocks(
                labels.union(prop)
                .groupby("node")
                .aggregate(Min("label", alias_name="label"))
            )
        fp = _hashsum(labels)
        if fp == prev_fp:
            break
        prev_fp = fp
    return labels


def _cc_pandas_labels(tbl: pa.Table, max_rounds: int = 50):
    """(a, b) string edge table → node→min-label pandas Series. The
    vectorized min-label fixpoint shared by the driver-local strategy
    and callers that embed CC inside a fused single task (the
    cluster-summary local fold). O(diameter) rounds."""
    import pandas as pd

    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes = pd.unique(src)
    lab = pd.Series(nodes, index=nodes)  # identity labels
    for _ in range(max_rounds):
        ls = lab.reindex(src).to_numpy()
        ld = lab.reindex(dst).to_numpy()
        cand = np.where(ls < ld, ls, ld)
        best = pd.DataFrame({"n": src, "c": cand}).groupby("n", sort=False)["c"].min()
        new = lab.copy()
        upd = best.reindex(new.index)
        mask = upd.notna() & (upd < new)
        new[mask] = upd[mask]
        if new.equals(lab):
            break
        lab = new
    return lab


def _cc_driver_local(edges_mat, max_rounds: int = 50):
    """Driver-local min-label propagation over a (small, materialized,
    locally-deduped) edge Dataset. Same fixed point as the distributed
    strategies; vectorized pandas rounds, O(diameter) iterations."""
    import ray
    import ray.data

    blocks = [b for b in ray.get(edges_mat.to_arrow_refs()) if b.num_columns and b.num_rows]
    if not blocks:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.string())})
        )
    lab = _cc_pandas_labels(pa.concat_tables(blocks), max_rounds)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(lab.index.to_numpy(), pa.string()),
                "label": pa.array(lab.to_numpy(), pa.string()),
            }
        )
    )


def resolve_keys(
    ds,
    labels,
    key_col: str = "entity_key",
    out_col: str = "entity_id",
    strategy: str = "auto",
    broadcast_limit: int = BROADCAST_LABEL_LIMIT,
):
    """Map candidate keys to canonical roots (identity for unaliased keys).

    Two strategies (``strategy`` = auto | broadcast | join):

    - ``broadcast`` — the component map is usually the SMALL side
      (distinct aliased keys ≪ mentions): ``ray.put`` once, looked up per
      batch with a vectorized pandas map — no shuffle of the mention
      stream.
    - ``join`` — the scale fallback when the component map exceeds
      ``broadcast_limit`` rows: a distributed left-outer ``hash_join``
      against the label Dataset plus a coalesce-to-identity projection.
      Nothing is ever driver-resident.

    ``auto`` picks join when the label row count exceeds the limit.
    """
    import ray
    import ray.data

    is_ds = hasattr(labels, "to_arrow_refs")
    if strategy == "auto":
        n_labels = labels.count() if is_ds else labels.num_rows
        strategy = "join" if n_labels > broadcast_limit else "broadcast"

    if strategy == "join":
        from cartography_ray.ops.joins import hash_join
        from cartography_ray.runtime import drop_empty_blocks

        labels_ds = labels if is_ds else ray.data.from_arrow(labels)
        # rename to collision-proof temp names so the join never clashes
        # with the mention stream's own columns
        skinny = labels_ds.map_batches(
            lambda t: pa.table(
                {
                    "__cc_node": pc.cast(t.column("node"), pa.string()),
                    "__cc_root": pc.cast(t.column("label"), pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            ds, skinny, left_on=key_col, right_on="__cc_node", how="left"
        )

        def coalesce(batch: pa.Table) -> pa.Table:
            root = batch.column("__cc_root")
            key = pc.cast(batch.column(key_col), pa.string())
            resolved = pc.coalesce(root, key)  # identity for unaliased keys
            return batch.drop_columns(["__cc_root"]).append_column(
                out_col, pc.cast(resolved, pa.string())
            )

        return drop_empty_blocks(joined).map_batches(coalesce, batch_format="pyarrow")

    if is_ds:
        blocks = ray.get(labels.to_arrow_refs())
        # drop schema-less empty placeholder blocks Ray's groupby can emit
        blocks = [b for b in blocks if b.num_columns > 0]
        mapping_tbl = (
            pa.concat_tables(blocks)
            if blocks
            else pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.string())})
        )
    else:
        mapping_tbl = labels
    keys = mapping_tbl.column("node").to_pylist()
    roots = mapping_tbl.column("label").to_pylist()
    mapping = dict(zip(keys, roots))
    mapping_ref = ray.put(mapping)

    def lookup(batch: pa.Table) -> pa.Table:
        import pandas as pd

        m = ray.get(mapping_ref)
        s = pd.Series(batch.column(key_col).to_numpy(zero_copy_only=False))
        resolved = s.map(m).fillna(s)  # identity for unaliased keys
        return batch.append_column(out_col, pa.array(resolved, pa.string()))

    return ds.map_batches(lookup, batch_format="pyarrow")
