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
    """Order-independent fingerprint of a (node, label) dataset."""
    from ray.data.aggregate import Sum

    def h(batch: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(batch.column("node"), batch.column("label"), "\x1f")
        import pandas as pd

        hv = pd.util.hash_array(joined.to_numpy(zero_copy_only=False))
        # keep per-block sums small so the final Sum cannot overflow int64
        return pa.table({"h": pa.array([int(hv.sum() % (1 << 40))], pa.int64())})

    res = ds.map_batches(h, batch_format="pyarrow").aggregate(Sum("h", alias_name="s"))
    return int(res["s"]) if res and res["s"] is not None else 0


def connected_components(edges_ds, num_partitions: int = 16, max_rounds: int = 25):
    """(a,b) alias-edge Dataset → (node, label) Dataset of component roots.

    Pure Dataset pipeline (join + groupby-min per round); returns labels for
    every node that appears in at least one edge. Nodes outside the alias
    graph are implicitly their own root (resolve_keys applies that default).
    """
    import ray.data
    from ray.data.aggregate import Min

    # Local (per-batch) dedup only: min-label propagation is idempotent to
    # duplicate edges, so the global distinct groupby would buy nothing but
    # an extra all-to-all. The combiner still collapses hot-entity repeats.
    edges = edges_ds.map_batches(_dedup_batch_ab, batch_format="pyarrow")
    swapped = edges.map_batches(
        lambda t: pa.table({"a": t.column("b"), "b": t.column("a")}),
        batch_format="pyarrow",
    )
    from cartography_ray.runtime import drop_empty_blocks

    # cache the symmetrized edge list — reused every round — and strip
    # empty blocks (they bypass map UDFs and break downstream shuffles)
    sym = drop_empty_blocks(edges.union(swapped))

    # fused round 1: candidates = neighbor labels ∪ self labels
    self_pairs = sym.map_batches(
        lambda t: pa.table({"node": t.column("a"), "label": t.column("a")}),
        batch_format="pyarrow",
    )
    nbr_pairs = sym.map_batches(
        lambda t: pa.table({"node": t.column("a"), "label": t.column("b")}),
        batch_format="pyarrow",
    )
    from cartography_ray.runtime import drop_empty_blocks

    labels = drop_empty_blocks(
        self_pairs.union(nbr_pairs)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    )
    prev_fp = _hashsum(labels)

    from cartography_ray.ops.joins import hash_join

    for _ in range(max_rounds):
        # propagate: edges (a=x, b=y) ⋈ labels(y) → (x, label(y)).
        # Reduce-side hash join (ops/joins.py) — one bucket shuffle; the
        # per-batch edge combiner upstream already collapsed hot keys.
        # drop_empty_blocks between shuffles: see runtime.py.
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


def resolve_keys(ds, labels, key_col: str = "entity_key", out_col: str = "entity_id"):
    """Map candidate keys to canonical roots (identity for unaliased keys).

    The component map is the SMALL side (distinct aliased keys ≪ mentions):
    broadcast once via ``ray.put`` and looked up per batch — no shuffle of
    the mention stream. For component maps too large to broadcast, swap in
    ops.joins.hash_join with the same (left-outer + coalesce) semantics.
    """
    import ray

    if hasattr(labels, "to_arrow_refs"):
        blocks = [ray.get(r) for r in labels.to_arrow_refs()]
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
        m = ray.get(mapping_ref)
        col = batch.column(key_col).to_pylist()
        resolved = pa.array([m.get(k, k) for k in col], pa.string())
        return batch.append_column(out_col, resolved)

    return ds.map_batches(lookup, batch_format="pyarrow")
