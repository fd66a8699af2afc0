"""MatchLink loaders — edges between EXISTING nodes from a pair table.

Re-expresses the reference's ``load_matchlinks`` (cartography/client/core/
tx.py:846-920; query builder querybuilder.py:1755-1924): a pair table is
joined against BOTH endpoint node tables and only pairs whose endpoints
exist produce edges (inner-join drop), stamped with lineage plus the
``_sub_resource_label`` / ``_sub_resource_id`` scoping properties that
drive matchlink cleanup (cleanupbuilder.py:603-667).

``matchlink_cartesian`` mirrors ``load_matchlinks_cartesian_product``
(tx.py:923-1072): every source × every target — realized as a broadcast
cross product inside ``map_batches`` (the small side is ray.put once),
bounded exactly like the reference bounds its transaction size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cartography_ray.core.compile import edge_batch
from cartography_ray.core.context import IngestContext
from cartography_ray.spec.rels import RelSpec


def _scope_cols(n: int, sub_label: str, sub_id: str) -> dict[str, pa.Array]:
    return {
        "_sub_resource_label": pa.array([sub_label] * n, pa.string()),
        "_sub_resource_id": pa.array([sub_id] * n, pa.string()),
    }


def _scope_filter(nodes: pa.Table, side: str, scope_col: str, sub_id: str) -> pa.Table:
    """Restrict an endpoint table to one sub-resource's rows.

    The kwargs-validation analogue of reference cleanupbuilder.py:568-600
    (MatchLinkSubResource semantics, relationships.py:232-259): scoping
    was requested, so a table that CANNOT be scoped (no membership
    column) is a spec error, not a silent cross-tenant join.
    """
    if scope_col not in nodes.column_names:
        raise ValueError(
            f"matchlink endpoint scoping: {side} node table has no "
            f"'{scope_col}' column — cannot scope to sub-resource {sub_id!r}"
        )
    return nodes.filter(
        pc.equal(pc.cast(nodes.column(scope_col), pa.string()), pa.scalar(sub_id))
    )


def load_matchlinks(
    pairs,
    source_nodes: pa.Table,
    target_nodes: pa.Table,
    rel: RelSpec,
    ctx: IngestContext,
    source_key: str,
    target_key: str,
    sub_resource_label: str,
    sub_resource_id: str,
    scope_endpoints: bool = False,
    endpoint_scope_col: str = "_sub_id",
):
    """pairs Dataset (source_key, target_key cols) → edge Dataset.

    Both endpoint id sets are broadcast (matchlink endpoint tables are
    dimension-sized — the reference loads them through bounded
    transactions for the same reason). Pairs with a missing endpoint are
    dropped silently, matching the reference's OPTIONAL MATCH + WHERE
    NOT NULL semantics.

    ``scope_endpoints=True`` additionally restricts BOTH endpoint matches
    to rows whose ``endpoint_scope_col`` equals ``sub_resource_id`` (the
    reference's MatchLinkSubResource tenant scoping,
    querybuilder.py:1755-1924) — in a multi-tenant store, identical pair
    keys in different tenants must not cross-link.
    """
    import ray

    if not rel.is_matchlink:
        raise ValueError(f"{rel.rel_label}: RelSpec must declare source matcher for matchlinks")
    src_matcher = rel.source_node_matcher.as_dict()
    tgt_matcher = rel.target_node_matcher.as_dict()
    (src_prop, _), = src_matcher.items()
    (tgt_prop, _), = tgt_matcher.items()

    if scope_endpoints:
        source_nodes = _scope_filter(
            source_nodes, "source", endpoint_scope_col, sub_resource_id
        )
        target_nodes = _scope_filter(
            target_nodes, "target", endpoint_scope_col, sub_resource_id
        )

    src_map = dict(
        zip(
            pc.cast(source_nodes.column(src_prop), pa.string()).to_pylist(),
            pc.cast(source_nodes.column("id"), pa.string()).to_pylist(),
        )
    )
    tgt_map = dict(
        zip(
            pc.cast(target_nodes.column(tgt_prop), pa.string()).to_pylist(),
            pc.cast(target_nodes.column("id"), pa.string()).to_pylist(),
        )
    )
    maps_ref = ray.put((src_map, tgt_map))

    def join(batch: pa.Table) -> pa.Table:
        smap, tmap = ray.get(maps_ref)
        import pandas as pd

        s = pd.Series(
            pc.cast(batch.column(source_key), pa.string()).to_numpy(zero_copy_only=False)
        ).map(smap)
        t = pd.Series(
            pc.cast(batch.column(target_key), pa.string()).to_numpy(zero_copy_only=False)
        ).map(tmap)
        ok = s.notna() & t.notna()
        n = int(ok.sum())
        return edge_batch(
            pa.array(s[ok], pa.string()),
            pa.array(t[ok], pa.string()),
            rel,
            ctx,
            extra_cols=_scope_cols(n, sub_resource_label, sub_resource_id),
        )

    return pairs.map_batches(join, batch_format="pyarrow")


def matchlink_cartesian(
    source_ids: list[str],
    target_ids: list[str],
    rel: RelSpec,
    ctx: IngestContext,
    sub_resource_label: str,
    sub_resource_id: str,
    max_pairs: int = 1_000_000,
):
    """Every source × every target (dedup-preserving-order like the
    reference's dict.fromkeys at tx.py:973-976). Returns an edge Dataset."""
    import ray.data

    srcs = list(dict.fromkeys(source_ids))
    tgts = list(dict.fromkeys(target_ids))
    n = len(srcs) * len(tgts)
    if n > max_pairs:
        raise ValueError(f"cartesian matchlink too large: {n} > {max_pairs}")
    src_arr = np.repeat(np.array(srcs, dtype=object), len(tgts))
    tgt_arr = np.tile(np.array(tgts, dtype=object), len(srcs))
    tbl = edge_batch(
        pa.array(src_arr, pa.string()),
        pa.array(tgt_arr, pa.string()),
        rel,
        ctx,
        extra_cols=_scope_cols(n, sub_resource_label, sub_resource_id),
    )
    return ray.data.from_arrow(tbl)
