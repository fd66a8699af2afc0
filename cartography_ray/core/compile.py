"""Spec → vectorized Arrow plan compiler.

The analogue of the reference's ``build_ingestion_query``
(cartography/graph/querybuilder.py:1219-1316): instead of compiling a
NodeSpec/RelSpec to an UNWIND/MERGE Cypher statement, we compile it to
batch functions over ``pyarrow.Table`` blocks:

- ``project_nodes(spec, ctx)``     → fn(item batch) → node-table batch
  (id + declared props + lineage columns + label set; conditional extra
  labels evaluated vectorized — reference querybuilder.py:486-575),
- ``project_rel_candidates(...)``  → fn(item batch) → candidate-edge batch
  (src id + matcher key values + edge props),
- ``attach_rels(...)``             → join candidates against the target
  node table under the matcher's mode (exact / ignore_case / one_to_many /
  fuzzy-contains — reference querybuilder.py:710-745), keeping the
  reference's inner-join-drop semantics (querybuilder.py:864-902: edges
  only attach to EXISTING nodes; non-matching rows are silently dropped).

All per-batch work is pyarrow.compute kernels — no Python row loops.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cartography_ray.core.context import IngestContext
from cartography_ray.spec.nodes import NodeSpec
from cartography_ray.spec.refs import PropertyRef
from cartography_ray.spec.rels import LinkDirection, RelSpec

NODE_META_COLS = ["lastupdated", "firstseen", "_module_name", "_module_version", "_labels"]
EDGE_META_COLS = ["lastupdated", "firstseen", "_module_name", "_module_version"]


def _ref_column(batch: pa.Table, ref: PropertyRef, ctx: IngestContext) -> pa.Array:
    """Resolve a PropertyRef against an item batch: column or kwarg scalar."""
    n = batch.num_rows
    if ref.set_in_kwargs:
        value = ctx.kwarg(ref.name)
        return pa.array([value] * n)
    if ref.name not in batch.column_names:
        return pa.nulls(n)
    col = batch.column(ref.name)
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _labels_column(spec: NodeSpec, batch: pa.Table) -> pa.Array:
    """';'-joined label set per row, evaluated vectorized.

    Conditions within one ExtraNodeLabel AND together; multiple
    declarations of the same label OR; false ⇒ label absent (the
    analogue of the reference's paired FOREACH add/remove).
    """
    n = batch.num_rows
    base = [spec.label] + [
        x.label for x in spec.extra_node_labels if not x.when_conditions
    ]
    base_str = ";".join(dict.fromkeys(base))  # dedup, keep order
    # OR masks per conditional label
    cond_masks: dict[str, pa.Array] = {}
    for x in spec.extra_node_labels:
        if not x.when_conditions or x.label in base:
            continue
        mask = pa.array(np.ones(n, dtype=bool))
        for prop, value in x.when_conditions:
            col = batch.column(prop) if prop in batch.column_names else pa.nulls(n)
            eq = pc.fill_null(pc.equal(col, pa.scalar(value)), False)
            mask = pc.and_(mask, eq)
        prev = cond_masks.get(x.label)
        cond_masks[x.label] = mask if prev is None else pc.or_(prev, mask)
    parts = [pa.array([base_str] * n, pa.string())]
    for label, mask in cond_masks.items():
        parts.append(pc.if_else(mask, pa.scalar(";" + label), pa.scalar("")))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


def project_nodes(spec: NodeSpec, ctx: IngestContext) -> Callable[[pa.Table], pa.Table]:
    """Compile the node-side projection (the SET clause analogue).

    Reference semantics reproduced (querybuilder.py:1266-1279):
    - ``id`` is the MERGE key; excluded from mutation, present once.
    - ``lastupdated`` stamped with the run's update tag on every row.
    - ``firstseen`` write-once (min across runs — enforced at the
      upsert-reduce in state/store.py; here stamped with the tag).
    - provenance ``_module_name`` / ``_module_version`` on every row.
    """
    props = spec.prop_dict()

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols: dict[str, pa.Array] = {}
        cols["id"] = pc.cast(_ref_column(batch, props["id"], ctx), pa.string())
        for name, ref in props.items():
            if name == "id":
                continue
            cols[name] = _ref_column(batch, ref, ctx)
        cols["lastupdated"] = pa.array(np.full(n, ctx.update_tag, dtype=np.int64))
        cols["firstseen"] = pa.array(np.full(n, ctx.update_tag, dtype=np.int64))
        cols["_module_name"] = pa.array([ctx.module_name] * n, pa.string())
        cols["_module_version"] = pa.array([ctx.module_version] * n, pa.string())
        cols["_labels"] = _labels_column(spec, batch)
        return pa.table(cols)

    return fn


def project_rel_candidates(
    rel: RelSpec,
    ctx: IngestContext,
    source_id_ref: PropertyRef,
) -> Callable[[pa.Table], pa.Table]:
    """Compile the candidate-edge projection for one RelSpec.

    Emits (src_id, one ``_match_<key>`` column per matcher key, edge
    props). Join modes are applied later in ``attach_rels``.
    """
    matcher = rel.target_node_matcher.as_dict()
    props = rel.prop_dict()

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        cols["src_id"] = pc.cast(_ref_column(batch, source_id_ref, ctx), pa.string())
        for key, ref in matcher.items():
            col = _ref_column(batch, ref, ctx)
            if ref.one_to_many:
                cols[f"_match_{key}"] = col  # list column; exploded at join
            else:
                col = pc.cast(col, pa.string())
                if ref.ignore_case or ref.fuzzy_and_ignore_case:
                    col = pc.utf8_lower(col)
                cols[f"_match_{key}"] = col
        for name, ref in props.items():
            cols[name] = _ref_column(batch, ref, ctx)
        return pa.table(cols)

    return fn


def _explode_one_to_many(batch: pa.Table, key_col: str) -> pa.Table:
    """item list column → one candidate row per element (a.key IN item.list)."""
    lists = batch.column(key_col)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat_tbl = batch.drop_columns([key_col])
    # value_lengths → parent indices
    lengths = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(zero_copy_only=False)
    parent_idx = np.repeat(np.arange(len(lengths)), lengths)
    flat_vals = pc.cast(pc.list_flatten(lists), pa.string())
    out = flat_tbl.take(pa.array(parent_idx))
    return out.append_column(key_col, flat_vals)


def edge_batch(
    src: pa.Array | np.ndarray,
    dst: pa.Array | np.ndarray,
    rel: RelSpec,
    ctx: IngestContext,
    extra_cols: dict[str, pa.Array] | None = None,
) -> pa.Table:
    """Assemble a final edge batch with direction applied + lineage stamped.

    Direction is metadata in the reference (relationships.py:13-27); here it
    decides which endpoint is subj: OUTWARD ⇒ (node)-[rel]->(target),
    INWARD ⇒ (target)-[rel]->(node).
    """
    if rel.direction == LinkDirection.INWARD:
        src, dst = dst, src
    n = len(src)
    cols: dict[str, pa.Array] = {
        "src_id": pa.array(src) if not isinstance(src, (pa.Array, pa.ChunkedArray)) else src,
        "rel_label": pa.array([rel.rel_label] * n, pa.string()),
        "dst_id": pa.array(dst) if not isinstance(dst, (pa.Array, pa.ChunkedArray)) else dst,
    }
    if extra_cols:
        cols.update(extra_cols)
    cols["lastupdated"] = pa.array(np.full(n, ctx.update_tag, dtype=np.int64))
    cols["firstseen"] = pa.array(np.full(n, ctx.update_tag, dtype=np.int64))
    cols["_module_name"] = pa.array([ctx.module_name] * n, pa.string())
    cols["_module_version"] = pa.array([ctx.module_version] * n, pa.string())
    return pa.table(cols)


def attach_rels(
    candidates,
    target_nodes: pa.Table,
    rel: RelSpec,
    ctx: IngestContext,
):
    """Join candidate edges against the target node table → final edges.

    ``candidates``: ray.data.Dataset of candidate batches (from
    ``project_rel_candidates``). ``target_nodes``: the target label's node
    table **small side**, broadcast via ``ray.put`` once and joined inside
    every batch (no shuffle). For large-large attaches use
    ``ops.joins.hash_join`` instead.

    Match modes per matcher key (reference querybuilder.py:710-745):
    exact equality; ignore_case (join on lowercased); one_to_many
    (explode candidate list then equality); fuzzy (target key contains the
    candidate value, case-folded — quadratic, only valid for broadcast-small
    target tables, as the reference's matchlink docs warn).
    """
    import ray

    matcher = rel.target_node_matcher.as_dict()
    fuzzy_keys = [k for k, r in matcher.items() if r.fuzzy_and_ignore_case]
    eq_keys = [k for k, r in matcher.items() if not r.fuzzy_and_ignore_case]
    o2m_keys = [k for k, r in matcher.items() if r.one_to_many]

    # Prepare the broadcast side once: (id, normalized match keys)
    keep = list(dict.fromkeys(["id"] + list(matcher.keys())))
    tgt = target_nodes.select([c for c in keep if c in target_nodes.column_names])
    tgt_cols = {"dst_id": pc.cast(tgt.column("id"), pa.string())}
    for key, ref in matcher.items():
        col = pc.cast(tgt.column(key), pa.string())
        if ref.ignore_case or ref.fuzzy_and_ignore_case or ref.one_to_many:
            col = pc.utf8_lower(col) if ref.match_mode != "one_to_many" else col
        tgt_cols[f"_t_{key}"] = col
    tgt_pdf = pa.table(tgt_cols).to_pandas()
    tgt_ref = ray.put(tgt_pdf)

    edge_props = list(rel.prop_dict().keys())

    def join_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        tgt_df = ray.get(tgt_ref)
        for key in o2m_keys:
            batch = _explode_one_to_many(batch, f"_match_{key}")
        pdf = batch.to_pandas()
        if eq_keys:
            # NULL never matches NULL (Cypher 'n.key = item.value'
            # semantics) — pd.merge would pair NaN keys, fabricating edges
            pdf = pdf.dropna(subset=[f"_match_{k}" for k in eq_keys])
            tgt_df = tgt_df.dropna(subset=[f"_t_{k}" for k in eq_keys])
            merged = pdf.merge(
                tgt_df,
                left_on=[f"_match_{k}" for k in eq_keys],
                right_on=[f"_t_{k}" for k in eq_keys],
                how="inner",
            )
        else:
            merged = pdf.merge(tgt_df, how="cross")
        for key in fuzzy_keys:
            hay = merged[f"_t_{key}"].fillna("")
            needle = merged[f"_match_{key}"].fillna("\x00")
            mask = [n_ in h for h, n_ in zip(hay.to_numpy(), needle.to_numpy())]
            merged = merged[pd.Series(mask, index=merged.index)]
        extra = {
            name: pa.Array.from_pandas(merged[name]) for name in edge_props
        }
        return edge_batch(
            pa.Array.from_pandas(merged["src_id"]),
            pa.Array.from_pandas(merged["dst_id"]),
            rel,
            ctx,
            extra_cols=extra,
        )

    return candidates.map_batches(join_batch, batch_format="pyarrow")
