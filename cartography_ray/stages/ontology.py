"""Ontology projection + cross-source consolidation.

Re-expresses the reference's ontology layer:

- **Field projection** — per-module mapping of provider node fields to
  semantic ``_ont_<field>`` properties with the 8 special handlers
  (reference ``cartography/graph/querybuilder.py:24-318``, orchestrated
  at 321-415), compiled here to ``pyarrow.compute`` kernels instead of
  Cypher ``SET`` clauses:

  =================  ====================================================
  handler            semantics (reference formula)
  =================  ====================================================
  (none)             plain copy of ``node_field``
  invert_boolean     ``NOT(coalesce(to_boolean_or_null(x), false))``
  to_boolean         ``coalesce(to_boolean_or_null(x), x IS NOT NULL)``
  equal_boolean      ``x IN extra['values']``
  static_value       literal ``extra['value']`` (ignores node_field)
  or_boolean         OR of ``coalesce(to_boolean_or_null(f), false)``
                     over [node_field] + extra['fields'] present
  nor_boolean        AND of ``NOT(coalesce(...))`` over the same fields
  mapping            value map via ``extra['map']``; unmapped → NULL
  coalesce           first non-null of [node_field] + extra['fields']
  =================  ====================================================

- **Consolidation** — provider nodes from several sources merge by
  canonical id with FIRST-source-wins per-field semantics (reference
  ``cartography/intel/ontology/utils.py:44-153``: the existing value is
  kept unless None); rows missing a required field are dropped
  (utils.py:44-58). Realized as a hash-bucketed ``groupby(id)`` with a
  stable source-priority sort + per-group first-non-null — a single
  shuffle, no driver materialization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class OntFieldMapping:
    """Reference ``OntologyFieldMapping`` analogue
    (models/ontology/mapping/specs.py:6-76)."""

    ont_field: str
    node_field: str = ""
    required: bool = False
    handler: str | None = None
    extra: dict = field(default_factory=dict)


@dataclass(frozen=True)
class OntNodeMapping:
    node_label: str
    fields: tuple[OntFieldMapping, ...]
    eligible_for_source: bool = True


@dataclass(frozen=True)
class OntologyMapping:
    module_name: str
    nodes: tuple[OntNodeMapping, ...]


def to_boolean_or_null(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Cypher ``toBooleanOrNull`` analogue: booleans pass through;
    'true'/'false' strings (case-insensitive) convert; numbers map
    zero/nonzero → false/true; anything else → null."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = col.type
    if pa.types.is_boolean(t):
        return col
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return pc.if_else(pc.is_valid(col), pc.not_equal(col, pa.scalar(0).cast(t)), pa.scalar(None, pa.bool_()))
    s = pc.utf8_lower(pc.cast(col, pa.string()))
    is_true = pc.equal(s, pa.scalar("true"))
    is_false = pc.equal(s, pa.scalar("false"))
    return pc.if_else(
        is_true,
        pa.scalar(True),
        pc.if_else(is_false, pa.scalar(False), pa.scalar(None, pa.bool_())),
    )


def _bool_or_false(col) -> pa.Array:
    return pc.fill_null(to_boolean_or_null(col), False)


def _compile_field(m: OntFieldMapping, tbl: pa.Table):
    """Evaluate one field mapping against a batch → pa.Array (or None to
    skip, mirroring the reference's fail-gracefully warnings)."""
    n = tbl.num_rows
    have = set(tbl.column_names)

    def col(name):
        return tbl.column(name) if name in have else pa.nulls(n)

    h = m.handler
    if h is None:
        return col(m.node_field)
    if h == "invert_boolean":
        return pc.invert(_bool_or_false(col(m.node_field)))
    if h == "to_boolean":
        c = col(m.node_field)
        return pc.fill_null(to_boolean_or_null(c), pc.is_valid(c))
    if h == "equal_boolean":
        values = m.extra.get("values")
        if not isinstance(values, list):
            return None
        return pc.is_in(
            pc.cast(col(m.node_field), pa.string()),
            pa.array([str(v) for v in values], pa.string()),
        )
    if h == "static_value":
        v = m.extra.get("value")
        if v is None:
            return None
        return pa.array([v] * n)
    if h in ("or_boolean", "nor_boolean"):
        fields = m.extra.get("fields")
        if not isinstance(fields, list):
            return None
        names = [m.node_field] + [f for f in fields if f in have]
        if h == "or_boolean":
            acc = _bool_or_false(col(names[0]))
            for f in names[1:]:
                acc = pc.or_(acc, _bool_or_false(col(f)))
            return acc
        acc = pc.invert(_bool_or_false(col(names[0])))
        for f in names[1:]:
            acc = pc.and_(acc, pc.invert(_bool_or_false(col(f))))
        return acc
    if h == "mapping":
        vmap = m.extra.get("map")
        if not isinstance(vmap, dict):
            return None
        s = pd.Series(pc.cast(col(m.node_field), pa.string()).to_numpy(zero_copy_only=False))
        return pa.Array.from_pandas(s.map({str(k): str(v) for k, v in vmap.items()}))
    if h == "coalesce":
        fields = m.extra.get("fields")
        if not isinstance(fields, list):
            return None
        names = [m.node_field] + [f for f in fields if f in have]
        arrs = [pc.cast(col(f), pa.string()) for f in names]
        return pc.coalesce(*arrs) if len(arrs) > 1 else arrs[0]
    raise ValueError(f"unknown ontology handler: {h}")


def project_ontology_fields(node_mapping: OntNodeMapping):
    """Batch fn appending ``_ont_<field>`` columns per the mapping —
    the querybuilder.py:321-415 orchestration compiled to Arrow."""

    def fn(tbl: pa.Table) -> pa.Table:
        for m in node_mapping.fields:
            arr = _compile_field(m, tbl)
            if arr is None:
                continue
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            tbl = tbl.append_column(f"_ont_{m.ont_field}", arr)
        return tbl

    return fn


def extract_ont_rows(node_mapping: OntNodeMapping):
    """Batch fn → ONLY the ontology-field columns (named without the
    ``_ont_`` prefix), with required-field rows filtered (the
    consolidation extraction of intel/ontology/utils.py:44-58)."""
    project = project_ontology_fields(node_mapping)

    def fn(tbl: pa.Table) -> pa.Table:
        out = project(tbl)
        cols = {}
        mask = None
        for m in node_mapping.fields:
            name = f"_ont_{m.ont_field}"
            c = out.column(name) if name in out.column_names else pa.nulls(out.num_rows)
            cols[m.ont_field] = c
            if m.required:
                ok = pc.is_valid(c)
                if pa.types.is_string(c.type):
                    ok = pc.and_(ok, pc.not_equal(pc.cast(c, pa.string()), pa.scalar("")))
                mask = ok if mask is None else pc.and_(mask, ok)
        res = pa.table(cols)
        return res.filter(mask) if mask is not None else res

    return fn


def consolidate_sources(sources, id_field: str, num_buckets: int = 32):
    """Merge ontology rows from several sources by canonical id.

    ``sources``: ordered list of (priority rank implied by position)
    ``ray.data.Dataset`` whose columns are already ontology field names
    (e.g. the output of ``extract_ont_rows``). Per id, each field takes
    the FIRST non-null value in source order (reference utils.py:60-81:
    existing values win, later sources only fill gaps). One
    hash-bucketed shuffle; no driver materialization.
    """
    from cartography_ray.runtime import drop_empty_blocks

    tagged = []
    for rank, ds in enumerate(sources):
        def tag(b: pd.DataFrame, _r=rank) -> pd.DataFrame:
            b = b.copy()
            b["_src_order"] = np.int64(_r)
            h = pd.util.hash_array(b[id_field].astype(str).to_numpy(), categorize=False)
            b["__ob"] = (h % num_buckets).astype(np.int64)
            return b

        tagged.append(ds.map_batches(tag, batch_format="pandas"))
    uni = tagged[0]
    for t in tagged[1:]:
        uni = uni.union(t)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_src_order", kind="mergesort")
        out = g.groupby(id_field, sort=False).first().reset_index()
        return out.drop(columns=["_src_order", "__ob"], errors="ignore")

    return drop_empty_blocks(
        drop_empty_blocks(uni).groupby("__ob").map_groups(merge_group, batch_format="pandas")
    )
