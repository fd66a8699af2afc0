"""Post-ingest analysis jobs — the typed effect DSL over store tables.

Re-expresses the reference's ``AnalysisJob`` DSL (cartography/graph/
analysis.py:38-264, compiled by analysisbuilder.py:26-552): after a sync,
derivation passes run over the materialized graph — set properties on
matched nodes, add relationships derived from joins — each stamped with
the run's update tag so the auto-generated cleanup (stale-effect expiry)
falls out of the same update-tag semantics as everything else.

Supported effects (the reference's most-used subset):

- ``SetProperty(prop, value | from_prop | fn)`` — derived column on
  matched node rows (a vectorized map over the node table),
- ``AddRelationship(rel_label, match_on → target)`` — equality join of
  matched nodes against a target node table → new edges.

Jobs run against a GraphStore: node tables are read per bucket, matched,
mutated, rewritten atomically; new edges go through the normal edge
materialize path (so MERGE + cleanup semantics apply unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
import pyarrow as pa

from cartography_ray.core.context import IngestContext
from cartography_ray.state.store import GraphStore


@dataclass(frozen=True)
class SetProperty:
    prop: str
    value: object = None
    from_prop: str | None = None
    fn: Callable[[pd.DataFrame], pd.Series] | None = None


@dataclass(frozen=True)
class AddRelationship:
    rel_label: str
    target_label: str
    source_key: str      # column on matched source nodes
    target_key: str      # column on target nodes (join key)


@dataclass(frozen=True)
class AnalysisStatement:
    node_label: str
    match: Callable[[pd.DataFrame], pd.Series] | None  # row mask; None = all
    effects: tuple = field(default=())


@dataclass(frozen=True)
class AnalysisJob:
    name: str
    statements: tuple[AnalysisStatement, ...]


def run_analysis_job(job: AnalysisJob, store: GraphStore, ctx: IngestContext) -> dict:
    """Apply every statement; returns per-statement counters (the analogue
    of the reference's result-summary counters, statement.py:285-299)."""
    import ray
    import ray.data

    from cartography_ray.core.compile import edge_batch
    from cartography_ray.spec import PropertyRef, RelSpec, TargetNodeMatcher

    metrics: dict[str, int] = {}
    for si, stmt in enumerate(job.statements):
        tbl = store.read_nodes(stmt.node_label)
        if tbl is None:
            metrics[f"{job.name}.{si}.matched"] = 0
            continue
        pdf = tbl.to_pandas()
        mask = stmt.match(pdf) if stmt.match is not None else pd.Series(True, index=pdf.index)
        metrics[f"{job.name}.{si}.matched"] = int(mask.sum())
        set_props = [e for e in stmt.effects if isinstance(e, SetProperty)]
        add_rels = [e for e in stmt.effects if isinstance(e, AddRelationship)]

        if set_props:
            for eff in set_props:
                if eff.fn is not None:
                    vals = eff.fn(pdf[mask])
                elif eff.from_prop is not None:
                    vals = pdf.loc[mask, eff.from_prop]
                else:
                    vals = eff.value
                if eff.prop not in pdf.columns:
                    pdf[eff.prop] = None
                pdf.loc[mask, eff.prop] = vals
                # touched rows get this run's tag (incremental gating)
                pdf.loc[mask, "lastupdated"] = ctx.update_tag
            # rewrite through the store so bucketing/manifests stay correct
            store.materialize_nodes(
                stmt.node_label,
                ray.data.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False)),
                ctx,
            )
            metrics[f"{job.name}.{si}.props_set"] = int(mask.sum()) * len(set_props)

        for eff in add_rels:
            tgt = store.read_nodes(eff.target_label)
            if tgt is None:
                metrics[f"{job.name}.{si}.rels_added"] = 0
                continue
            tgt_pdf = tgt.to_pandas()[[eff.target_key, "id"]].rename(
                columns={"id": "__dst"}
            )
            joined = pdf[mask][["id", eff.source_key]].merge(
                tgt_pdf, left_on=eff.source_key, right_on=eff.target_key
            )
            rel = RelSpec(
                rel_label=eff.rel_label,
                target_node_label=eff.target_label,
                target_node_matcher=TargetNodeMatcher.make(
                    **{eff.target_key: PropertyRef(eff.source_key)}
                ),
            )
            edges = edge_batch(
                pa.array(joined["id"], pa.string()),
                pa.array(joined["__dst"], pa.string()),
                rel,
                ctx,
            )
            store.materialize_edges(eff.rel_label, ray.data.from_arrow(edges), ctx)
            metrics[f"{job.name}.{si}.rels_added"] = len(joined)
    return metrics
