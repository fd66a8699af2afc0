"""The flagship transcript → knowledge-graph pipeline.

End-to-end (north rule): read Parquet transcripts → stabilize order by
(conv_id, turn_idx) → mention detection (actor pool over zero-copy Arrow)
→ entity-link scoring → distributed union-find canonicalization (salted /
combined groupby) → spec-driven triple emission → MERGE materialize into
partitioned Parquet node/edge tables with lastupdated lineage →
update-tag cleanup → per-partition manifests.

Lifecycle mirrors the reference's get → transform → load → cleanup loop
(cartography/intel/aws/ec2/instances.py:576-615, cartography/sync.py:240-297)
with the stages re-expressed as one streaming Dataset pipeline.

Scale notes:
- **staged checkpoints**: the sorted transcript stream and the raw mention
  stream are each computed ONCE and written to Parquet stage directories;
  every downstream consumer re-reads the checkpoint instead of re-running
  the sort / extraction lineage. This (a) avoids re-executing the global
  sort per consumer (Ray re-runs lazy lineage for every sink; the sort's
  boundary sampling also deadlocks intermittently when the same sort
  lineage executes concurrently in Ray 2.49), (b) is the resume story:
  a completed stage directory is skipped on rerun;
- the corpus is never materialized in memory; checkpoints stream to disk;
- ``text`` is projected away immediately after extraction on every edge
  stream (wide-record rule, SURVEY §7.4);
- the canonical-map is broadcast (ray.put) — it is bounded by the number
  of distinct aliased keys, orders of magnitude below turn count.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cartography_ray.core.compile import edge_batch, project_nodes
from cartography_ray.core.context import IngestContext
from cartography_ray.pipelines import specs
from cartography_ray.stages.canonicalize import connected_components, resolve_keys
from cartography_ray.stages.extract import MentionDetector, ToolUseExtractor, turn_uid_array
from cartography_ray.stages.link import LinkScorer, alias_edges_batch
from cartography_ray.state.store import GraphStore


def _prepare_turns(batch: pa.Table) -> pa.Table:
    """Add computed id columns (turn_uid, conv_uid) to transcript batches."""
    n = batch.num_rows
    conv = batch.column("conv_id")
    uid = turn_uid_array(conv, batch.column("turn_idx"))
    conv_uid = pc.binary_join_element_wise(pa.array(["conv"] * n, pa.string()), pc.cast(conv, pa.string()), ":")
    return batch.append_column("turn_uid", uid).append_column("conv_uid", conv_uid)


def _entity_rows(batch: pa.Table, id_col: str) -> pa.Table:
    """(entity_id, kind) rows; kind = key prefix before ':'."""
    ids = pc.cast(batch.column(id_col), pa.string())
    kind = pc.list_element(pc.split_pattern(ids, ":"), 0)
    return pa.table({"entity_id": ids, "kind": kind})


def _dedup_batch(batch: pa.Table, cols: list[str]) -> pa.Table:
    """Per-batch combiner: local distinct before any shuffle."""
    if batch.num_rows == 0:
        return batch
    pdf = batch.select(cols).to_pandas()
    idx = pdf.drop_duplicates().index.to_numpy()
    return batch.take(pa.array(idx))


def _head1(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def _checkpoint(ds, path: str) -> str:
    """Execute a stage ONCE into a Parquet directory; skip if already done.

    A ``_SUCCESS`` marker written after ``write_parquet`` makes the stage
    atomic-enough for rerun-after-kill: a partial directory (no marker) is
    discarded and rewritten.
    """
    import shutil

    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def build_graph(
    transcripts,
    ctx: IngestContext,
    *,
    work_dir: str | None = None,
    detector_concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 4096,
    cc_partitions: int = 8,
) -> dict[str, Any]:
    """Run extraction → linking → canonicalization; return Dataset handles.

    Returns a dict of lazy Datasets: node streams per label, edge streams
    per rel label, plus intermediates (mentions, alias component labels)
    for inspection / tests. Heavy stages (global sort, mention detection)
    are checkpointed to ``work_dir`` so each executes exactly once.
    """
    import ray
    import ray.data

    from cartography_ray.runtime import configure

    configure()

    if work_dir is None:
        work_dir = f"/tmp/graft_kg/work/{os.getpid()}-{id(transcripts)}"
    os.makedirs(work_dir, exist_ok=True)

    # Stage 1: stabilize order (global sort) + computed id columns — once.
    sorted_path = os.path.join(work_dir, "sorted")
    if not os.path.exists(os.path.join(sorted_path, "_SUCCESS")):
        _checkpoint(
            transcripts.sort(["conv_id", "turn_idx"]).map_batches(
                _prepare_turns, batch_format="pyarrow"
            ),
            sorted_path,
        )
    turns = ray.data.read_parquet(sorted_path)

    if detector_concurrency is None:
        # actor pools require an explicit size; default to the session CPUs
        # (leave a couple for the read/write stages)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        detector_concurrency = max(2, ncpu - 2)
    det_kwargs = dict(
        batch_format="pyarrow", batch_size=batch_size, concurrency=detector_concurrency
    )

    # Stage 2: mention detection (actor pool) — once; consumers re-read.
    mentions_path = os.path.join(work_dir, "mentions")
    if not os.path.exists(os.path.join(mentions_path, "_SUCCESS")):
        _checkpoint(turns.map_batches(MentionDetector, **det_kwargs), mentions_path)
    raw_mentions = ray.data.read_parquet(mentions_path)

    # alias graph → canonical component labels (small vs the corpus)
    alias_edges = raw_mentions.map_batches(alias_edges_batch, batch_format="pyarrow")
    labels = connected_components(alias_edges, num_partitions=cc_partitions)

    # LinkScorer is pure-vectorized (no per-worker state) → stateless tasks
    linked = raw_mentions.map_batches(LinkScorer(), batch_format="pyarrow")
    resolved = resolve_keys(linked, labels, key_col="entity_key", out_col="entity_id")

    tool_uses = turns.map_batches(ToolUseExtractor(), batch_format="pyarrow")

    def tool_entity_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pa.array(["tool"] * batch.num_rows, pa.string()), pc.cast(batch.column("tool"), pa.string()), ":"
        )
        return batch.append_column("entity_id", key)

    tool_uses = tool_uses.map_batches(tool_entity_key, batch_format="pyarrow")

    # ---- node streams ------------------------------------------------------
    turn_nodes = turns.map_batches(project_nodes(specs.TURN_NODE, ctx), batch_format="pyarrow")
    # carry the sub-resource id for scoped cleanup
    turn_nodes = turn_nodes.map_batches(
        lambda t: t.append_column(
            "_sub_id",
            pc.binary_join_element_wise(
                pa.array(["conv"] * t.num_rows, pa.string()), pc.cast(t.column("conv_id"), pa.string()), ":"
            ),
        ),
        batch_format="pyarrow",
    )

    from ray.data.aggregate import Count

    conv_counts = (
        turns.select_columns(["conv_id"])
        .groupby("conv_id")
        .aggregate(Count(alias_name="n_turns"))
    )
    conv_nodes = conv_counts.map_batches(
        lambda t: pa.table(
            {
                "conv_uid": pc.binary_join_element_wise(
                    pa.array(["conv"] * t.num_rows, pa.string()), pc.cast(t.column("conv_id"), pa.string()), ":"
                ),
                "conv_id": t.column("conv_id"),
                "n_turns": pc.cast(t.column("n_turns"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).map_batches(project_nodes(specs.CONVERSATION_NODE, ctx), batch_format="pyarrow")

    # entity nodes: distinct canonical ids from mentions ∪ tools ∪ alias roots
    ent_a = resolved.map_batches(lambda t: _entity_rows(t, "entity_id"), batch_format="pyarrow")
    ent_b = tool_uses.map_batches(lambda t: _entity_rows(t, "entity_id"), batch_format="pyarrow")
    ent_c = labels.map_batches(
        lambda t: _entity_rows(t.rename_columns(["node", "entity_id"]), "entity_id"),
        batch_format="pyarrow",
    )
    entity_rows = (
        ent_a.union(ent_b, ent_c)
        .map_batches(lambda t: _dedup_batch(t, ["entity_id", "kind"]), batch_format="pyarrow")
        .groupby("entity_id")
        .map_groups(_head1, batch_format="pyarrow")
    )
    entity_nodes = entity_rows.map_batches(
        project_nodes(specs.ENTITY_NODE, ctx), batch_format="pyarrow"
    )

    # ---- edge streams (text projected away everywhere) ---------------------
    def mention_edges(batch: pa.Table) -> pa.Table:
        tables = []
        for pred, rel in specs.MENTION_RELS.items():
            sel = batch.filter(pc.equal(batch.column("pred"), pa.scalar(pred)))
            tables.append(
                edge_batch(
                    sel.column("turn_uid"),
                    sel.column("entity_id"),
                    rel,
                    ctx,
                    extra_cols={
                        "_sub_id": pc.binary_join_element_wise(
                            pa.array(["conv"] * sel.num_rows, pa.string()),
                            pc.cast(sel.column("conv_id"), pa.string()),
                            ":",
                        )
                    },
                )
            )
        return pa.concat_tables(tables)

    mention_edge_ds = resolved.map_batches(mention_edges, batch_format="pyarrow")
    # mention edges are per-occurrence; the edge MERGE key is
    # (src, rel, dst) so duplicates within a turn collapse at materialize —
    # pre-dedup per batch here to shrink the shuffle (combiner).
    mention_edge_ds = mention_edge_ds.map_batches(
        lambda t: _dedup_batch(t, ["src_id", "rel_label", "dst_id"]), batch_format="pyarrow"
    )

    def tool_edges(batch: pa.Table) -> pa.Table:
        return edge_batch(
            batch.column("turn_uid"),
            batch.column("entity_id"),
            specs.USES_TOOL,
            ctx,
            extra_cols={
                "_sub_id": pc.binary_join_element_wise(
                    pa.array(["conv"] * batch.num_rows, pa.string()),
                    pc.cast(batch.column("conv_id"), pa.string()),
                    ":",
                )
            },
        )

    tool_edge_ds = tool_uses.map_batches(tool_edges, batch_format="pyarrow")

    def next_turn_edges(batch: pa.Table) -> pa.Table:
        # turn t (t>0) emits (turn t-1) -[NEXT_TURN]-> (turn t); contiguity
        # of turn_idx within a conversation is a corpus invariant, so no
        # adjacency shuffle is needed.
        sel = batch.filter(pc.greater(batch.column("turn_idx"), pa.scalar(0, pa.int32())))
        prev_uid = turn_uid_array(
            sel.column("conv_id"), pc.subtract(sel.column("turn_idx"), pa.scalar(1, pa.int32()))
        )
        return edge_batch(
            prev_uid,
            sel.column("turn_uid"),
            specs.NEXT_TURN,
            ctx,
            extra_cols={
                "_sub_id": pc.binary_join_element_wise(
                    pa.array(["conv"] * sel.num_rows, pa.string()),
                    pc.cast(sel.column("conv_id"), pa.string()),
                    ":",
                )
            },
        )

    next_edge_ds = turns.map_batches(next_turn_edges, batch_format="pyarrow")

    def in_conv_edges(batch: pa.Table) -> pa.Table:
        return edge_batch(
            batch.column("turn_uid"),
            batch.column("conv_uid"),
            specs.IN_CONV,
            ctx,
            extra_cols={"_sub_id": pc.cast(batch.column("conv_uid"), pa.string()).combine_chunks()},
        )

    in_conv_ds = turns.map_batches(in_conv_edges, batch_format="pyarrow")

    def alias_of_edges(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.not_equal(batch.column("node"), batch.column("label")))
        return edge_batch(sel.column("node"), sel.column("label"), specs.ALIAS_OF, ctx)

    alias_edge_ds = labels.map_batches(alias_of_edges, batch_format="pyarrow")

    return {
        "turns": turns,
        "mentions": resolved,
        "alias_labels": labels,
        "nodes": {
            "Turn": turn_nodes,
            "Conversation": conv_nodes,
            "Entity": entity_nodes,
        },
        "edges": {
            "MENTIONS": mention_edge_ds.filter(expr="rel_label == 'MENTIONS'"),
            "REFERENCES_TICKET": mention_edge_ds.filter(expr="rel_label == 'REFERENCES_TICKET'"),
            "LINKS_TO": mention_edge_ds.filter(expr="rel_label == 'LINKS_TO'"),
            "USES_TOOL": tool_edge_ds,
            "NEXT_TURN": next_edge_ds,
            "IN_CONV": in_conv_ds,
            "ALIAS_OF": alias_edge_ds,
        },
    }


def run_kg_pipeline(
    transcripts,
    store: GraphStore,
    ctx: IngestContext,
    *,
    work_dir: str | None = None,
    detector_concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 4096,
    cleanup: bool = True,
) -> dict[str, Any]:
    """Full sync: build → materialize → cleanup → manifests. Returns metrics.

    The analogue of one Cartography sync run (sync.py:240-297): every
    touched row stamped with ctx.update_tag; stale rows (previous epochs)
    expired afterwards — scoped to the conversations present in this input
    for Turn/edge tables (cleanupbuilder.py:244-383 semantics), global for
    Conversation/Entity (386-451 semantics).
    """
    g = build_graph(
        transcripts,
        ctx,
        work_dir=work_dir,
        detector_concurrency=detector_concurrency,
        batch_size=batch_size,
    )
    metrics: dict[str, Any] = {"nodes": {}, "edges": {}, "deleted": {}}

    for label, ds in g["nodes"].items():
        stats = store.materialize_nodes(label, ds, ctx)
        metrics["nodes"][label] = int(stats["rows"].sum()) if len(stats) else 0
    for label, ds in g["edges"].items():
        stats = store.materialize_edges(label, ds, ctx)
        metrics["edges"][label] = int(stats["rows"].sum()) if len(stats) else 0

    if cleanup:
        # sub-resources touched by this run = conversations in the input
        synced = {
            f"conv:{c}" for c in g["turns"].select_columns(["conv_id"]).unique("conv_id")
        }
        metrics["deleted"]["Turn"] = store.cleanup_nodes(
            "Turn", ctx, scoped=True, synced_sub_ids=synced
        )
        metrics["deleted"]["Conversation"] = store.cleanup_nodes("Conversation", ctx, scoped=False)
        metrics["deleted"]["Entity"] = store.cleanup_nodes("Entity", ctx, scoped=False)
        for rel in ("MENTIONS", "REFERENCES_TICKET", "LINKS_TO", "USES_TOOL", "NEXT_TURN", "IN_CONV"):
            metrics["deleted"][rel] = store.cleanup_edges(
                rel, ctx, scoped=True, synced_sub_ids=synced
            )
        metrics["deleted"]["ALIAS_OF"] = store.cleanup_edges("ALIAS_OF", ctx, scoped=False)
    return metrics
