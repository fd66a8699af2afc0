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
    # bound file count: downstream consumers pay one task chain per file
    ds.write_parquet(path, min_rows_per_file=65536)
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
    timings: dict | None = None,
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

    import time as _time

    if timings is None:
        timings = {}

    # Stage 1: stabilize order (global sort) + computed id columns — once.
    _t = _time.time()
    sorted_path = os.path.join(work_dir, "sorted")
    if not os.path.exists(os.path.join(sorted_path, "_SUCCESS")):
        _checkpoint(
            transcripts.sort(["conv_id", "turn_idx"]).map_batches(
                _prepare_turns, batch_format="pyarrow"
            ),
            sorted_path,
        )
    timings["sort_checkpoint"] = round(_time.time() - _t, 2)
    turns = ray.data.read_parquet(sorted_path)

    if detector_concurrency is None:
        # autoscaling actor pool: don't pay full-pool startup on small
        # inputs; scale toward the session CPUs under queue pressure
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        detector_concurrency = (2, max(2, ncpu - 2))
    det_kwargs = dict(
        batch_format="pyarrow", batch_size=batch_size, concurrency=detector_concurrency
    )

    # Stage 2: mention detection (actor pool) — once; consumers re-read.
    _t = _time.time()
    mentions_path = os.path.join(work_dir, "mentions")
    if not os.path.exists(os.path.join(mentions_path, "_SUCCESS")):
        _checkpoint(turns.map_batches(MentionDetector, **det_kwargs), mentions_path)
    raw_mentions = ray.data.read_parquet(mentions_path)
    timings["detect_checkpoint"] = round(_time.time() - _t, 2)

    # alias graph → canonical component labels (small vs the corpus)
    _t = _time.time()
    alias_edges = raw_mentions.map_batches(alias_edges_batch, batch_format="pyarrow")
    labels = connected_components(alias_edges, num_partitions=cc_partitions)
    timings["canonicalize"] = round(_time.time() - _t, 2)

    # Stage 3: link scoring + canonical resolution — once; both the node
    # side (Entity) and the edge side (MENTIONS family) consume it.
    _t = _time.time()
    resolved_path = os.path.join(work_dir, "resolved")
    if not os.path.exists(os.path.join(resolved_path, "_SUCCESS")):
        # LinkScorer is pure-vectorized (no per-worker state) → stateless tasks
        linked = raw_mentions.map_batches(LinkScorer(), batch_format="pyarrow")
        _checkpoint(
            resolve_keys(linked, labels, key_col="entity_key", out_col="entity_id"),
            resolved_path,
        )
    resolved = ray.data.read_parquet(resolved_path)
    timings["resolve_checkpoint"] = round(_time.time() - _t, 2)

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

    def conv_partials(t: pa.Table) -> pa.Table:
        """Conversation rows WITHOUT a groupby shuffle: each batch emits its
        per-conversation max(turn_idx)+1 (combiner); the store's MERGE
        upsert — ordered by (id, lastupdated, value) — keeps the global
        max within an epoch and the re-synced value across epochs, so the
        final n_turns is exact. Contiguous turn_idx is a corpus invariant.
        """
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "conv_id": t.column("conv_id").to_numpy(zero_copy_only=False),
                "turn_idx": t.column("turn_idx").to_numpy(zero_copy_only=False),
            }
        )
        agg = pdf.groupby("conv_id", sort=False)["turn_idx"].max().reset_index()
        conv = pa.array(agg["conv_id"], pa.string())
        return pa.table(
            {
                "conv_uid": pc.binary_join_element_wise(
                    pa.array(["conv"] * len(agg), pa.string()), conv, ":"
                ),
                "conv_id": conv,
                "n_turns": pa.array((agg["turn_idx"] + 1).astype("int64")),
            }
        )

    conv_nodes = turns.select_columns(["conv_id", "turn_idx"]).map_batches(
        conv_partials, batch_format="pyarrow"
    ).map_batches(project_nodes(specs.CONVERSATION_NODE, ctx), batch_format="pyarrow")

    # entity nodes: distinct canonical ids from mentions ∪ tools ∪ alias roots
    ent_a = resolved.map_batches(lambda t: _entity_rows(t, "entity_id"), batch_format="pyarrow")
    ent_b = tool_uses.map_batches(lambda t: _entity_rows(t, "entity_id"), batch_format="pyarrow")
    ent_c = labels.map_batches(
        lambda t: _entity_rows(t.rename_columns(["node", "entity_id"]), "entity_id"),
        batch_format="pyarrow",
    )
    # per-batch combiner only — the store's MERGE-by-id upsert performs the
    # global dedup in the same shuffle it already pays for clustering
    entity_rows = ent_a.union(ent_b, ent_c).map_batches(
        lambda t: _dedup_batch(t, ["entity_id", "kind"]), batch_format="pyarrow"
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

    def per_turn_edges(batch: pa.Table) -> pa.Table:
        """All per-turn structural edges in ONE pass over the turn stream:
        USES_TOOL, NEXT_TURN, IN_CONV. A single map keeps the union of
        edge streams narrow — Ray's UnionOperator executes its inputs with
        little inter-input concurrency, so fewer inputs = real wall-time.
        """
        sub = pc.cast(batch.column("conv_uid"), pa.string())
        sub = sub.combine_chunks() if isinstance(sub, pa.ChunkedArray) else sub
        tables = []
        # USES_TOOL: role='tool' turns → (turn)-[:USES_TOOL]->(tool entity)
        tool_mask = pc.and_(
            pc.equal(batch.column("role"), pa.scalar("tool")),
            pc.is_valid(batch.column("tool")),
        )
        tsel = batch.filter(tool_mask)
        tool_key = pc.binary_join_element_wise(
            pa.array(["tool"] * tsel.num_rows, pa.string()),
            pc.cast(tsel.column("tool"), pa.string()),
            ":",
        )
        tables.append(
            edge_batch(
                tsel.column("turn_uid"), tool_key, specs.USES_TOOL, ctx,
                extra_cols={"_sub_id": pc.cast(tsel.column("conv_uid"), pa.string()).combine_chunks()},
            )
        )
        # NEXT_TURN: turn t (t>0) emits (t-1)→(t); turn_idx contiguity
        # within a conversation is a corpus invariant (no adjacency shuffle)
        nsel = batch.filter(pc.greater(batch.column("turn_idx"), pa.scalar(0, pa.int32())))
        prev_uid = turn_uid_array(
            nsel.column("conv_id"), pc.subtract(nsel.column("turn_idx"), pa.scalar(1, pa.int32()))
        )
        tables.append(
            edge_batch(
                prev_uid, nsel.column("turn_uid"), specs.NEXT_TURN, ctx,
                extra_cols={"_sub_id": pc.cast(nsel.column("conv_uid"), pa.string()).combine_chunks()},
            )
        )
        # IN_CONV: the sub-resource edge, every turn
        tables.append(
            edge_batch(
                batch.column("turn_uid"), batch.column("conv_uid"), specs.IN_CONV, ctx,
                extra_cols={"_sub_id": sub},
            )
        )
        return pa.concat_tables(tables)

    turn_edge_ds = turns.map_batches(per_turn_edges, batch_format="pyarrow")

    def alias_of_edges(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.not_equal(batch.column("node"), batch.column("label")))
        # null _sub_id: alias edges span conversations (unscoped cleanup)
        return edge_batch(
            sel.column("node"),
            sel.column("label"),
            specs.ALIAS_OF,
            ctx,
            extra_cols={"_sub_id": pa.nulls(sel.num_rows, pa.string())},
        )

    alias_edge_ds = labels.map_batches(alias_of_edges, batch_format="pyarrow")

    # single mixed edge stream (3 inputs) → ONE spill for the edge side
    edges_union = mention_edge_ds.union(turn_edge_ds, alias_edge_ds)

    return {
        "turns": turns,
        "mentions": resolved,
        "alias_labels": labels,
        "nodes": {
            "Turn": turn_nodes,
            "Conversation": conv_nodes,
            "Entity": entity_nodes,
        },
        "edge_streams": {
            "mention": mention_edge_ds,
            "per_turn": turn_edge_ds,
            "alias": alias_edge_ds,
        },
        "edges_union": edges_union,
        "edges": {
            "MENTIONS": mention_edge_ds.filter(expr="rel_label == 'MENTIONS'"),
            "REFERENCES_TICKET": mention_edge_ds.filter(expr="rel_label == 'REFERENCES_TICKET'"),
            "LINKS_TO": mention_edge_ds.filter(expr="rel_label == 'LINKS_TO'"),
            "USES_TOOL": turn_edge_ds.filter(expr="rel_label == 'USES_TOOL'"),
            "NEXT_TURN": turn_edge_ds.filter(expr="rel_label == 'NEXT_TURN'"),
            "IN_CONV": turn_edge_ds.filter(expr="rel_label == 'IN_CONV'"),
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
    import time

    timings: dict[str, float] = {}
    t0 = time.time()
    g = build_graph(
        transcripts,
        ctx,
        work_dir=work_dir,
        detector_concurrency=detector_concurrency,
        batch_size=batch_size,
        timings=timings,
    )
    timings["build_graph"] = round(time.time() - t0, 2)
    metrics: dict[str, Any] = {"nodes": {}, "edges": {}, "deleted": {}, "timings": timings}

    # all node + edge streams: concurrent spills, one compaction wave
    t0 = time.time()
    stats = store.materialize_many(g["nodes"], g["edge_streams"], ctx)
    timings["materialize"] = round(time.time() - t0, 2)
    for label in g["nodes"]:
        metrics["nodes"][label] = 0
    if len(stats):
        for (kind, label), rows in stats.groupby(["kind", "label"])["rows"].sum().items():
            metrics["nodes" if kind == "nodes" else "edges"][str(label)] = int(rows)

    if cleanup:
        t0 = time.time()
        # sub-resources touched by this run = conversations in the input
        synced = {
            f"conv:{c}" for c in g["turns"].select_columns(["conv_id"]).unique("conv_id")
        }
        # all labels' per-bucket anti-join tasks in flight at once
        metrics["deleted"] = store.cleanup_all(
            ctx,
            node_labels={"Turn": True, "Conversation": False, "Entity": False},
            edge_labels={
                "MENTIONS": True,
                "REFERENCES_TICKET": True,
                "LINKS_TO": True,
                "USES_TOOL": True,
                "NEXT_TURN": True,
                "IN_CONV": True,
                "ALIAS_OF": False,
            },
            synced_sub_ids=synced,
        )
        timings["cleanup"] = round(time.time() - t0, 2)
    return metrics
