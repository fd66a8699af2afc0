"""Documents → dedup-graph module — the second composable sync stage.

Demonstrates the reference's multi-module sync composition
(cartography/sync.py:588-632: independent intel modules write into one
graph) with a genuinely different domain: the ``documents`` corpus loads
as ``Document`` nodes and exact-duplicate clusters become
``DUPLICATE_OF`` edges (member → keeper, deterministic min-id keeper —
the ``functions/dedup.exact_dedup`` semantics expressed as graph
structure). Composes with the KG pipeline through ``sync.build_sync
("kg,docs,analysis")`` — same store, same update-tag lineage, same
cleanup semantics.

Scale notes: one pass projects nodes (stateless ``map_batches``); the
duplicate edges need one hash-bucketed groupby on the normalized-text
fingerprint (all members of a cluster co-locate; the keeper is the
in-group min id). Text is projected away immediately — only
fingerprints shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cartography_ray.core.compile import edge_batch, project_nodes
from cartography_ray.core.context import IngestContext
from cartography_ray.functions.text import normalize_text_array
from cartography_ray.spec import NodeSpec, PropertyRef, RelSpec, TargetNodeMatcher
from cartography_ray.state.store import GraphStore

DOCUMENT_NODE = NodeSpec.make(
    "Document",
    {
        "id": PropertyRef("doc_uid"),
        "doc_id": PropertyRef("doc_id"),
        "fingerprint": PropertyRef("fingerprint"),
        "n_chars": PropertyRef("n_chars"),
    },
    # corpus-wide table, no sub-resource ⇒ Case-4 global stale delete
    scoped_cleanup=False,
)

DUPLICATE_OF = RelSpec(
    rel_label="DUPLICATE_OF",
    target_node_label="Document",
    target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("keeper_uid")),
)


def _prep(batch: pa.Table) -> pa.Table:
    import hashlib

    ids = pc.cast(batch.column("doc_id"), pa.int64())
    uid = pc.binary_join_element_wise(
        pa.array(["doc"] * batch.num_rows, pa.string()), pc.cast(ids, pa.string()), ":"
    )
    norm = normalize_text_array(batch.column("text"))
    fps = pa.array(
        [hashlib.md5(t.encode()).hexdigest() if t is not None else None for t in norm.to_pylist()],
        pa.string(),
    )
    return pa.table(
        {
            "doc_uid": uid,
            "doc_id": ids,
            "fingerprint": fps,  # md5 of normalized text — only 32B shuffles
            "n_chars": pc.utf8_length(pc.cast(batch.column("text"), pa.string())),
        }
    )


def doc_nodes(ds, ctx: IngestContext):
    """Document node stream (stateless projection)."""
    project = project_nodes(DOCUMENT_NODE, ctx)
    return ds.map_batches(_prep, batch_format="pyarrow").map_batches(
        project, batch_format="pyarrow"
    )


def duplicate_edges(ds, ctx: IngestContext, num_buckets: int = 64):
    """(member)-[DUPLICATE_OF]->(keeper) edges per exact-duplicate cluster.

    One hash-bucket groupby on the fingerprint; within each partition one
    vectorized pass finds per-fingerprint min ids (keepers) and emits an
    edge for every non-keeper member.
    """
    from cartography_ray.runtime import drop_empty_blocks

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(b["fingerprint"].astype(str).to_numpy(), categorize=False)
        return b.assign(__fb=(h % num_buckets).astype(np.int64))

    def emit(group: pd.DataFrame) -> pa.Table:
        keeper = group.groupby("fingerprint", sort=False)["doc_id"].transform("min")
        dup = group[group["doc_id"] != keeper]
        keeper_ids = keeper[group["doc_id"] != keeper]
        return edge_batch(
            pa.array("doc:" + dup["doc_id"].astype(str), pa.string()),
            pa.array("doc:" + keeper_ids.astype(str), pa.string()),
            DUPLICATE_OF,
            ctx,
        )

    from cartography_ray.functions.dedup import _corpus_bytes
    from cartography_ray.runtime import shuffle_partitions

    parts = shuffle_partitions(n_bytes=_corpus_bytes(ds))
    prepped = ds.map_batches(_prep, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pandas"
    )
    return drop_empty_blocks(
        drop_empty_blocks(prepped)
        .groupby("__fb", num_partitions=parts)
        .map_groups(emit, batch_format="pandas")
    )


def run_docs_pipeline(documents, store: GraphStore, ctx: IngestContext, cleanup: bool = True) -> dict:
    """Sync the documents module into the store: Document nodes +
    DUPLICATE_OF edges, MERGE semantics, update-tag cleanup."""
    n_stats = store.materialize_nodes("Document", doc_nodes(documents, ctx), ctx)
    e_stats = store.materialize_edges("DUPLICATE_OF", duplicate_edges(documents, ctx), ctx)
    metrics = {
        "nodes": {"Document": int(n_stats["rows"].sum()) if len(n_stats) else 0},
        "edges": {"DUPLICATE_OF": int(e_stats["rows"].sum()) if len(e_stats) else 0},
        "deleted": {},
    }
    if cleanup:
        metrics["deleted"] = {
            "Document": store.cleanup_nodes("Document", ctx, scoped=False),
            "DUPLICATE_OF": store.cleanup_edges("DUPLICATE_OF", ctx, scoped=False),
        }
    return metrics
