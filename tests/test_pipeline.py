"""Integration tests: flagship pipeline semantics on a small corpus.

Mirrors the reference's integration strategy (tests/AGENTS.md in the
reference: run the real sync end-to-end on fake data, assert graph
contents, idempotency across two update tags, and cleanup behavior) —
with parquet tables instead of Neo4j.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cartography_ray.core.context import IngestContext
from cartography_ray.pipelines.kg import build_graph, run_kg_pipeline
from cartography_ray.sources.transcripts import synth_transcripts_table
from cartography_ray.state.store import GraphStore

N_TURNS = 600


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)


def _transcripts(n=N_TURNS):
    import ray.data

    return ray.data.from_arrow(synth_transcripts_table(n))


def test_full_sync_and_invariants(ray_session, tmp_root):
    store = GraphStore(os.path.join(tmp_root, "store"), num_buckets=8)
    ctx = IngestContext.make(update_tag=1000)
    metrics = run_kg_pipeline(
        _transcripts(), store, ctx, work_dir=os.path.join(tmp_root, "work")
    )
    assert metrics["nodes"]["Turn"] > 0
    assert metrics["edges"]["MENTIONS"] > 0

    # per-turn text equality invariant under (conv_id, turn_idx) ordering
    turns_out = store.read_nodes("Turn").to_pandas()
    src = synth_transcripts_table(N_TURNS).to_pandas()
    a = turns_out.sort_values(["conv_id", "turn_idx"])["text"].tolist()
    b = src.sort_values(["conv_id", "turn_idx"])["text"].tolist()
    assert a == b

    # lineage stamped everywhere
    assert set(turns_out["lastupdated"]) == {1000}
    assert set(turns_out["firstseen"]) == {1000}
    assert set(turns_out["_module_name"]) == {"cartography_ray"}

    # conditional extra labels: tool turns get ToolTurn
    tool_rows = turns_out[turns_out["role"] == "tool"]
    assert (tool_rows["_labels"] == "Turn;Utterance;ToolTurn").all()
    non_tool = turns_out[turns_out["role"] != "tool"]
    assert (non_tool["_labels"] == "Turn;Utterance").all()

    # conversation n_turns exact (combiner + MERGE-as-max, no shuffle)
    convs = store.read_nodes("Conversation").to_pandas()
    true_counts = src.groupby("conv_id").size()
    got = dict(zip(convs["conv_id"], convs["n_turns"]))
    assert got == true_counts.to_dict()

    # edges reference existing nodes (inner-join drop semantics)
    entities = set(store.read_nodes("Entity").column("id").to_pylist())
    mentions = store.read_edges("MENTIONS")
    assert set(mentions.column("dst_id").to_pylist()) <= entities


def test_entry_triples_precision_recall(ray_session):
    """The north rule's correctness pin: the flagship pipeline's emitted
    (subj, pred, obj) triples must hold P ≥ 0.95 AND R ≥ 0.95 against
    the frozen golden triple set (tests/fixtures/golden_triples_sf0001.
    parquet — the sf0.001 output captured at a commit where every KG
    oracle hash-matched its independent DuckDB twin). entry() returns
    exactly this query, so this is the driver-entry P/R gate; today the
    sets are identical (P = R = 1.0) and the assertion leaves the
    rule's 5% semantic-drift margin before it fires."""
    import os

    import pyarrow.parquet as pq

    from cartography_ray.pipelines.queries import q_kg_triples

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "golden_triples_sf0001.parquet")
    golden = pq.read_table(fix).to_pandas()
    got = q_kg_triples("/root/testdata/sf0.001").to_pandas()
    g_set = set(map(tuple, golden[["subj", "pred", "obj"]].itertuples(index=False)))
    o_set = set(map(tuple, got[["subj", "pred", "obj"]].itertuples(index=False)))
    assert o_set, "pipeline emitted no triples"
    tp = len(o_set & g_set)
    precision = tp / len(o_set)
    recall = tp / len(g_set)
    assert precision >= 0.95, f"triple precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"triple recall {recall:.4f} < 0.95"


def test_idempotent_rerun_same_tag(ray_session, tmp_root):
    store = GraphStore(os.path.join(tmp_root, "store"), num_buckets=8)
    ctx = IngestContext.make(update_tag=1000)
    run_kg_pipeline(_transcripts(300), store, ctx, work_dir=os.path.join(tmp_root, "w1"))
    first = store.read_nodes("Turn").to_pandas().sort_values(["id"]).reset_index(drop=True)
    # rerun with same tag, fresh work dir → byte-identical store
    run_kg_pipeline(_transcripts(300), store, ctx, work_dir=os.path.join(tmp_root, "w2"))
    second = store.read_nodes("Turn").to_pandas().sort_values(["id"]).reset_index(drop=True)
    assert first.equals(second)


def test_two_epoch_upsert_and_cleanup(ray_session, tmp_root):
    """Epoch 2 re-syncs a subset of conversations: stale turns of re-synced
    conversations are deleted (scoped), untouched conversations survive,
    firstseen is write-once."""
    import ray.data

    store = GraphStore(os.path.join(tmp_root, "store"), num_buckets=8)
    full = synth_transcripts_table(300)
    ctx1 = IngestContext.make(update_tag=1000)
    run_kg_pipeline(
        ray.data.from_arrow(full), store, ctx1, work_dir=os.path.join(tmp_root, "e1")
    )
    turns1 = store.read_nodes("Turn").to_pandas()

    convs = sorted(set(full.column("conv_id").to_pylist()))
    resync = convs[: len(convs) // 2]
    # epoch 2: same conversations but drop each conversation's LAST turn
    pdf = full.to_pandas()
    pdf = pdf[pdf["conv_id"].isin(resync)]
    last = pdf.groupby("conv_id")["turn_idx"].transform("max")
    subset = pdf[pdf["turn_idx"] < last]
    ctx2 = IngestContext.make(update_tag=2000)
    run_kg_pipeline(
        ray.data.from_arrow(pa.Table.from_pandas(subset, preserve_index=False)),
        store,
        ctx2,
        work_dir=os.path.join(tmp_root, "e2"),
    )
    turns2 = store.read_nodes("Turn").to_pandas()

    # dropped last turns of re-synced conversations are gone (stale+scoped)
    gone = set(
        "turn:%s:%d" % (c, t)
        for c, t in pdf[pdf["turn_idx"] == last][["conv_id", "turn_idx"]].itertuples(index=False)
    )
    assert gone and gone.isdisjoint(set(turns2["id"]))
    # untouched conversations survive with epoch-1 tag
    untouched = turns2[~turns2["conv_id"].isin(resync)]
    assert len(untouched) == len(turns1[~turns1["conv_id"].isin(resync)])
    assert set(untouched["lastupdated"]) == {1000}
    # re-synced rows: lastupdated bumped, firstseen preserved (write-once)
    resynced = turns2[turns2["conv_id"].isin(resync)]
    assert set(resynced["lastupdated"]) == {2000}
    assert set(resynced["firstseen"]) == {1000}


def test_cleanup_membership_is_distributed(ray_session, tmp_root):
    """VERDICT r03 item 1: the scoped-cleanup membership must be a
    hash-bucketed Parquet side table consumed per-bucket by the cleanup
    tasks — never a driver-resident set[str] of conv ids + ray.put
    broadcast (conversations scale with the corpus)."""
    import glob as g

    import pyarrow.parquet as pq

    import cartography_ray.pipelines.kg as kgmod

    # the driver-union helpers are gone from the module
    assert not hasattr(kgmod, "_collect_synced")
    assert not hasattr(kgmod, "_synced_convs")

    store = GraphStore(os.path.join(tmp_root, "store"), num_buckets=8)
    work = os.path.join(tmp_root, "work")
    run_kg_pipeline(_transcripts(300), store, IngestContext.make(update_tag=1000), work_dir=work)

    # membership side table exists, is hash-bucketed, and covers every conv
    files = sorted(g.glob(os.path.join(work, "membership", "bucket=*", "*.parquet")))
    assert files, "conv sweep must write bucketed membership parquet"
    member = set()
    for f in files:
        member.update(pq.read_table(f).column("sub_id").to_pylist())
    src_convs = {f"conv:{c}" for c in set(synth_transcripts_table(300).column("conv_id").to_pylist())}
    assert member == src_convs

    # bucket assignment matches the store's stable_bucket (cleanup tasks
    # rely on this to prune which membership files they read)
    from cartography_ray.state.store import stable_bucket

    for f in files:
        k = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        got = stable_bucket(pq.read_table(f).column("sub_id"), 8).to_pylist()
        assert set(got) == {k}


def test_label_spill_strategy_matches_broadcast(ray_session, tmp_root):
    """VERDICT r03 item 7: above the broadcast limit the alias-label map
    must flow through a Parquet side table + spill tasks instead of a
    driver-side collect. Forcing limit=0 must produce a store byte-equal
    to the default broadcast path."""
    ctx = IngestContext.make(update_tag=1000)

    store_a = GraphStore(os.path.join(tmp_root, "sa"), num_buckets=8)
    run_kg_pipeline(_transcripts(300), store_a, ctx, work_dir=os.path.join(tmp_root, "wa"))

    store_b = GraphStore(os.path.join(tmp_root, "sb"), num_buckets=8)
    run_kg_pipeline(
        _transcripts(300), store_b, ctx,
        work_dir=os.path.join(tmp_root, "wb"), label_broadcast_limit=0,
    )
    # the forced run actually took the side-table path
    assert os.path.isdir(os.path.join(tmp_root, "wb", "labels_side"))

    assert store_a.node_labels() == store_b.node_labels()
    assert store_a.edge_labels() == store_b.edge_labels()
    for label in store_a.node_labels():
        a = store_a.read_nodes(label).to_pandas().sort_values("id").reset_index(drop=True)
        b = store_b.read_nodes(label).to_pandas().sort_values("id").reset_index(drop=True)
        assert a.equals(b), f"node label {label} diverged"
    for rel in store_a.edge_labels():
        cols = ["src_id", "dst_id"]
        a = store_a.read_edges(rel).to_pandas().sort_values(cols).reset_index(drop=True)
        b = store_b.read_edges(rel).to_pandas().sort_values(cols).reset_index(drop=True)
        assert a.equals(b), f"edge label {rel} diverged"


def test_resume_skips_done_buckets(ray_session, tmp_root):
    """Kill-rerun: buckets finished in a partial run are skipped on resume
    and the final store equals a clean one-shot run."""
    import ray.data

    tbl = synth_transcripts_table(300)
    ctx = IngestContext.make(update_tag=1000)

    clean_store = GraphStore(os.path.join(tmp_root, "clean"), num_buckets=8)
    run_kg_pipeline(ray.data.from_arrow(tbl), clean_store, ctx, work_dir=os.path.join(tmp_root, "wc"))

    # simulate a partial run: materialize Turn nodes only, then "crash";
    # delete some bucket manifests to simulate unfinished buckets
    resumed_store = GraphStore(os.path.join(tmp_root, "resumed"), num_buckets=8)
    g = build_graph(ray.data.from_arrow(tbl), ctx, work_dir=os.path.join(tmp_root, "wr"))
    resumed_store.materialize_nodes("Turn", g["nodes"]["Turn"], ctx)
    done_before = resumed_store.done_buckets("nodes", "Turn", 1000)
    assert done_before
    # drop two buckets' manifests+files → those must be rebuilt
    for b in sorted(done_before)[:2]:
        shutil.rmtree(os.path.join(resumed_store.root, "nodes", "Turn", f"bucket={b}"))

    run_kg_pipeline(
        ray.data.from_arrow(tbl), resumed_store, ctx, work_dir=os.path.join(tmp_root, "wr2")
    )
    a = clean_store.read_nodes("Turn").to_pandas().sort_values("id").reset_index(drop=True)
    b = resumed_store.read_nodes("Turn").to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)
    # manifests present for every bucket with rows
    assert len(resumed_store.manifests("nodes", "Turn")) == len(
        resumed_store.done_buckets("nodes", "Turn", 1000)
    )


def test_canonicalization_transitive(ray_session):
    """name→user→alt chains resolve to one root (2+ propagation rounds)."""
    import ray.data

    from cartography_ray.stages.canonicalize import connected_components

    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": ["name:u1", "user:u1", "user:alt1", "name:zz"],
                "b": ["user:u1", "user:alt1", "user:aaa1", "user:zz"],
            }
        )
    )
    labels = {r["node"]: r["label"] for r in connected_components(edges, num_partitions=4).take_all()}
    chain = {"name:u1", "user:u1", "user:alt1", "user:aaa1"}
    roots = {labels[n] for n in chain}
    assert roots == {"name:u1"}
    assert labels["user:zz"] == "name:zz"


def test_resolve_keys_join_strategy_matches_broadcast(ray_session):
    """The scale fallback (distributed hash_join resolve, VERDICT r02 item
    1) must produce byte-identical resolution to the broadcast path."""
    import ray.data

    from cartography_ray.stages.canonicalize import connected_components, resolve_keys

    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": ["name:u1", "user:u1", "user:alt1", "name:zz"],
                "b": ["user:u1", "user:alt1", "user:aaa1", "user:zz"],
            }
        )
    )
    labels = connected_components(edges, num_partitions=4).materialize()
    keys = ["user:alt1", "user:aaa1", "user:zz", "user:unaliased", "name:u1"]
    ds = ray.data.from_arrow(
        pa.table({"entity_key": pa.array(keys, pa.string()), "i": list(range(len(keys)))})
    )

    def run(strategy):
        rows = resolve_keys(ds, labels, strategy=strategy).take_all()
        return {r["i"]: r["entity_id"] for r in rows}

    broadcast = run("broadcast")
    joined = run("join")
    assert broadcast == joined
    assert broadcast[3] == "user:unaliased"  # identity for unaliased keys
    assert broadcast[0] == broadcast[1] == broadcast[4] == "name:u1"


def test_partial_resync_preserves_shared_nodes(ray_session, tmp_root):
    """ADVICE regression: re-syncing a SUBSET of conversations must not
    delete Conversation/Entity nodes other conversations still reference
    (reference Case-3 rel-only cleanup for shared nodes), and no edge may
    dangle afterwards."""
    import ray.data

    store = GraphStore(os.path.join(tmp_root, "store"), num_buckets=8)
    full = synth_transcripts_table(600)
    run_kg_pipeline(
        ray.data.from_arrow(full), store, IngestContext.make(update_tag=1000),
        work_dir=os.path.join(tmp_root, "e1"),
    )
    convs1 = set(store.read_nodes("Conversation").column("id").to_pylist())
    ents1 = set(store.read_nodes("Entity").column("id").to_pylist())

    pdf = full.to_pandas()
    resync = sorted(set(pdf["conv_id"]))[: len(set(pdf["conv_id"])) // 2]
    subset = pdf[pdf["conv_id"].isin(resync)]
    run_kg_pipeline(
        ray.data.from_arrow(pa.Table.from_pandas(subset, preserve_index=False)),
        store, IngestContext.make(update_tag=2000),
        work_dir=os.path.join(tmp_root, "e2"),
    )
    convs2 = set(store.read_nodes("Conversation").column("id").to_pylist())
    ents2 = set(store.read_nodes("Entity").column("id").to_pylist())
    assert convs2 == convs1          # shared nodes preserved
    assert ents1 <= ents2 or ents2 == ents1

    # no dangling endpoints anywhere
    turns = set(store.read_nodes("Turn").column("id").to_pylist())
    for rel, src_pool, dst_pool in [
        ("IN_CONV", turns, convs2),
        ("MENTIONS", turns, ents2),
        ("ALIAS_OF", ents2, ents2),
        ("NEXT_TURN", turns, turns),
    ]:
        e = store.read_edges(rel)
        assert set(e.column("src_id").to_pylist()) <= src_pool, rel
        assert set(e.column("dst_id").to_pylist()) <= dst_pool, rel
