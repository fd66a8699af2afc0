"""Sync composition, dependency gating, JSON analysis-job directory."""

import json
import os

import pyarrow as pa
import pytest

from cartography_ray.core.context import IngestContext
from cartography_ray.state.store import GraphStore


def test_sync_stage_ordering_and_replacement(tmp_path):
    from cartography_ray.sync import Sync

    store = GraphStore(str(tmp_path / "s"))
    ctx = IngestContext.make(update_tag=1)
    calls = []
    sync = Sync("t")
    sync.add_stages(
        [
            ("a", lambda st, c, cfg: calls.append("a")),
            ("b", lambda st, c, cfg: calls.append("b")),
        ]
    )
    sync.add_stage("a", lambda st, c, cfg: calls.append("a2"))  # replace keeps slot
    sync.run(store, ctx)
    assert calls == ["a2", "b"]

    with pytest.raises(ValueError, match="unknown sync stage"):
        from cartography_ray.sync import build_sync

        build_sync("kg,nope")


def test_two_stage_sync_kg_plus_json_analysis(ray_session, tmp_path):
    """build_sync('kg,analysis'): full KG sync composes with a drop-in
    JSON analysis job directory (reference sync.py:588-632 +
    intel/analysis.py:12-45)."""
    import ray.data

    from cartography_ray.sources.transcripts import synth_transcripts_table
    from cartography_ray.sync import build_sync

    jobs = tmp_path / "jobs"
    jobs.mkdir()
    (jobs / "flag_tools.json").write_text(
        json.dumps(
            {
                "name": "flag-tools",
                "statements": [
                    {
                        "node_label": "Entity",
                        "match": {"column": "kind", "op": "eq", "value": "tool"},
                        "effects": [
                            {"type": "set_property", "prop": "is_tool", "value": True},
                            {"type": "add_to_set", "prop": "tags", "value": "tooling"},
                        ],
                    }
                ],
            }
        )
    )
    store = GraphStore(str(tmp_path / "store"), num_buckets=8)
    ctx = IngestContext.make(update_tag=500)
    sync = build_sync("kg,analysis")
    assert sync.stage_names() == ["kg", "analysis"]
    results = sync.run(
        store,
        ctx,
        {
            "transcripts": ray.data.from_arrow(synth_transcripts_table(300)),
            "work_dir": str(tmp_path / "work"),
            "analysis_job_directory": str(jobs),
        },
    )
    assert results["kg"]["nodes"]["Turn"] > 0
    assert results["analysis"]["flag_tools.json"]["flag-tools.0.matched"] > 0
    ents = store.read_nodes("Entity").to_pandas()
    tools = ents[ents["kind"] == "tool"]
    others = ents[ents["kind"] != "tool"]
    assert (tools["is_tool"] == True).all()  # noqa: E712
    assert tools["tags"].map(lambda v: list(v) == ["tooling"]).all()
    assert others["is_tool"].isna().all()


def test_dependency_gating(ray_session, tmp_path):
    """run_analysis_and_ensure_deps skips unless every dependency was a
    requested sync (reference util.py:145-236)."""
    import ray.data

    from cartography_ray.stages.analysis import AnalysisJob, AnalysisStatement, SetProperty
    from cartography_ray.sync import run_analysis_and_ensure_deps

    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    ctx = IngestContext.make(update_tag=7)
    store.materialize_nodes(
        "N",
        ray.data.from_arrow(
            pa.table(
                {
                    "id": ["x"],
                    "lastupdated": pa.array([7], pa.int64()),
                    "firstseen": pa.array([7], pa.int64()),
                }
            )
        ),
        ctx,
    )
    job = AnalysisJob(
        "gated",
        (AnalysisStatement("N", None, (SetProperty("seen", value=True),)),),
    )
    skipped = run_analysis_and_ensure_deps(job, {"aws:ec2", "aws:iam"}, {"aws:ec2"}, store, ctx)
    assert skipped is None
    assert "seen" not in store.read_nodes("N").column_names

    ran = run_analysis_and_ensure_deps(job, {"aws:ec2"}, {"aws:ec2", "aws:iam"}, store, ctx)
    assert ran is not None and ran["gated.0.matched"] == 1
    assert store.read_nodes("N").to_pandas()["seen"].iloc[0] == True  # noqa: E712


def test_json_match_combinators(tmp_path, ray_session):
    import ray.data

    from cartography_ray.sync import job_from_json
    from cartography_ray.stages.analysis import run_analysis_job

    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    ctx = IngestContext.make(update_tag=9)
    store.materialize_nodes(
        "U",
        ray.data.from_arrow(
            pa.table(
                {
                    "id": ["a", "b", "c"],
                    "age": pa.array([10, 20, 30], pa.int64()),
                    "mail": ["x@corp.io", "y@corp.io", None],
                    "lastupdated": pa.array([9] * 3, pa.int64()),
                    "firstseen": pa.array([9] * 3, pa.int64()),
                }
            )
        ),
        ctx,
    )
    job = job_from_json(
        {
            "name": "combo",
            "statements": [
                {
                    "node_label": "U",
                    "match": {
                        "all": [
                            {"column": "age", "op": "ge", "value": 20},
                            {
                                "any": [
                                    {"column": "mail", "op": "endswith", "value": "corp.io"},
                                    {"column": "mail", "op": "is_null"},
                                ]
                            },
                        ]
                    },
                    "effects": [{"type": "set_property", "prop": "hit", "value": 1}],
                }
            ],
        }
    )
    m = run_analysis_job(job, store, ctx)
    assert m["combo.0.matched"] == 2  # b (endswith) and c (null mail)


def test_module_sync_metadata(ray_session, tmp_path):
    """merge_module_sync_metadata analogue (reference util.py:362-428):
    MERGE by composite id, firstseen write-once, SyncMetadata extra label."""
    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    store.merge_module_sync_metadata(IngestContext.make(update_tag=1), "AWSAccount", 123, "S3Bucket")
    store.merge_module_sync_metadata(IngestContext.make(update_tag=2), "AWSAccount", 123, "S3Bucket")
    store.merge_module_sync_metadata(IngestContext.make(update_tag=2), "AWSAccount", 999, "S3Bucket")
    out = store.read_nodes("ModuleSyncMetadata").to_pandas().set_index("id").sort_index()
    assert len(out) == 2
    row = out.loc["AWSAccount_123_S3Bucket"]
    assert row["lastupdated"] == 2 and row["firstseen"] == 1
    assert row["_labels"] == "ModuleSyncMetadata;SyncMetadata"


def test_error_classification_filter(ray_session):
    """aws_handle_regions analogue (reference util.py:652-760): classified
    errors → empty batch; transient errors retried; real bugs re-raise."""
    import pyarrow as pa
    import pytest
    import ray.data

    from cartography_ray.ops.errors import SourceAccessError, handle_source_errors

    schema = pa.schema([("v", pa.int64())])
    attempts = {"n": 0}

    @handle_source_errors(schema, backoff_base=0.01)
    def fetch(batch: pa.Table) -> pa.Table:
        region = batch.column("region")[0].as_py()
        if region == "denied":
            raise SourceAccessError("AccessDenied for region")
        if region == "denied_by_code":
            raise RuntimeError("An error occurred (UnauthorizedOperation) ...")
        if region == "flaky":
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise ConnectionError("reset")
        if region == "broken":
            raise ValueError("real bug")
        return pa.table({"v": pa.array([len(region)], pa.int64())})

    ds = ray.data.from_items(
        [{"region": r} for r in ["us-east-1", "denied", "denied_by_code", "flaky"]]
    ).repartition(4)
    out = ds.map_batches(fetch, batch_format="pyarrow").to_pandas()
    assert sorted(out["v"]) == [5, 9]   # flaky(5 after retries) + us-east-1(9)

    bad = ray.data.from_items([{"region": "broken"}])
    with pytest.raises(Exception, match="real bug"):
        bad.map_batches(fetch, batch_format="pyarrow").materialize()


def test_config_driven_specs(tmp_path):
    """NodeSpec/RelSpec compiled from a JSON mapping document (reference
    config-driven permission_relationships.yaml surface)."""
    import json

    from cartography_ray.spec.config import node_spec_from_json

    doc = {
        "label": "Server",
        "properties": {"id": "hostname", "os": {"name": "os_name"}},
        "extra_node_labels": [
            {"label": "Asset"},
            {"label": "LinuxBox", "when": {"os": "linux"}},
        ],
        "scoped_cleanup": False,
        "other_relationships": [
            {
                "rel_label": "RUNS_ON",
                "target_node_label": "Host",
                "direction": "INWARD",
                "target_node_matcher": {"name": {"name": "host_name", "ignore_case": True}},
                "properties": {"port": "port"},
            }
        ],
    }
    p = tmp_path / "server.json"
    p.write_text(json.dumps(doc))
    spec = node_spec_from_json(str(p))
    assert spec.label == "Server" and spec.scoped_cleanup is False
    assert spec.prop_dict()["os"].name == "os_name"
    assert [e.label for e in spec.extra_node_labels] == ["Asset", "LinuxBox"]
    assert spec.extra_node_labels[1].when_conditions == (("os", "linux"),)
    rel = spec.other_relationships[0]
    assert rel.rel_label == "RUNS_ON" and rel.direction.value == "INWARD"
    assert rel.target_node_matcher.as_dict()["name"].ignore_case is True


def test_three_stage_sync_with_docs_module(ray_session, tmp_path):
    """kg + docs modules compose in one sync over one store (the
    reference's multi-module graph); Document nodes + DUPLICATE_OF edges
    land beside the KG tables with the same lineage tags."""
    import pyarrow as pa
    import ray.data

    from cartography_ray.sources.transcripts import synth_transcripts_table
    from cartography_ray.sync import build_sync

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["same  text", "same text", "unique one", "SAME TEXT"],
        }
    )
    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    ctx = IngestContext.make(update_tag=700)
    results = build_sync("kg,docs").run(
        store,
        ctx,
        {
            "transcripts": ray.data.from_arrow(synth_transcripts_table(200)),
            "documents": ray.data.from_arrow(docs),
            "work_dir": str(tmp_path / "work"),
        },
    )
    assert results["kg"]["nodes"]["Turn"] > 0
    assert results["docs"]["nodes"]["Document"] == 4
    d = store.read_nodes("Document").to_pandas()
    assert set(d["lastupdated"]) == {700}
    e = store.read_edges("DUPLICATE_OF").to_pandas()
    # docs 1 and 3 normalize to doc 0's text → keeper is doc:0
    assert set(zip(e["src_id"], e["dst_id"])) == {("doc:1", "doc:0"), ("doc:3", "doc:0")}
    # both modules share the store: KG tables still present
    assert store.read_nodes("Turn") is not None


def test_module_auto_discovery(ray_session, tmp_path):
    """Reference-parity naming-convention discovery: every module in
    cartography_ray.modules exporting start_<name>_ingestion is found,
    analysis is pinned last, a broken module is skipped without blocking
    the others, and the discovered sync actually runs end-to-end."""
    import pyarrow as pa
    import ray.data

    from cartography_ray.sources.transcripts import synth_transcripts_table
    from cartography_ray.sync import build_sync_discovered, discover_modules

    mods = discover_modules()
    assert set(mods) == {"kg", "docs", "analysis"}
    assert list(mods)[-1] == "analysis"

    # import-failure tolerance: a package with one broken module still
    # yields the healthy ones (reference logs + skips)
    import sys

    pkg = tmp_path / "fake_intel"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "good.py").write_text(
        "def start_good_ingestion(store, ctx, config):\n    return 'ok'\n"
    )
    (pkg / "broken.py").write_text("import does_not_exist_xyz\n")
    # name-mismatch tolerance: bound anyway, like the reference
    (pkg / "odd.py").write_text(
        "def start_misnamed_ingestion(store, ctx, config):\n    return 'odd'\n"
    )
    sys.path.insert(0, str(tmp_path))
    try:
        fake = discover_modules("fake_intel")
    finally:
        sys.path.remove(str(tmp_path))
    assert fake["good"](None, None, {}) == "ok"
    assert fake["odd"](None, None, {}) == "odd"
    assert "broken" not in fake

    # the discovered composition runs end-to-end over one store
    docs = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()), "text": ["a text", "b text"]}
    )
    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    results = build_sync_discovered().run(
        store,
        IngestContext.make(update_tag=701),
        {
            "transcripts": ray.data.from_arrow(synth_transcripts_table(150)),
            "documents": ray.data.from_arrow(docs),
            "work_dir": str(tmp_path / "work"),
            "analysis_job_directory": "",
        },
    )
    assert results["kg"]["nodes"]["Turn"] > 0
    assert results["docs"]["nodes"]["Document"] == 2
    assert store.read_nodes("Turn") is not None


def test_stats_client_scoping_and_backends(ray_session, tmp_path):
    """Reference stats parity: scoped prefixes compose, disabled = no-op,
    the memory backend records a real sync's stage timers/counters, and
    the UDP backend emits statsd line protocol a real socket receives."""
    import socket

    import ray.data

    from cartography_ray.sources.transcripts import synth_transcripts_table
    from cartography_ray.stats import (
        MemoryBackend,
        UdpStatsdBackend,
        get_stats_client,
        set_stats_backend,
    )
    from cartography_ray.sync import build_sync

    # scoping + disabled no-op
    set_stats_backend(None)
    c = get_stats_client("a").get_stats_client("b")
    assert not c.is_enabled()
    c.incr("x")  # must not raise while disabled

    # memory backend through a REAL sync run
    mem = MemoryBackend()
    set_stats_backend(mem)
    try:
        store = GraphStore(str(tmp_path / "store"), num_buckets=4)
        build_sync("kg").run(
            store,
            IngestContext.make(update_tag=901),
            {
                "transcripts": ray.data.from_arrow(synth_transcripts_table(120)),
                "work_dir": str(tmp_path / "work"),
            },
        )
        kinds = {(k, s) for k, s, _ in mem.events}
        assert ("ms", "sync.kg.kg") in kinds          # stage timer fired
        assert ("c", "sync.kg.kg.runs") in kinds      # stage counter fired
        assert any(s.startswith("kg.nodes.") for k, s, _ in mem.events if k == "c")
        assert mem.counters()["sync.kg.kg.runs"] == 1
    finally:
        set_stats_backend(None)

    # UDP backend: real datagrams, statsd line protocol
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    srv.settimeout(5)
    port = srv.getsockname()[1]
    set_stats_backend(UdpStatsdBackend("127.0.0.1", port))
    try:
        s = get_stats_client("kg")
        s.incr("nodes.Turn", 7)
        s.gauge("queue_depth", 3)
        s.timing("detect", 1.5)
        got = sorted(srv.recv(512).decode() for _ in range(3))
        assert got == [
            "kg.detect:1500.000|ms",
            "kg.nodes.Turn:7|c",
            "kg.queue_depth:3|g",
        ]
    finally:
        set_stats_backend(None)
        srv.close()
