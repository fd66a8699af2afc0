"""Tests: matchlink loaders, analysis-effect DSL, drift detection, rules."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from cartography_ray.core.context import IngestContext
from cartography_ray.spec import PropertyRef, RelSpec, SourceNodeMatcher, TargetNodeMatcher
from cartography_ray.state.store import GraphStore


def test_load_matchlinks(ray_session, tmp_path):
    import ray.data

    from cartography_ray.ops.matchlink import load_matchlinks

    ctx = IngestContext.make(update_tag=5)
    rel = RelSpec(
        rel_label="ASSUMES",
        target_node_label="Role",
        target_node_matcher=TargetNodeMatcher.make(arn=PropertyRef("role_arn")),
        source_node_label="Instance",
        source_node_matcher=SourceNodeMatcher.make(iid=PropertyRef("instance_id")),
    )
    sources = pa.table({"id": ["i1", "i2"], "iid": ["inst-1", "inst-2"]})
    targets = pa.table({"id": ["r1"], "arn": ["arn:role/x"]})
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "instance_id": ["inst-1", "inst-2", "inst-9"],
                "role_arn": ["arn:role/x", "arn:role/missing", "arn:role/x"],
            }
        )
    )
    out = load_matchlinks(
        pairs, sources, targets, rel, ctx,
        source_key="instance_id", target_key="role_arn",
        sub_resource_label="Account", sub_resource_id="acct-1",
    ).to_pandas()
    # only the fully-matching pair survives (inner-join drop both sides)
    assert list(zip(out["src_id"], out["dst_id"])) == [("i1", "r1")]
    assert set(out["_sub_resource_label"]) == {"Account"}
    assert set(out["_sub_resource_id"]) == {"acct-1"}
    assert set(out["lastupdated"]) == {5}


def test_matchlink_endpoint_scoping(ray_session):
    """Two-tenant store (VERDICT r02 item 6): identical pair keys in
    different tenants must NOT cross-link when endpoint scoping is on;
    a table without the membership column is a spec error."""
    import ray.data

    from cartography_ray.ops.matchlink import load_matchlinks

    ctx = IngestContext.make(update_tag=7)
    rel = RelSpec(
        rel_label="ASSUMES",
        target_node_label="Role",
        target_node_matcher=TargetNodeMatcher.make(arn=PropertyRef("role_arn")),
        source_node_label="Instance",
        source_node_matcher=SourceNodeMatcher.make(iid=PropertyRef("instance_id")),
    )
    # same business keys exist in BOTH tenants, different node ids
    sources = pa.table(
        {
            "id": ["i-a", "i-b"],
            "iid": ["inst-1", "inst-1"],
            "_sub_id": ["acct-a", "acct-b"],
        }
    )
    targets = pa.table(
        {
            "id": ["r-a", "r-b"],
            "arn": ["arn:role/x", "arn:role/x"],
            "_sub_id": ["acct-a", "acct-b"],
        }
    )
    pairs = ray.data.from_arrow(
        pa.table({"instance_id": ["inst-1"], "role_arn": ["arn:role/x"]})
    )
    out = load_matchlinks(
        pairs, sources, targets, rel, ctx,
        source_key="instance_id", target_key="role_arn",
        sub_resource_label="Account", sub_resource_id="acct-a",
        scope_endpoints=True,
    ).to_pandas()
    # only tenant-a endpoints link; no cross-tenant (i-a→r-b etc.) edge
    assert list(zip(out["src_id"], out["dst_id"])) == [("i-a", "r-a")]

    with pytest.raises(ValueError, match="no '_sub_id' column"):
        load_matchlinks(
            pairs, sources.drop_columns(["_sub_id"]), targets, rel, ctx,
            source_key="instance_id", target_key="role_arn",
            sub_resource_label="Account", sub_resource_id="acct-a",
            scope_endpoints=True,
        )


def test_matchlink_cartesian(ray_session):
    from cartography_ray.ops.matchlink import matchlink_cartesian

    ctx = IngestContext.make(update_tag=5)
    rel = RelSpec(
        rel_label="CAN_REACH",
        target_node_label="T",
        target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("id")),
        source_node_label="S",
        source_node_matcher=SourceNodeMatcher.make(id=PropertyRef("id")),
    )
    out = matchlink_cartesian(
        ["a", "b", "a"], ["x", "y"], rel, ctx, "Tenant", "t1"
    ).to_pandas()
    # dedup preserving order: a,b × x,y = 4 pairs
    assert len(out) == 4
    assert set(zip(out["src_id"], out["dst_id"])) == {
        ("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
    }
    with pytest.raises(ValueError, match="too large"):
        matchlink_cartesian(["a"] , ["x"], rel, ctx, "T", "t", max_pairs=0)


def test_analysis_job_effects(ray_session, tmp_path):
    import ray.data

    from cartography_ray.stages.analysis import (
        AddRelationship,
        AnalysisJob,
        AnalysisStatement,
        SetProperty,
        run_analysis_job,
    )

    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    ctx1 = IngestContext.make(update_tag=100)
    users = pa.table(
        {
            "id": ["u1", "u2"],
            "email": ["a@x.com", "b@y.com"],
            "lastupdated": pa.array([100, 100], pa.int64()),
            "firstseen": pa.array([100, 100], pa.int64()),
        }
    )
    devices = pa.table(
        {
            "id": ["d1", "d2"],
            "owner_email": ["a@x.com", "nobody@z.com"],
            "lastupdated": pa.array([100, 100], pa.int64()),
            "firstseen": pa.array([100, 100], pa.int64()),
        }
    )
    store.materialize_nodes("User", ray.data.from_arrow(users), ctx1)
    store.materialize_nodes("Device", ray.data.from_arrow(devices), ctx1)

    job = AnalysisJob(
        name="link-users",
        statements=(
            AnalysisStatement(
                node_label="User",
                match=lambda df: df["email"].str.endswith("x.com"),
                effects=(SetProperty("is_corp", value=True),),
            ),
            AnalysisStatement(
                node_label="Device",
                match=None,
                effects=(
                    AddRelationship(
                        rel_label="OWNED_BY",
                        target_label="User",
                        source_key="owner_email",
                        target_key="email",
                    ),
                ),
            ),
        ),
    )
    ctx2 = IngestContext.make(update_tag=200)
    metrics = run_analysis_job(job, store, ctx2)
    assert metrics["link-users.0.matched"] == 1
    assert metrics["link-users.1.rels_added"] == 1

    users_out = store.read_nodes("User").to_pandas().set_index("id")
    assert users_out.loc["u1", "is_corp"] == True  # noqa: E712
    assert pd.isna(users_out.loc["u2", "is_corp"]) or users_out.loc["u2", "is_corp"] is None
    # only touched rows get the new tag (incremental gating)
    assert users_out.loc["u1", "lastupdated"] == 200
    assert users_out.loc["u2", "lastupdated"] == 100

    edges = store.read_edges("OWNED_BY").to_pandas()
    assert list(zip(edges["src_id"], edges["dst_id"])) == [("d1", "u1")]


def test_analysis_add_relationship_distributed_join(ray_session, tmp_path):
    """broadcast_limit=0 forces the hash_join path (VERDICT r02 item 2):
    the target table is never collected on the driver, and the resulting
    edges are identical to the broadcast path."""
    import ray.data

    from cartography_ray.stages.analysis import (
        AddRelationship,
        AnalysisJob,
        AnalysisStatement,
        run_analysis_job,
    )

    def build(root):
        store = GraphStore(str(root), num_buckets=4)
        ctx1 = IngestContext.make(update_tag=100)
        n = 50
        users = pa.table(
            {
                "id": [f"u{i}" for i in range(n)],
                "email": [f"user{i}@x.com" for i in range(n)],
                "lastupdated": pa.array([100] * n, pa.int64()),
                "firstseen": pa.array([100] * n, pa.int64()),
            }
        )
        devices = pa.table(
            {
                "id": [f"d{i}" for i in range(n)],
                # half the devices point at an existing user
                "owner_email": [
                    f"user{i}@x.com" if i % 2 == 0 else f"ghost{i}@z.com" for i in range(n)
                ],
                "lastupdated": pa.array([100] * n, pa.int64()),
                "firstseen": pa.array([100] * n, pa.int64()),
            }
        )
        store.materialize_nodes("User", ray.data.from_arrow(users), ctx1)
        store.materialize_nodes("Device", ray.data.from_arrow(devices), ctx1)
        return store

    job = AnalysisJob(
        name="own",
        statements=(
            AnalysisStatement(
                node_label="Device",
                match=None,
                effects=(
                    AddRelationship(
                        rel_label="OWNED_BY", target_label="User",
                        source_key="owner_email", target_key="email",
                    ),
                ),
            ),
        ),
    )
    ctx2 = IngestContext.make(update_tag=200)
    s_b = build(tmp_path / "broadcast")
    m_b = run_analysis_job(job, s_b, ctx2)             # default: broadcast
    s_j = build(tmp_path / "join")
    m_j = run_analysis_job(job, s_j, ctx2, broadcast_limit=0)  # forced join
    assert m_b["own.0.rels_added"] == m_j["own.0.rels_added"] == 25
    eb = sorted(zip(*[s_b.read_edges("OWNED_BY").to_pandas()[c] for c in ("src_id", "dst_id")]))
    ej = sorted(zip(*[s_j.read_edges("OWNED_BY").to_pandas()[c] for c in ("src_id", "dst_id")]))
    assert eb == ej and len(eb) == 25


def test_analysis_incremental_on(ray_session, tmp_path):
    """incremental_on (reference IncrementalMatch): the statement touches
    ONLY rows stamped with the current update tag; rows from earlier
    syncs are left untouched."""
    import ray.data

    from cartography_ray.stages.analysis import (
        AnalysisJob,
        AnalysisStatement,
        SetProperty,
        run_analysis_job,
    )

    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    store.materialize_nodes(
        "User",
        ray.data.from_arrow(
            pa.table(
                {
                    "id": ["u1", "u2"],
                    "email": ["a@x.com", "b@x.com"],
                    "lastupdated": pa.array([100, 100], pa.int64()),
                    "firstseen": pa.array([100, 100], pa.int64()),
                }
            )
        ),
        IngestContext.make(update_tag=100),
    )
    # second epoch re-syncs ONLY u2 (u1 keeps lastupdated=100)
    store.materialize_nodes(
        "User",
        ray.data.from_arrow(
            pa.table(
                {
                    "id": ["u2"],
                    "email": ["b@x.com"],
                    "lastupdated": pa.array([200], pa.int64()),
                    "firstseen": pa.array([200], pa.int64()),
                }
            )
        ),
        IngestContext.make(update_tag=200),
    )
    job = AnalysisJob(
        name="inc",
        statements=(
            AnalysisStatement(
                node_label="User",
                match=lambda df: df["email"].str.endswith("x.com"),
                effects=(SetProperty("flagged", value=True),),
                incremental_on=True,
            ),
        ),
    )
    metrics = run_analysis_job(job, store, IngestContext.make(update_tag=200))
    assert metrics["inc.0.matched"] == 1  # only the tag-200 row
    out = store.read_nodes("User").to_pandas().set_index("id")
    assert out.loc["u2", "flagged"] == True  # noqa: E712
    assert pd.isna(out.loc["u1", "flagged"]) or out.loc["u1", "flagged"] is None


def test_drift_detection(tmp_path):
    from cartography_ray.functions.drift import capture_state, detect_drift

    df1 = pd.DataFrame({"id": ["a", "b", "c"], "v": [1, 2, 3]})
    df2 = pd.DataFrame({"id": ["b", "c", "d"], "v": [2, 30, 4]})
    p1 = capture_state(df1, str(tmp_path / "s1.json"), "q", ["id", "v"])
    p2 = capture_state(df2, str(tmp_path / "s2.json"), "q", ["id", "v"])
    drift = detect_drift(p1, p2)
    assert ("a", "1") in drift["missing"]
    assert ("c", "3") in drift["missing"]
    assert ("c", "30") in drift["new"]
    assert ("d", "4") in drift["new"]
    assert ("b", "2") not in drift["new"] and ("b", "2") not in drift["missing"]


def test_drift_registry_lifecycle(tmp_path):
    """Multi-state directory flow (reference get_states walk +
    add_shortcut + archive): register → capture_all → shortcuts →
    detect via aliases → archive drops the state and its aliases."""
    from cartography_ray.functions.drift import DriftRegistry

    reg = DriftRegistry(str(tmp_path / "drift"))
    reg.register_query("exposed_ports", ["id", "port"])
    reg.register_query("admin_users", ["id"])
    assert reg.queries() == ["admin_users", "exposed_ports"]

    data1 = {
        "exposed_ports": pd.DataFrame({"id": ["a", "b"], "port": [22, 443]}),
        "admin_users": pd.DataFrame({"id": ["u1"]}),
    }
    cap1 = reg.capture_all(lambda tpl: data1[tpl["name"]], filename="t1.json")
    assert cap1 == {"admin_users": "t1.json", "exposed_ports": "t1.json"}
    reg.add_shortcut("exposed_ports", "baseline", "most-recent")  # alias→alias resolves

    data2 = {
        "exposed_ports": pd.DataFrame({"id": ["b", "c"], "port": [443, 8080]}),
        "admin_users": pd.DataFrame({"id": ["u1", "u2"]}),
    }
    reg.capture_all(lambda tpl: data2[tpl["name"]], filename="t2.json")
    assert reg.states("exposed_ports") == ["t1.json", "t2.json"]

    drift = reg.detect("exposed_ports", start="baseline")  # end=most-recent
    assert ("a", "22") in drift["missing"]
    assert ("c", "8080") in drift["new"]
    assert reg.detect("admin_users", start="t1.json", end="t2.json")["new"] == [("u2",)]

    # archive the old state: gone from states(), aliases dropped
    reg.archive("exposed_ports", "baseline")
    assert reg.states("exposed_ports") == ["t2.json"]
    with pytest.raises(FileNotFoundError):
        reg.resolve("exposed_ports", "baseline")
    assert reg.detect("exposed_ports", "most-recent", "most-recent")["new"] == []


def test_rules_fact_validation():
    from cartography_ray.rules import Fact, Rule, run_fact, run_rules

    good = Fact("counts", "row count", ("n",), lambda: pd.DataFrame({"n": [3]}))
    bad = Fact("broken", "wrong cols", ("missing_col",), lambda: pd.DataFrame({"n": [3]}))
    res = run_fact(good)
    assert res["rows"] == 1
    with pytest.raises(ValueError, match="missing from result"):
        run_fact(bad)
    out = run_rules([Rule("r1", (good,))])
    assert out[0]["facts"][0]["fact"] == "counts"


def test_matchlink_two_epoch_cleanup(ray_session, tmp_path):
    """Matchlink edges expire scoped by _sub_resource_label/_sub_resource_id
    rel props (reference cleanupbuilder.py:603-667): re-sync without a pair
    deletes that pair's edge; other sub-resources' edges survive."""
    import ray.data

    from cartography_ray.ops.matchlink import load_matchlinks
    from cartography_ray.spec import PropertyRef, RelSpec, SourceNodeMatcher, TargetNodeMatcher

    rel = RelSpec(
        rel_label="ASSUMES",
        target_node_label="Role",
        target_node_matcher=TargetNodeMatcher.make(arn=PropertyRef("role_arn")),
        source_node_label="Instance",
        source_node_matcher=SourceNodeMatcher.make(iid=PropertyRef("instance_id")),
    )
    sources = pa.table({"id": ["i1", "i2", "i3"], "iid": ["inst-1", "inst-2", "inst-3"]})
    targets = pa.table({"id": ["r1", "r2"], "arn": ["arn:x", "arn:y"]})
    store = GraphStore(str(tmp_path / "store"), num_buckets=4)

    def load(pairs_tbl, ctx, acct):
        edges = load_matchlinks(
            ray.data.from_arrow(pairs_tbl), sources, targets, rel, ctx,
            source_key="instance_id", target_key="role_arn",
            sub_resource_label="Account", sub_resource_id=acct,
        )
        store.materialize_edges("ASSUMES", edges, ctx)

    ctx1 = IngestContext.make(update_tag=10)
    load(pa.table({"instance_id": ["inst-1", "inst-2"], "role_arn": ["arn:x", "arn:y"]}), ctx1, "acct-1")
    load(pa.table({"instance_id": ["inst-3"], "role_arn": ["arn:x"]}), ctx1, "acct-2")

    # epoch 2: acct-1 re-syncs WITHOUT the (inst-2, arn:y) pair
    ctx2 = IngestContext.make(update_tag=20)
    load(pa.table({"instance_id": ["inst-1"], "role_arn": ["arn:x"]}), ctx2, "acct-1")
    deleted = store.cleanup_matchlinks("ASSUMES", ctx2, "Account", "acct-1")
    assert deleted == 1
    out = store.read_edges("ASSUMES").to_pandas()
    keys = set(zip(out["src_id"], out["dst_id"]))
    assert keys == {("i1", "r1"), ("i3", "r1")}  # acct-2 edge untouched


def test_cascade_delete(ray_session, tmp_path):
    """Cascade delete (reference cleanupbuilder.py:309-334): stale children
    reachable via the ownership rel die with their stale parent; re-parented
    (freshly-tagged) children survive; edges referencing deleted nodes are
    detached."""
    import ray.data

    from cartography_ray.core.compile import edge_batch
    from cartography_ray.spec import PropertyRef, RelSpec, TargetNodeMatcher

    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    rel = RelSpec(
        rel_label="OWNS",
        target_node_label="Child",
        target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("id")),
    )
    ctx1 = IngestContext.make(update_tag=10)

    def nodes(ids, tag):
        return pa.table(
            {
                "id": ids,
                "lastupdated": pa.array([tag] * len(ids), pa.int64()),
                "firstseen": pa.array([tag] * len(ids), pa.int64()),
            }
        )

    store.materialize_nodes("Parent", ray.data.from_arrow(nodes(["p1", "p2"], 10)), ctx1)
    store.materialize_nodes("Child", ray.data.from_arrow(nodes(["c1", "c2", "c3"], 10)), ctx1)
    own = edge_batch(
        pa.array(["p1", "p1", "p2"], pa.string()), pa.array(["c1", "c3", "c2"], pa.string()), rel, ctx1
    )
    store.materialize_edges("OWNS", ray.data.from_arrow(own), ctx1)

    # epoch 2: only p2+c2 re-synced, c3 re-parented under p2 (fresh tag)
    ctx2 = IngestContext.make(update_tag=20)
    store.materialize_nodes("Parent", ray.data.from_arrow(nodes(["p2"], 20)), ctx2)
    store.materialize_nodes("Child", ray.data.from_arrow(nodes(["c2", "c3"], 20)), ctx2)
    own2 = edge_batch(
        pa.array(["p2", "p2"], pa.string()), pa.array(["c2", "c3"], pa.string()), rel, ctx2
    )
    store.materialize_edges("OWNS", ray.data.from_arrow(own2), ctx2)

    res = store.cleanup_cascade(
        "Parent", "Child", "OWNS", ctx2, detach_edge_labels=["OWNS"]
    )
    assert res["parent"] == 1          # p1 stale → deleted
    assert res["child"] == 1           # c1 stale child of p1 → deleted
    parents = set(store.read_nodes("Parent").column("id").to_pylist())
    children = set(store.read_nodes("Child").column("id").to_pylist())
    assert parents == {"p2"}
    assert children == {"c2", "c3"}    # c3 survived (re-parented, fresh tag)
    edges = store.read_edges("OWNS").to_pandas()
    assert "p1" not in set(edges["src_id"])  # detached
    assert "c1" not in set(edges["dst_id"])


def test_analysis_effect_dsl_and_cleanup(ray_session, tmp_path):
    """Full effect DSL: SetProperties, AddToSet, Case values, ScopeById,
    SetRelationshipProperty(if_missing) — and the auto-generated effect
    cleanup (stale _eff_* sidecars → property nulled, stale effect edges
    deleted)."""
    import ray.data

    from cartography_ray.stages.analysis import (
        AddRelationship,
        AddToSet,
        AnalysisJob,
        AnalysisStatement,
        Case,
        ScopeById,
        SetProperties,
        SetProperty,
        SetRelationshipProperty,
        cleanup_analysis_job,
        run_analysis_job,
    )

    store = GraphStore(str(tmp_path / "store"), num_buckets=4)
    ctx1 = IngestContext.make(update_tag=100)
    users = pa.table(
        {
            "id": ["u1", "u2", "u3"],
            "email": ["a@x.com", "b@y.com", "c@x.com"],
            "_sub_id": ["t1", "t2", "t1"],
            "lastupdated": pa.array([100] * 3, pa.int64()),
            "firstseen": pa.array([100] * 3, pa.int64()),
        }
    )
    devices = pa.table(
        {
            "id": ["d1"],
            "owner_email": ["a@x.com"],
            "lastupdated": pa.array([100], pa.int64()),
            "firstseen": pa.array([100], pa.int64()),
        }
    )
    store.materialize_nodes("User", ray.data.from_arrow(users), ctx1)
    store.materialize_nodes("Device", ray.data.from_arrow(devices), ctx1)

    job = AnalysisJob(
        name="enrich",
        statements=(
            AnalysisStatement(
                node_label="User",
                match=lambda df: df["email"].str.endswith("x.com"),
                scope=ScopeById("t1"),
                effects=(
                    SetProperties.make(
                        domain=Case(
                            whens=((lambda df: df["email"].str.endswith("x.com"), "corp"),),
                            default="other",
                        ),
                        checked=True,
                    ),
                    AddToSet("tags", value="reviewed"),
                ),
            ),
            AnalysisStatement(
                node_label="Device",
                match=None,
                effects=(
                    AddRelationship("OWNED_BY", "User", "owner_email", "email"),
                    SetRelationshipProperty("OWNED_BY", "via", value="email", if_missing=True),
                ),
            ),
        ),
    )
    ctx2 = IngestContext.make(update_tag=200)
    m = run_analysis_job(job, store, ctx2)
    assert m["enrich.0.matched"] == 2          # u1, u3 (t1 scope + x.com)
    out = store.read_nodes("User").to_pandas().set_index("id")
    assert out.loc["u1", "domain"] == "corp" and out.loc["u3", "domain"] == "corp"
    assert out.loc["u1", "checked"] == True  # noqa: E712
    assert out.loc["u1", "tags"] == ["reviewed"]
    assert pd.isna(out.loc["u2", "domain"]) or out.loc["u2", "domain"] is None
    # AddToSet is idempotent-dedup: rerun appends nothing
    run_analysis_job(job, store, IngestContext.make(update_tag=201))
    out = store.read_nodes("User").to_pandas().set_index("id")
    assert out.loc["u1", "tags"] == ["reviewed"]
    edges = store.read_edges("OWNED_BY").to_pandas()
    assert list(zip(edges["src_id"], edges["dst_id"])) == [("d1", "u1")]
    assert list(edges["via"]) == ["email"]

    # effect cleanup: epoch 3 runs a job whose match no longer hits u3 and
    # whose device statement is gone → u3's derived props expire, edge dies
    job3 = AnalysisJob(
        name="enrich",
        statements=(
            AnalysisStatement(
                node_label="User",
                match=lambda df: df["id"] == "u1",
                effects=(
                    SetProperties.make(domain="corp", checked=True),
                    AddToSet("tags", value="reviewed"),
                ),
            ),
            AnalysisStatement(
                node_label="Device",
                match=lambda df: df["id"] == "none",
                effects=(AddRelationship("OWNED_BY", "User", "owner_email", "email"),),
            ),
        ),
    )
    ctx3 = IngestContext.make(update_tag=300)
    run_analysis_job(job3, store, ctx3)
    cm = cleanup_analysis_job(job3, store, ctx3)
    out = store.read_nodes("User").to_pandas().set_index("id")
    assert out.loc["u1", "domain"] == "corp"              # re-applied → kept
    assert pd.isna(out.loc["u3", "domain"])               # stale effect → nulled
    assert out.loc["u3", "tags"] is None or (not isinstance(out.loc["u3", "tags"], list))
    assert cm["edges_cleaned.OWNED_BY"] == 1              # stale edge expired
    e = store.read_edges("OWNED_BY")
    assert e is None or len(e) == 0


def test_rules_frameworks_findings_formatters():
    """Framework mappings (case-insensitive match), rule filtering,
    Finding parsing (extra columns), JSON/table formatters."""
    from cartography_ray.rules import (
        Fact,
        Framework,
        Rule,
        format_json,
        format_table,
        run_rules,
    )

    fw = Framework("CIS AWS Foundations Benchmark", "CIS", "5.1.8", scope="AWS", revision="5.0")
    assert fw.matches("cis") and fw.matches("CIS", scope="aws") and not fw.matches("nist")

    fact = Fact(
        "open_things", "things that are open", ("id", "port"),
        lambda: pd.DataFrame({"id": ["a"], "port": [22], "note": ["ssh"]}),
        id="fact-1",
    )
    r1 = Rule("open-rule", (fact,), id="R1", tags=("network",), frameworks=(fw,))
    r2 = Rule("other-rule", (fact,), id="R2")
    assert r1.has_framework("cis", scope="aws") and not r2.has_framework("cis")
    assert r1.get_fact_by_id("FACT-1") is fact

    out = run_rules([r1, r2], framework="cis", with_findings=True)
    assert [o["rule"] for o in out] == ["open-rule"]      # filtered by framework
    finding = out[0]["facts"][0]["findings"][0]
    assert finding.values == {"id": "a", "port": 22}
    assert finding.extra == {"note": "ssh"}               # undeclared column

    js = format_json(out)
    assert '"rule": "open-rule"' in js and '"port": 22' in js
    tbl = format_table(out)
    assert "open-rule" in tbl and "open_things" in tbl
