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
