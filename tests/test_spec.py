"""Unit tests for the spec layer + compiler (no Ray session needed).

Mirrors the reference's querybuilder unit-test strategy
(tests/unit/cartography/graph/test_querybuilder_simple.py in the
reference): build a small schema, run the compiled plan over a fixed item
batch, assert the exact output (golden outputs instead of golden Cypher).
"""

import pyarrow as pa
import pytest

from cartography_ray.core.compile import project_nodes, project_rel_candidates
from cartography_ray.core.context import IngestContext
from cartography_ray.spec import (
    ExtraNodeLabel,
    NodeSpec,
    PropertyRef,
    RelSpec,
    TargetNodeMatcher,
)

CTX = IngestContext.make(update_tag=111, TENANT="t1")

SIMPLE = NodeSpec.make(
    "Thing",
    {
        "id": PropertyRef("thing_id"),
        "name": PropertyRef("name"),
        "tenant": PropertyRef("TENANT", set_in_kwargs=True),
    },
    scoped_cleanup=False,
    extra_node_labels=(
        ExtraNodeLabel("Base"),
        ExtraNodeLabel("Hot").when(temp="high"),
    ),
)


def test_node_projection_golden():
    batch = pa.table(
        {
            "thing_id": [1, 2],
            "name": ["a", "b"],
            "temp": ["high", "low"],
        }
    )
    out = project_nodes(SIMPLE, CTX)(batch)
    assert out.column("id").to_pylist() == ["1", "2"]
    assert out.column("name").to_pylist() == ["a", "b"]
    assert out.column("tenant").to_pylist() == ["t1", "t1"]  # kwarg broadcast
    assert out.column("lastupdated").to_pylist() == [111, 111]
    assert out.column("firstseen").to_pylist() == [111, 111]
    assert out.column("_module_name").to_pylist()[0] == "cartography_ray"
    assert out.column("_labels").to_pylist() == ["Thing;Base;Hot", "Thing;Base"]


def test_node_spec_validation():
    with pytest.raises(ValueError, match="must declare an 'id'"):
        NodeSpec.make("X", {"name": PropertyRef("n")})
    with pytest.raises(ValueError, match="reserved"):
        NodeSpec.make("X", {"id": PropertyRef("i"), "lastupdated": PropertyRef("l")})


def test_scoped_cleanup_subresource_conflict():
    rel = RelSpec(
        rel_label="R",
        target_node_label="T",
        target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("tid")),
    )
    with pytest.raises(ValueError, match="scoped_cleanup"):
        NodeSpec.make(
            "X",
            {"id": PropertyRef("i")},
            sub_resource_relationship=rel,
            scoped_cleanup=False,
        )


def test_rel_candidates_modes():
    rel = RelSpec(
        rel_label="KNOWS",
        target_node_label="Person",
        target_node_matcher=TargetNodeMatcher.make(
            email=PropertyRef("contact", ignore_case=True)
        ),
        properties=(("weight", PropertyRef("w")),),
    )
    batch = pa.table({"src": ["s1"], "contact": ["Bob@X.COM"], "w": [0.5]})
    out = project_rel_candidates(rel, CTX, PropertyRef("src"))(batch)
    assert out.column("src_id").to_pylist() == ["s1"]
    assert out.column("_match_email").to_pylist() == ["bob@x.com"]  # lowered
    assert out.column("weight").to_pylist() == [0.5]


def test_one_to_many_matcher_flag():
    ref = PropertyRef("ids", one_to_many=True)
    assert ref.match_mode == "one_to_many"
    with pytest.raises(ValueError):
        PropertyRef("x", fuzzy_and_ignore_case=True, one_to_many=True)
