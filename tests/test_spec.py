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


def test_ontology_handlers():
    """All 8 special handlers against reference formulas
    (querybuilder.py:24-318)."""
    import pyarrow as pa

    from cartography_ray.stages.ontology import (
        OntFieldMapping,
        OntNodeMapping,
        project_ontology_fields,
    )

    tbl = pa.table(
        {
            "flag": pa.array([True, False, None], pa.bool_()),
            "sflag": pa.array(["true", "FALSE", "meh"], pa.string()),
            "num": pa.array([0, 3, None], pa.int64()),
            "seg": pa.array(["A", "B", "Z"], pa.string()),
            "alt": pa.array([None, "alt-b", "alt-z"], pa.string()),
        }
    )
    mapping = OntNodeMapping(
        node_label="T",
        fields=(
            OntFieldMapping("copy", "seg"),
            OntFieldMapping("inv", "flag", handler="invert_boolean"),
            OntFieldMapping("tob", "sflag", handler="to_boolean"),
            OntFieldMapping("eq", "seg", handler="equal_boolean", extra={"values": ["A", "B"]}),
            OntFieldMapping("stat", "", handler="static_value", extra={"value": "x"}),
            OntFieldMapping("orb", "flag", handler="or_boolean", extra={"fields": ["num"]}),
            OntFieldMapping("norb", "flag", handler="nor_boolean", extra={"fields": ["num"]}),
            OntFieldMapping("map", "seg", handler="mapping", extra={"map": {"A": "a1", "B": "b1"}}),
            OntFieldMapping("coal", "alt", handler="coalesce", extra={"fields": ["seg"]}),
        ),
    )
    out = project_ontology_fields(mapping)(tbl)
    get = lambda c: out.column(c).to_pylist()  # noqa: E731
    assert get("_ont_copy") == ["A", "B", "Z"]
    # NOT(coalesce(toBooleanOrNull(x), false))
    assert get("_ont_inv") == [False, True, True]
    # coalesce(toBooleanOrNull(x), x IS NOT NULL): "meh" → not convertible → True (non-null)
    assert get("_ont_tob") == [True, False, True]
    assert get("_ont_eq") == [True, True, False]
    assert get("_ont_stat") == ["x", "x", "x"]
    # flag OR bool(num): [T or F, F or T, F or F]
    assert get("_ont_orb") == [True, True, False]
    assert get("_ont_norb") == [False, False, True]
    assert get("_ont_map") == ["a1", "b1", None]
    assert get("_ont_coal") == ["A", "alt-b", "alt-z"]


def test_ontology_consolidation(ray_session):
    """First-source-wins per-field merge + required-field drop
    (intel/ontology/utils.py:44-81)."""
    import pyarrow as pa
    import ray.data

    from cartography_ray.stages.ontology import (
        OntFieldMapping,
        OntNodeMapping,
        consolidate_sources,
        extract_ont_rows,
    )

    m = OntNodeMapping(
        node_label="S",
        fields=(
            OntFieldMapping("id", "uid", required=True),
            OntFieldMapping("email", "mail"),
            OntFieldMapping("team", "team"),
        ),
    )
    a = ray.data.from_arrow(
        pa.table(
            {
                "uid": ["u1", "u2", None],
                "mail": ["a@x", None, "dropped@x"],
                "team": [None, "t2", "t3"],
            }
        )
    ).map_batches(extract_ont_rows(m), batch_format="pyarrow")
    b = ray.data.from_arrow(
        pa.table(
            {
                "uid": ["u1", "u2", "u9"],
                "mail": ["SHOULD-LOSE@x", "b@x", "c@x"],
                "team": ["ta", None, "t9"],
            }
        )
    ).map_batches(extract_ont_rows(m), batch_format="pyarrow")
    out = (
        consolidate_sources([a, b], "id")
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    assert list(out.index) == ["u1", "u2", "u9"]   # null-uid row dropped
    assert out.loc["u1", "email"] == "a@x"         # source A wins
    assert out.loc["u1", "team"] == "ta"           # B fills A's gap
    assert out.loc["u2", "email"] == "b@x"
    assert out.loc["u2", "team"] == "t2"
    assert out.loc["u9", "email"] == "c@x"
