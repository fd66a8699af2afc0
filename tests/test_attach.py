"""attach_rels matcher modes: exact / ignore_case / one_to_many / fuzzy.

Mirrors the reference's querybuilder matcher semantics
(cartography/graph/querybuilder.py:710-745) including inner-join-drop of
rows whose target node does not exist (864-902).
"""

import pyarrow as pa

from cartography_ray.core.compile import attach_rels, project_rel_candidates
from cartography_ray.core.context import IngestContext
from cartography_ray.spec import LinkDirection, PropertyRef, RelSpec, TargetNodeMatcher

CTX = IngestContext.make(update_tag=7)

TARGETS = pa.table(
    {
        "id": ["n1", "n2", "n3"],
        "email": ["Alice@X.com", "bob@y.com", "carol@z.com"],
        "name": ["Alpha Team", "Beta Squad", "Gamma Group"],
    }
)


def _run(rel, items, ray_session):
    import ray.data

    cand = ray.data.from_arrow(items).map_batches(
        project_rel_candidates(rel, CTX, PropertyRef("src")), batch_format="pyarrow"
    )
    out = attach_rels(cand, TARGETS, rel, CTX).to_pandas()
    return sorted(zip(out["src_id"], out["dst_id"]))


def test_exact_match(ray_session):
    rel = RelSpec(
        rel_label="R",
        target_node_label="T",
        target_node_matcher=TargetNodeMatcher.make(email=PropertyRef("contact")),
    )
    items = pa.table({"src": ["s1", "s2"], "contact": ["bob@y.com", "missing@q.com"]})
    # non-matching rows silently dropped (inner-join semantics)
    assert _run(rel, items, ray_session) == [("s1", "n2")]


def test_ignore_case_match(ray_session):
    rel = RelSpec(
        rel_label="R",
        target_node_label="T",
        target_node_matcher=TargetNodeMatcher.make(
            email=PropertyRef("contact", ignore_case=True)
        ),
    )
    items = pa.table({"src": ["s1"], "contact": ["ALICE@x.COM"]})
    assert _run(rel, items, ray_session) == [("s1", "n1")]


def test_one_to_many_match(ray_session):
    rel = RelSpec(
        rel_label="R",
        target_node_label="T",
        target_node_matcher=TargetNodeMatcher.make(
            id=PropertyRef("node_ids", one_to_many=True)
        ),
    )
    items = pa.table(
        {
            "src": ["s1", "s2"],
            "node_ids": [["n1", "n3"], ["n2"]],
        }
    )
    assert _run(rel, items, ray_session) == [("s1", "n1"), ("s1", "n3"), ("s2", "n2")]


def test_fuzzy_contains_match(ray_session):
    rel = RelSpec(
        rel_label="R",
        target_node_label="T",
        target_node_matcher=TargetNodeMatcher.make(
            name=PropertyRef("word", fuzzy_and_ignore_case=True)
        ),
    )
    items = pa.table({"src": ["s1", "s2"], "word": ["TEAM", "squad"]})
    # target name CONTAINS item value, case-folded
    assert _run(rel, items, ray_session) == [("s1", "n1"), ("s2", "n2")]


def test_inward_direction(ray_session):
    rel = RelSpec(
        rel_label="R",
        target_node_label="T",
        target_node_matcher=TargetNodeMatcher.make(email=PropertyRef("contact")),
        direction=LinkDirection.INWARD,
    )
    items = pa.table({"src": ["s1"], "contact": ["bob@y.com"]})
    # INWARD: (target)-[R]->(node) ⇒ subj is the target
    assert _run(rel, items, ray_session) == [("n2", "s1")]
