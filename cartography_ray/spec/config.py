"""Config-driven spec mappings — NodeSpec/RelSpec from JSON/dict files.

The reference's user-extension surface includes CONFIG-file-driven
mappings (``--permission-relationships-file`` +
``cartography/data/permission_relationships.yaml``, loaded by
``cartography/intel/aws/permission_relationships.py``) and the
declarative model-authoring path (``docs/root/dev/
writing-intel-modules.md:142-206``). This module is the analogue: a
plain JSON/dict document compiles into the same ``NodeSpec`` /
``RelSpec`` dataclasses the code-authored path uses, so mappings can
ship as data files without touching Python.

Document shape::

    {
      "label": "Server",
      "properties": {"id": "hostname", "os": {"name": "os_name"}},
      "extra_node_labels": [
        {"label": "Asset"},
        {"label": "Linux", "when": {"os": "linux"}}
      ],
      "scoped_cleanup": false,
      "sub_resource_relationship": { ... rel doc ... },
      "other_relationships": [
        {
          "rel_label": "RUNS_ON",
          "target_node_label": "Host",
          "direction": "INWARD",
          "target_node_matcher": {"name": {"name": "host_name",
                                           "ignore_case": true}},
          "properties": {"port": "port"}
        }
      ]
    }

Property values are either a bare string (column name) or a dict of
``PropertyRef`` fields (``name``, ``set_in_kwargs``, ``ignore_case``,
``fuzzy_and_ignore_case``, ``one_to_many``, ``extra_index``).
"""

from __future__ import annotations

import json

from cartography_ray.spec.nodes import ExtraNodeLabel, LabelKind, NodeSpec
from cartography_ray.spec.refs import PropertyRef
from cartography_ray.spec.rels import (
    LinkDirection,
    RelSpec,
    SourceNodeMatcher,
    TargetNodeMatcher,
)


def _ref(spec) -> PropertyRef:
    if isinstance(spec, str):
        return PropertyRef(spec)
    if isinstance(spec, dict):
        return PropertyRef(**spec)
    raise ValueError(f"invalid PropertyRef spec: {spec!r}")


def _props(doc: dict | None) -> dict[str, PropertyRef]:
    return {k: _ref(v) for k, v in (doc or {}).items()}


def rel_spec_from_dict(doc: dict) -> RelSpec:
    tm = TargetNodeMatcher.make(**_props(doc["target_node_matcher"]))
    sm = doc.get("source_node_matcher")
    return RelSpec(
        rel_label=doc["rel_label"],
        target_node_label=doc["target_node_label"],
        target_node_matcher=tm,
        direction=LinkDirection[doc.get("direction", "OUTWARD")],
        properties=tuple(sorted(_props(doc.get("properties")).items())),
        source_node_label=doc.get("source_node_label"),
        source_node_matcher=SourceNodeMatcher.make(**_props(sm)) if sm else None,
    )


def node_spec_from_dict(doc: dict) -> NodeSpec:
    extra = []
    for e in doc.get("extra_node_labels", []):
        lbl = ExtraNodeLabel(e["label"], LabelKind[e.get("kind", "STANDARD")])
        if e.get("when"):
            lbl = lbl.when(**e["when"])
        extra.append(lbl)
    sub = doc.get("sub_resource_relationship")
    return NodeSpec.make(
        doc["label"],
        _props(doc["properties"]),
        sub_resource_relationship=rel_spec_from_dict(sub) if sub else None,
        other_relationships=tuple(
            rel_spec_from_dict(r) for r in doc.get("other_relationships", [])
        ),
        extra_node_labels=tuple(extra),
        scoped_cleanup=bool(doc.get("scoped_cleanup", True)),
        cascade_delete=bool(doc.get("cascade_delete", False)),
    )


def node_spec_from_json(path: str) -> NodeSpec:
    return node_spec_from_dict(json.load(open(path)))
