"""NodeSpec — declarative node mapping.

Mirrors ``CartographyNodeSchema`` (reference
``cartography/models/core/nodes.py:175-284``): a node type declares a primary
label, a property map (must contain ``id``; ``firstseen``/``lastupdated``
are reserved and stamped by the engine — reference nodes.py:14-70), an
optional sub-resource relationship (tenant/billing-unit edge), optional
other relationships, optional extra labels (conditional supported, as in
reference nodes.py:73-147 / querybuilder.py:486-575), and a
``scoped_cleanup`` flag driving cleanup semantics
(reference cleanupbuilder.py:16-120; see state/store.py here).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace

from cartography_ray.spec.refs import PropertyRef
from cartography_ray.spec.rels import RelSpec

RESERVED_NODE_PROPS = {"firstseen", "lastupdated", "_module_name", "_module_version", "_labels"}


class LabelKind(enum.Enum):
    STANDARD = "STANDARD"
    ONTOLOGY = "ONTOLOGY"
    COMPATIBILITY = "COMPATIBILITY"


@dataclass(frozen=True)
class ExtraNodeLabel:
    """Extra label, optionally conditional on property values.

    ``when`` holds (prop_name, value) pairs ANDed together within a
    declaration; multiple declarations of the same label OR together, and a
    failed condition strips the label (reference querybuilder.py:486-575's
    paired FOREACH add/remove clauses).
    """

    label: str
    kind: LabelKind = LabelKind.STANDARD
    when_conditions: tuple[tuple[str, object], ...] = field(default=())

    def when(self, **conditions: object) -> "ExtraNodeLabel":
        return replace(self, when_conditions=tuple(sorted(conditions.items())))


@dataclass(frozen=True)
class NodeSpec:
    label: str
    properties: tuple[tuple[str, PropertyRef], ...]
    sub_resource_relationship: RelSpec | None = None
    other_relationships: tuple[RelSpec, ...] = field(default=())
    extra_node_labels: tuple[ExtraNodeLabel, ...] = field(default=())
    scoped_cleanup: bool = True
    cascade_delete: bool = False

    @staticmethod
    def make(
        label: str,
        properties: dict[str, PropertyRef],
        **kwargs,
    ) -> "NodeSpec":
        return NodeSpec(label=label, properties=tuple(sorted(properties.items())), **kwargs)

    def prop_dict(self) -> dict[str, PropertyRef]:
        return dict(self.properties)

    def __post_init__(self) -> None:
        props = self.prop_dict()
        if "id" not in props:
            raise ValueError(f"{self.label}: node spec must declare an 'id' property")
        bad = RESERVED_NODE_PROPS & props.keys()
        if bad:
            raise ValueError(f"{self.label}: reserved property names declared: {bad}")
        # reference cleanupbuilder.py:83-89 — sub-resource + unscoped is an error
        if self.sub_resource_relationship is not None and not self.scoped_cleanup:
            raise ValueError(
                f"{self.label}: scoped_cleanup=False is invalid with a sub-resource relationship"
            )

    def all_rels(self) -> tuple[RelSpec, ...]:
        rels = ()
        if self.sub_resource_relationship is not None:
            rels = (self.sub_resource_relationship,)
        return rels + self.other_relationships

    @property
    def cleanup_mode(self) -> str:
        """The reference's cleanup case for this spec
        (cleanupbuilder.py:16-120), as a ``GraphStore.cleanup_all`` mode:

        - sub-resource + scoped (Case 1)  → ``scoped`` (delete stale
          nodes only inside synced sub-resources),
        - no sub-resource + scoped (Case 3) → ``rels_only`` (shared
          nodes are never deleted; only their stale rels are),
        - no sub-resource + unscoped (Case 4) → ``unscoped`` (global
          stale delete). Case 2 (sub-resource + unscoped) is rejected in
          ``__post_init__``.
        """
        if self.sub_resource_relationship is not None:
            return "scoped"
        return "rels_only" if self.scoped_cleanup else "unscoped"
