"""RelSpec — declarative relationship mapping.

Mirrors ``CartographyRelSchema`` (reference
``cartography/models/core/relationships.py:262-427``): an edge type declares
its label, the target node label, a ``TargetNodeMatcher`` (the join key of
edge creation), a direction (metadata, not a different algorithm —
reference relationships.py:13-27), and optional edge properties.

MatchLink-style specs additionally declare a source label + matcher
(reference relationships.py:330-427): the pair table is joined against
BOTH endpoint node tables and only pairs whose endpoints exist produce
edges (inner-join drop semantics, reference querybuilder.py:864-902).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from cartography_ray.spec.refs import PropertyRef


class LinkDirection(enum.Enum):
    INWARD = "INWARD"    # (target)-[rel]->(node)
    OUTWARD = "OUTWARD"  # (node)-[rel]->(target)


@dataclass(frozen=True)
class TargetNodeMatcher:
    """Target-node property name → PropertyRef on the item (the join key)."""

    keys: tuple[tuple[str, PropertyRef], ...]

    @staticmethod
    def make(**kwargs: PropertyRef) -> "TargetNodeMatcher":
        return TargetNodeMatcher(tuple(sorted(kwargs.items())))

    def as_dict(self) -> dict[str, PropertyRef]:
        return dict(self.keys)


@dataclass(frozen=True)
class SourceNodeMatcher(TargetNodeMatcher):
    @staticmethod
    def make(**kwargs: PropertyRef) -> "SourceNodeMatcher":
        return SourceNodeMatcher(tuple(sorted(kwargs.items())))


@dataclass(frozen=True)
class RelSpec:
    rel_label: str
    target_node_label: str
    target_node_matcher: TargetNodeMatcher
    direction: LinkDirection = LinkDirection.OUTWARD
    properties: tuple[tuple[str, PropertyRef], ...] = field(default=())
    # MatchLink extension: both endpoints matched against existing nodes.
    source_node_label: str | None = None
    source_node_matcher: SourceNodeMatcher | None = None

    def prop_dict(self) -> dict[str, PropertyRef]:
        return dict(self.properties)

    @property
    def is_matchlink(self) -> bool:
        return self.source_node_label is not None

    def __post_init__(self) -> None:
        if not self.target_node_matcher.keys:
            raise ValueError(f"{self.rel_label}: empty target matcher")
        reserved = {"firstseen", "lastupdated", "_module_name", "_module_version"}
        bad = reserved & {k for k, _ in self.properties}
        if bad:
            raise ValueError(f"{self.rel_label}: reserved rel property names {bad}")
