"""Node/relationship specs for the transcript knowledge graph.

The declarative layer a user writes — the analogue of a Cartography model
file (e.g. reference cartography/models/aws/ec2/instances.py): each node
type is a NodeSpec whose PropertyRefs name columns produced by the
extraction stages; sub-resource scoping hangs every Turn off its
Conversation exactly as Cartography hangs resources off AWSAccount
(reference cartography/models/core/nodes.py:221-247).
"""

from __future__ import annotations

from cartography_ray.spec import (
    ExtraNodeLabel,
    LinkDirection,
    NodeSpec,
    PropertyRef,
    RelSpec,
    TargetNodeMatcher,
)

IN_CONV = RelSpec(
    rel_label="IN_CONV",
    target_node_label="Conversation",
    target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("conv_uid")),
    direction=LinkDirection.OUTWARD,
)

CONVERSATION_NODE = NodeSpec.make(
    "Conversation",
    {
        "id": PropertyRef("conv_uid"),
        "conv_id": PropertyRef("conv_id"),
        "n_turns": PropertyRef("n_turns"),
    },
    # no sub-resource + scoped_cleanup=True ⇒ reference Case 3 (rel-only
    # cleanup): Conversation nodes are SHARED across syncs and are never
    # deleted by a partial re-sync — only their stale rels are
    # (cleanupbuilder.py:91-103; see NodeSpec.cleanup_mode)
)

TURN_NODE = NodeSpec.make(
    "Turn",
    {
        "id": PropertyRef("turn_uid"),
        "conv_id": PropertyRef("conv_id"),
        "turn_idx": PropertyRef("turn_idx"),
        "role": PropertyRef("role"),
        "text": PropertyRef("text"),
        "ts": PropertyRef("ts"),
    },
    sub_resource_relationship=IN_CONV,
    extra_node_labels=(
        ExtraNodeLabel("ToolTurn").when(role="tool"),
        ExtraNodeLabel("Utterance"),
    ),
)

ENTITY_NODE = NodeSpec.make(
    "Entity",
    {
        "id": PropertyRef("entity_id"),
        "kind": PropertyRef("kind"),
    },
    # shared across conversations ⇒ Case-3 rel-only cleanup (see above)
    extra_node_labels=(
        ExtraNodeLabel("User").when(kind="user"),
        ExtraNodeLabel("Ticket").when(kind="ticket"),
        ExtraNodeLabel("Url").when(kind="url"),
        ExtraNodeLabel("Tool").when(kind="tool"),
    ),
)

MENTION_RELS = {
    "MENTIONS": RelSpec(
        rel_label="MENTIONS",
        target_node_label="Entity",
        target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("entity_id")),
    ),
    "REFERENCES_TICKET": RelSpec(
        rel_label="REFERENCES_TICKET",
        target_node_label="Entity",
        target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("entity_id")),
    ),
    "LINKS_TO": RelSpec(
        rel_label="LINKS_TO",
        target_node_label="Entity",
        target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("entity_id")),
    ),
}

USES_TOOL = RelSpec(
    rel_label="USES_TOOL",
    target_node_label="Entity",
    target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("entity_id")),
)

NEXT_TURN = RelSpec(
    rel_label="NEXT_TURN",
    target_node_label="Turn",
    target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("next_uid")),
)

ALIAS_OF = RelSpec(
    rel_label="ALIAS_OF",
    target_node_label="Entity",
    target_node_matcher=TargetNodeMatcher.make(id=PropertyRef("root")),
)
