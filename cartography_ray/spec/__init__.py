from cartography_ray.spec.refs import PropertyRef  # noqa: F401
from cartography_ray.spec.nodes import (  # noqa: F401
    ExtraNodeLabel,
    LabelKind,
    NodeSpec,
)
from cartography_ray.spec.rels import (  # noqa: F401
    LinkDirection,
    RelSpec,
    SourceNodeMatcher,
    TargetNodeMatcher,
)
