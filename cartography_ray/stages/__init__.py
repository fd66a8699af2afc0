from cartography_ray.stages.extract import MentionDetector  # noqa: F401
from cartography_ray.stages.link import LinkScorer  # noqa: F401
from cartography_ray.stages.canonicalize import connected_components, resolve_keys  # noqa: F401
