from cartography_ray.core.context import IngestContext  # noqa: F401
from cartography_ray.core.compile import (  # noqa: F401
    attach_rels,
    project_nodes,
    project_rel_candidates,
)
