from cartography_ray.state.store import GraphStore  # noqa: F401
