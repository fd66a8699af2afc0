from cartography_ray.ops.joins import (  # noqa: F401
    broadcast_join,
    broadcast_semi_anti,
    hash_join,
)
from cartography_ray.ops.agg import partial_groupby_agg, topk  # noqa: F401
