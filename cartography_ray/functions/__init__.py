from cartography_ray.functions.text import (  # noqa: F401
    TextStats,
    fingerprint_batch,
    langid_batch,
)
from cartography_ray.functions.dedup import (  # noqa: F401
    exact_dedup,
    jaccard_pairs_smallside,
    minhash_lsh_pairs,
    simhash_pairs,
)
from cartography_ray.functions.ann import knn_brute, knn_lsh  # noqa: F401
