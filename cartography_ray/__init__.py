"""cartography_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of sec-js/cartography
(reference read-only at /root/reference) on top of ``ray.data.Dataset``:

- declarative node/relationship specs (``cartography_ray.spec``) mirroring
  ``CartographyNodeSchema`` / ``CartographyRelSchema`` semantics
  (reference: cartography/models/core/nodes.py:175-284,
  cartography/models/core/relationships.py:262-427),
- an ingestion compiler that turns specs into vectorized Arrow projection
  plans instead of Cypher (reference: cartography/graph/querybuilder.py),
- MERGE-by-id upsert, lastupdated/firstseen lineage and update-tag cleanup
  re-expressed as groupby-reduce + anti-join over partitioned Parquet
  (reference: cartography/graph/cleanupbuilder.py),
- a transcript knowledge-graph pipeline (mention detection, entity linking,
  distributed union-find canonicalization, graph materialize) built on
  ``map_batches`` over zero-copy Arrow batches with actor pools for the
  stateful stages,
- large-scale training-data operators (dedup family, ANN, text analysis)
  as first-class Dataset transforms.

Nothing here imports from or depends on the reference at runtime.
"""

__version__ = "0.1.0"

MODULE_NAME = "cartography_ray"

# Applied at import time (not just configure()) so Ray shuffle workers —
# which import this package when they deserialize our map_batches UDFs —
# also emit hashable (metadata-free) block schemas. See runtime.py.
try:
    from cartography_ray.runtime import patch_pandas_block_metadata as _patch

    _patch()
    del _patch
except Exception:  # pragma: no cover — ray absent (pure-spec tooling)
    pass
