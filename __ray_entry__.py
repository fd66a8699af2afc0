"""Driver contract for the graft builder (Ray Data target).

- ``entry()``      — flagship transcript→KG pipeline at sf0.001 (returns
  the distinct (subj, pred, obj) triple Dataset).
- ``queries()``    — one callable per implemented operator family
  (SURVEY.md §2 + the training-data operator brief); each takes an
  ``sf_dir`` and returns a Dataset / pyarrow Table.
- ``oracle_sql()`` — DuckDB oracles for every deterministic query;
  KG oracles read the SAME deterministic synthetic transcript parquet
  the Ray queries use (generated on demand under /tmp/graft_kg).
  Approximate operators (minhash/simhash/LSH-ANN) are rows-only by
  design; their recall is asserted against exact baselines in tests/.

Ray is initialised by the driver before this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

ORACLE_SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def entry() -> Any:
    from cartography_ray.pipelines.queries import q_kg_triples

    return q_kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from cartography_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cartography_ray.pipelines.queries import oracle_sql_for

    return oracle_sql_for(ORACLE_SF_DIR)
