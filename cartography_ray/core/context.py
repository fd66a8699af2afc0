"""IngestContext — per-run parameters threaded through every stage.

The reference passes ``lastupdated`` (the update tag, epoch seconds) and
other scalars as query kwargs (``PropertyRef(set_in_kwargs=True)``,
reference ``cartography/client/core/tx.py:783-843`` and
``cartography/sync.py:494-496``). We do the same: the tag is a driver-side
constant decided ONCE and broadcast — never computed inside workers — so
retried tasks stamp identical lineage.

Determinism note: the reference stamps ``firstseen`` with Neo4j's
``timestamp()`` on create (querybuilder.py:1267). We stamp ``firstseen``
with the creating run's update tag instead, which preserves the write-once /
min-across-runs lineage semantics while keeping every output byte a pure
function of (input, update_tag).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from cartography_ray import MODULE_NAME, __version__


@dataclass(frozen=True)
class IngestContext:
    update_tag: int
    module_name: str = MODULE_NAME
    module_version: str = __version__
    kwargs: tuple[tuple[str, object], ...] = field(default=())

    @staticmethod
    def make(update_tag: int | None = None, **kwargs: object) -> "IngestContext":
        tag = int(time.time()) if update_tag is None else int(update_tag)
        return IngestContext(update_tag=tag, kwargs=tuple(sorted(kwargs.items())))

    def kwarg(self, name: str) -> object:
        d = dict(self.kwargs)
        if name not in d:
            raise KeyError(f"kwarg ${name} not provided in IngestContext")
        return d[name]
