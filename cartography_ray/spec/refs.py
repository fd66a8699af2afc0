"""PropertyRef — a named reference from a graph property to its value source.

Semantics mirror the reference's ``cartography/models/core/common.py:1-172``:
a PropertyRef either names a column on each item batch (``item.<name>``) or,
with ``set_in_kwargs=True``, a pipeline-level scalar parameter
(``$<name>`` in the reference's generated Cypher — here a broadcast scalar
column added to every batch).

Matcher flags (used when the ref appears inside a Target/SourceNodeMatcher;
reference ``querybuilder.py:710-745``):

- ``ignore_case``            — match on lowercased keys
- ``fuzzy_and_ignore_case``  — target key CONTAINS item value, case-folded
- ``one_to_many``            — item value is a list; target key IN list

``extra_index`` is accepted for spec parity; in a Parquet/Arrow world it is
a layout hint only (we cluster node tables by id hash bucket regardless).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PropertyRef:
    name: str
    set_in_kwargs: bool = False
    extra_index: bool = False
    ignore_case: bool = False
    fuzzy_and_ignore_case: bool = False
    one_to_many: bool = False
    description: str | None = None

    def __post_init__(self) -> None:
        if self.ignore_case and self.set_in_kwargs:
            raise ValueError("ignore_case is not supported on kwarg refs")
        if self.fuzzy_and_ignore_case and self.one_to_many:
            raise ValueError("fuzzy and one_to_many are mutually exclusive")

    @property
    def match_mode(self) -> str:
        """One of: exact | ignore_case | fuzzy | one_to_many."""
        if self.one_to_many:
            return "one_to_many"
        if self.fuzzy_and_ignore_case:
            return "fuzzy"
        if self.ignore_case:
            return "ignore_case"
        return "exact"
