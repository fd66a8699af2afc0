"""Facts & rules — saved queries with output-column validation.

Re-expresses the reference's rules engine surface (cartography/rules/spec/
model.py:16-120 `Fact` with RETURN-projection validation; runners.py:290
`run_rules`): a Fact is a named query callable whose result columns must
match its declaration; Rules group Facts; `run_rules` executes and
validates, returning structured results.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class Fact:
    name: str
    description: str
    columns: tuple[str, ...]
    query: Callable[..., object]  # (store_or_sf_dir) → Dataset/DataFrame/Table


@dataclass(frozen=True)
class Rule:
    name: str
    facts: tuple[Fact, ...]


def _to_pandas(obj):
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return obj


def run_fact(fact: Fact, *args) -> dict:
    df = _to_pandas(fact.query(*args))
    got = tuple(df.columns)
    if set(fact.columns) - set(got):
        raise ValueError(
            f"fact {fact.name}: declared columns {fact.columns} missing from result {got}"
        )
    return {"fact": fact.name, "columns": list(fact.columns), "rows": len(df), "result": df[list(fact.columns)]}


def run_rules(rules: list[Rule], *args) -> list[dict]:
    out = []
    for rule in rules:
        results = [run_fact(f, *args) for f in rule.facts]
        out.append({"rule": rule.name, "facts": results})
    return out
