"""Facts, rules, frameworks, findings & formatters — the rules engine.

Re-expresses the reference's rules surface (cartography/rules/spec/
model.py: ``Fact`` with RETURN-projection validation at 16-120/363+,
``Rule`` at 505+, ``Framework`` compliance mappings at 287+, ``Maturity``
at 237; execution ``runners.py:290``; output ``formatters.py``):

- a **Fact** is a named query callable whose result columns must match
  its declaration (the output-column validation of the reference's final
  RETURN projection parsing),
- a **Rule** groups Facts with metadata (id, tags, description, version)
  and maps to compliance **Framework** controls (case-insensitive
  matching, many-to-many),
- ``run_rules`` executes + validates and parses rows into **Finding**
  records (undeclared columns land in ``extra`` — reference
  Rule.parse_results),
- formatters render results as JSON or a text table
  (reference rules/formatters.py).
"""

from __future__ import annotations

import enum
import json
from dataclasses import dataclass, field
from typing import Any, Callable


class Maturity(str, enum.Enum):
    EXPERIMENTAL = "EXPERIMENTAL"
    STABLE = "STABLE"


def _fold(value: str | None) -> str | None:
    """Case-fold a match field (None passes through)."""
    return value if value is None else value.lower()


@dataclass(frozen=True)
class Framework:
    """Compliance framework requirement/control mapping: which control of
    which framework (by short name / scope / revision) a rule satisfies.
    All match fields are case-folded once at construction via a single
    field sweep; ``control_title`` is display-only and keeps its casing.
    Selection is criteria-dict based: any subset of the match fields may
    be constrained, omitted criteria match everything.
    """

    name: str
    short_name: str
    requirement: str
    scope: str | None = None
    revision: str | None = None
    control_title: str | None = None

    _MATCH_FIELDS = ("name", "short_name", "requirement", "scope", "revision")

    def __post_init__(self) -> None:
        for f in self._MATCH_FIELDS:
            object.__setattr__(self, f, _fold(getattr(self, f)))

    def matches(self, short_name=None, scope=None, revision=None, **criteria) -> bool:
        """True when every non-None criterion equals the (folded) field."""
        criteria.update(short_name=short_name, scope=scope, revision=revision)
        return all(
            getattr(self, f) == _fold(want)
            for f, want in criteria.items()
            if want is not None
        )


@dataclass(frozen=True)
class Fact:
    name: str
    description: str
    columns: tuple[str, ...]
    query: Callable[..., object]  # (store_or_sf_dir) → Dataset/DataFrame/Table
    id: str = ""
    module: str = "cartography_ray"
    maturity: Maturity = Maturity.STABLE


@dataclass(frozen=True)
class Finding:
    """One parsed result row (reference's typed Finding output model —
    here a uniform record; undeclared columns go to ``extra``)."""

    source: str
    values: dict = field(default_factory=dict)
    extra: dict = field(default_factory=dict)


@dataclass(frozen=True)
class Rule:
    name: str
    facts: tuple[Fact, ...]
    id: str = ""
    tags: tuple[str, ...] = ()
    description: str = ""
    version: str = "1"
    frameworks: tuple[Framework, ...] = ()
    references: tuple[str, ...] = ()

    def has_framework(
        self,
        short_name: str | None = None,
        scope: str | None = None,
        revision: str | None = None,
    ) -> bool:
        return any(fw.matches(short_name, scope, revision) for fw in self.frameworks)

    def get_fact_by_id(self, fact_id: str) -> Fact | None:
        for fact in self.facts:
            if (fact.id or fact.name).lower() == fact_id.lower():
                return fact
        return None

    def parse_results(self, fact: Fact, rows: list[dict]) -> list[Finding]:
        """Rows → Findings: declared columns become ``values``, everything
        else lands in ``extra`` (reference Rule.parse_results)."""
        out = []
        declared = set(fact.columns)
        for row in rows:
            values, extra = {}, {}
            for k, v in row.items():
                if v is None:
                    continue
                (values if k in declared else extra)[k] = v
            out.append(Finding(source=fact.module, values=values, extra=extra))
        return out


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
    return {
        "fact": fact.name,
        "columns": list(fact.columns),
        "rows": len(df),
        "result": df[list(fact.columns)],
        # full frame kept for Finding parsing (undeclared columns → extra)
        "result_full": df,
    }


def run_rules(
    rules: list[Rule],
    *args,
    framework: str | None = None,
    scope: str | None = None,
    with_findings: bool = False,
) -> list[dict]:
    """Execute + validate every rule's facts (reference runners.py:290).
    ``framework``/``scope`` filter rules by compliance mapping; with
    ``with_findings`` each fact result also carries parsed Finding
    records."""
    out = []
    for rule in rules:
        if framework is not None and not rule.has_framework(framework, scope):
            continue
        results = []
        for f in rule.facts:
            res = run_fact(f, *args)
            if with_findings:
                res["findings"] = rule.parse_results(
                    f, res["result_full"].to_dict(orient="records")
                )
            results.append(res)
        out.append({"rule": rule.name, "rule_id": rule.id or rule.name, "facts": results})
    return out


# ------------------------------------------------------------- formatters


def format_json(results: list[dict]) -> str:
    """JSON formatter (reference rules/formatters.py): findings and row
    counts only — result frames are summarized, not embedded."""

    def enc(res):
        return {
            "rule": res["rule"],
            "rule_id": res.get("rule_id", res["rule"]),
            "facts": [
                {
                    "fact": f["fact"],
                    "rows": f["rows"],
                    "columns": f["columns"],
                    **(
                        {
                            "findings": [
                                {"source": x.source, **x.values, **({"extra": x.extra} if x.extra else {})}
                                for x in f["findings"]
                            ]
                        }
                        if "findings" in f
                        else {}
                    ),
                }
                for f in res["facts"]
            ],
        }

    return json.dumps([enc(r) for r in results], indent=2, default=str)


def format_table(results: list[dict]) -> str:
    """Plain-text table formatter: one line per (rule, fact) with counts."""
    rows = [("RULE", "FACT", "ROWS")]
    for res in results:
        for f in res["facts"]:
            rows.append((res["rule"], f["fact"], str(f["rows"])))
    widths = [max(len(r[i]) for r in rows) for i in range(3)]
    return "\n".join(
        "  ".join(c.ljust(w) for c, w in zip(r, widths)) for r in rows
    )
