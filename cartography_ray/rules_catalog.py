"""Concrete rules content — data-hygiene rules over the driver tables.

The reference ships a large corpus of concrete security rules consumed
by its rules engine (cartography/rules/data/…); this module is the
engine-appropriate analogue: a small catalogue of DATA-hygiene rules
whose Facts are the engine's own distributed queries
(pipelines/queries.py), each mapped to controls of a compliance-style
framework so framework-filtered execution (``run_rules(framework=...)``)
has real content to select over.

Facts take ``sf_dir`` (the parquet table directory) — the same calling
convention as the driver catalogue.
"""

from __future__ import annotations

from cartography_ray.pipelines.queries import QUERIES
from cartography_ray.rules import Fact, Framework, Rule

# A compliance-style framework for training-data hygiene. Versioned
# controls; matching is case-folded by Framework itself.
DQ = "Data Quality Baseline"


def _fact(query: str, name: str, description: str, columns: tuple[str, ...]) -> Fact:
    return Fact(
        name=name,
        description=description,
        columns=columns,
        query=QUERIES[query],
        id=f"cr-fact-{query.replace('_', '-')}",
    )


DUPLICATE_DOCUMENTS = Rule(
    name="duplicate-documents",
    id="CR-DQ-001",
    description=(
        "Exact-duplicate documents inflate token counts and bias training "
        "mixtures; every duplicate cluster must have exactly one keeper."
    ),
    tags=("dedup", "documents"),
    facts=(
        _fact(
            "docs_exact_dedup",
            "exact-dedup-keepers",
            "one deterministic keeper doc id per normalized-content cluster",
            ("doc_id",),
        ),
        _fact(
            "docs_dup_edges",
            "duplicate-of-edges",
            "(member)-[DUPLICATE_OF]->(keeper) edges for non-keeper members",
            ("src_id", "dst_id"),
        ),
    ),
    frameworks=(
        Framework(DQ, "dqb", "DQ-1", scope="documents", revision="1",
                  control_title="Deduplicate training corpora"),
    ),
)

NEAR_DUPLICATE_EMBEDDINGS = Rule(
    name="near-duplicate-embeddings",
    id="CR-DQ-002",
    description="Embedding pairs above the cosine near-dup threshold.",
    tags=("dedup", "embeddings"),
    facts=(
        _fact(
            "emb_neardup",
            "cosine-near-duplicates",
            "exact all-pairs cosine >= threshold (triangle block join)",
            ("id_a", "id_b", "sim6"),
        ),
    ),
    frameworks=(
        Framework(DQ, "dqb", "DQ-2", scope="embeddings", revision="1",
                  control_title="Flag near-duplicate vectors"),
    ),
)

ORPHAN_CUSTOMERS = Rule(
    name="orphan-customers",
    id="CR-REL-001",
    description=(
        "Relational integrity: customers with no qualifying orders "
        "(distributed anti-join — the cleanup primitive)."
    ),
    tags=("integrity",),
    facts=(
        _fact(
            "customers_without_orders",
            "customers-without-orders",
            "customers with no order above the value threshold",
            ("c_custkey", "c_name"),
        ),
    ),
    frameworks=(
        Framework(DQ, "dqb", "REL-1", scope="relational", revision="1",
                  control_title="No dangling dimension rows"),
    ),
)

ENTITY_HYGIENE = Rule(
    name="entity-hygiene",
    id="CR-KG-001",
    description=(
        "Knowledge-graph hygiene: canonical entity inventory and alias "
        "component map must be consistent."
    ),
    tags=("kg",),
    facts=(
        _fact(
            "kg_entities",
            "canonical-entities",
            "canonical entity ids with kind and mention counts",
            ("entity_id", "kind", "n_mentions"),
        ),
        _fact(
            "kg_alias_components",
            "alias-components",
            "member -> canonical root pairs from the alias union-find",
            ("member", "root"),
        ),
    ),
    frameworks=(
        Framework(DQ, "dqb", "KG-1", scope="kg", revision="1",
                  control_title="Canonicalize entity aliases"),
    ),
)

ALL_RULES: tuple[Rule, ...] = (
    DUPLICATE_DOCUMENTS,
    NEAR_DUPLICATE_EMBEDDINGS,
    ORPHAN_CUSTOMERS,
    ENTITY_HYGIENE,
)
