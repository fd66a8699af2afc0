"""LinkScorer — mention → candidate entity-key scoring (actor pool).

The analogue of Cartography's ontology consolidation: provider rows are
field-normalized and keyed by a canonical id before merge (reference
cartography/intel/ontology/utils.py:44-81 — required-field filter + merge
by canonical email key). Here each mention surface form is normalized to a
deterministic candidate entity key; forms that alias the same real-world
entity produce keys that the union-find canonicalizer (stages/canonicalize)
then merges via alias-declaration edges.

Key rules (kept in sync with the DuckDB oracle SQL in __ray_entry__):

    handle  '@bob'                → 'user:bob'
    email   'bob@example.com'     → 'user:bob'     (local part, lowered)
    name    'Username7'           → 'name:username7'
    ticket  'TICK-12'             → 'ticket:TICK-12'
    url     'https://…'           → 'url:<url>'

Vectorized with pyarrow.compute kernels — no Python row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PRED_BY_KIND = {
    "handle": "MENTIONS",
    "email": "MENTIONS",
    "name": "MENTIONS",
    "ticket": "REFERENCES_TICKET",
    "url": "LINKS_TO",
}


def entity_key_array(kind: pa.Array, form: pa.Array) -> pa.Array:
    """Vectorized candidate-key computation (rules above)."""
    kind = pc.cast(kind, pa.string())
    form = pc.cast(form, pa.string())
    lower = pc.utf8_lower(form)
    # handle: strip leading '@'
    handle_key = pc.binary_join_element_wise(
        pa.array(["user"] * len(form), pa.string()), pc.utf8_slice_codeunits(lower, 1), ":"
    )
    # email: local part
    local = pc.list_element(pc.split_pattern(lower, "@"), 0)
    email_key = pc.binary_join_element_wise(pa.array(["user"] * len(form), pa.string()), local, ":")
    name_key = pc.binary_join_element_wise(pa.array(["name"] * len(form), pa.string()), lower, ":")
    ticket_key = pc.binary_join_element_wise(pa.array(["ticket"] * len(form), pa.string()), form, ":")
    url_key = pc.binary_join_element_wise(pa.array(["url"] * len(form), pa.string()), form, ":")
    out = pc.if_else(pc.equal(kind, pa.scalar("handle")), handle_key, url_key)
    out = pc.if_else(pc.equal(kind, pa.scalar("email")), email_key, out)
    out = pc.if_else(pc.equal(kind, pa.scalar("name")), name_key, out)
    out = pc.if_else(pc.equal(kind, pa.scalar("ticket")), ticket_key, out)
    return out


class LinkScorer:
    """Actor-pool stage: append entity_key + pred columns to mention batches.

    Drops kind='alias' marker rows (they feed canonicalization, not edges) —
    the alias PAIR keys are emitted through ``alias_edges_batch``.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.not_equal(batch.column("kind"), pa.scalar("alias")))
        key = entity_key_array(keep.column("kind"), keep.column("form"))
        n = keep.num_rows
        pred = pa.array([""] * n, pa.string())
        kind_col = keep.column("kind")
        for kind, p in PRED_BY_KIND.items():
            pred = pc.if_else(pc.equal(kind_col, pa.scalar(kind)), pa.scalar(p), pred)
        out = keep.drop_columns(["alias_a", "alias_b"])
        out = out.append_column("entity_key", key)
        return out.append_column("pred", pred)


def alias_edges_batch(batch: pa.Table) -> pa.Table:
    """kind='alias' rows → (a, b) alias edges between candidate keys.

    'Username5 (aka @user5)' → (name:username5, user:user5)
    '@user5 (aka @alt5)'     → (user:user5,     user:alt5)
    """
    sel = batch.filter(pc.equal(batch.column("kind"), pa.scalar("alias")))
    a_form = sel.column("alias_a")
    b_form = sel.column("alias_b")
    # alias_a is a name iff it does not start with '@'
    a_is_handle = pc.starts_with(pc.cast(a_form, pa.string()), "@")
    a_kind = pc.if_else(a_is_handle, pa.scalar("handle"), pa.scalar("name"))
    a_key = entity_key_array(a_kind, a_form)
    b_key = entity_key_array(pa.array(["handle"] * sel.num_rows, pa.string()), b_form)
    return pa.table({"a": a_key, "b": b_key})
