"""MentionDetector — the stateful extraction stage (actor pool).

The analogue of a Cartography intel module's ``transform()`` step
(reference cartography/intel/aws/ec2/instances.py:111-300: one raw payload
batch in, several typed row-lists out) crossed with its stateful stages
(reference §2.4: compiled-pattern caches built once per worker, e.g.
cartography/intel/aws/permission_relationships.py:25-230).

Used as ``ds.map_batches(MentionDetector, concurrency=N, batch_size=B,
batch_format="pyarrow")`` — an actor pool: regexes compile ONCE per actor
in ``__init__``; ``__call__`` handles one zero-copy Arrow batch.

Output schema (one row per mention):
    conv_id, turn_idx, turn_uid, kind, form
plus alias-declaration rows surfaced through ``alias_a``/``alias_b``
columns on kind='alias' rows (at most one declaration per turn by corpus
construction, which keeps the DuckDB oracle to plain regexp_extract).

The patterns are RE2-compatible (no lookbehind) so the DuckDB oracle uses
the exact same expressions — P/R vs the oracle is exact-match by design.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# Kind → (pattern, capture group index). Group 0 in `handle`/`name` is the
# non-captured boundary, so we capture group 1. Keep in sync with
# MENTION_SQL_EXPRS below (the DuckDB oracle uses the same strings).
MENTION_PATTERNS: dict[str, tuple[str, int]] = {
    "handle": (r"(^|\s)(@[a-z][a-z0-9_]*)", 2),
    "email": (r"(^|\s)([a-z0-9_.]+@[a-z0-9.-]+\.[a-z]{2,})", 2),
    "name": (r"(^|\s)([A-Z][a-z]+[0-9]+)", 2),
    "ticket": (r"\b([A-Z]{2,5}-[0-9]+)\b", 1),
    "url": (r"(https://[^\s]+)", 1),
}

ALIAS_NAME_PATTERN = r"(^|\s)([A-Z][a-z]+[0-9]+) \(aka (@[a-z][a-z0-9_]*)\)"
ALIAS_HANDLE_PATTERN = r"(^|\s)(@[a-z][a-z0-9_]*) \(aka (@[a-z][a-z0-9_]*)\)"


def turn_uid_array(conv_id: pa.Array, turn_idx: pa.Array) -> pa.Array:
    """Stable per-turn node id: ``turn:<conv_id>:<turn_idx>``."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        pa.array(["turn"] * len(conv_id), pa.string()),
        pc.cast(conv_id, pa.string()),
        pc.cast(turn_idx, pa.string()),
        ":",
    )


class MentionDetector:
    """Actor-pool batch extractor. Compile once, scan per batch."""

    def __init__(self) -> None:
        self._pats = {
            kind: (re.compile(pat), grp) for kind, (pat, grp) in MENTION_PATTERNS.items()
        }
        self._alias_name = re.compile(ALIAS_NAME_PATTERN)
        self._alias_handle = re.compile(ALIAS_HANDLE_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()

        out_conv: list[str] = []
        out_tidx: list[int] = []
        out_kind: list[str] = []
        out_form: list[str] = []
        out_alias_a: list[str | None] = []
        out_alias_b: list[str | None] = []

        for kind, (pat, grp) in self._pats.items():
            for i, text in enumerate(texts):
                if not text:
                    continue
                for m in pat.finditer(text):
                    out_conv.append(conv[i])
                    out_tidx.append(tidx[i])
                    out_kind.append(kind)
                    out_form.append(m.group(grp))
                    out_alias_a.append(None)
                    out_alias_b.append(None)
        # alias declarations (≤1 per turn by corpus construction; we still
        # scan all matches — correctness does not depend on the bound)
        for pat, a_grp, b_grp, a_kind in (
            (self._alias_name, 2, 3, "name"),
            (self._alias_handle, 2, 3, "handle"),
        ):
            for i, text in enumerate(texts):
                if not text:
                    continue
                for m in pat.finditer(text):
                    out_conv.append(conv[i])
                    out_tidx.append(tidx[i])
                    out_kind.append("alias")
                    out_form.append(m.group(a_grp))
                    out_alias_a.append(m.group(a_grp))
                    out_alias_b.append(m.group(b_grp))

        n = len(out_kind)
        conv_arr = pa.array(out_conv, pa.string())
        tidx_arr = pa.array(out_tidx, pa.int32())
        return pa.table(
            {
                "conv_id": conv_arr,
                "turn_idx": tidx_arr,
                "turn_uid": turn_uid_array(conv_arr, tidx_arr)
                if n
                else pa.array([], pa.string()),
                "kind": pa.array(out_kind, pa.string()),
                "form": pa.array(out_form, pa.string()),
                "alias_a": pa.array(out_alias_a, pa.string()),
                "alias_b": pa.array(out_alias_b, pa.string()),
            }
        )


class ToolUseExtractor:
    """Tool-invocation extraction: role='tool' turns → (turn_uid, tool)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.equal(batch.column("role"), pa.scalar("tool")),
            pc.is_valid(batch.column("tool")),
        )
        sel = batch.filter(mask)
        return pa.table(
            {
                "conv_id": sel.column("conv_id"),
                "turn_idx": sel.column("turn_idx"),
                "turn_uid": turn_uid_array(sel.column("conv_id"), sel.column("turn_idx")),
                "tool": sel.column("tool"),
            }
        )


_IDX = {k: i for i, k in enumerate(MENTION_PATTERNS)}

# numpy fallback used by unit tests for single strings
def extract_mentions_one(text: str) -> list[tuple[str, str]]:
    det = MentionDetector()
    tbl = det(
        pa.table(
            {
                "text": pa.array([text]),
                "conv_id": pa.array(["c"]),
                "turn_idx": pa.array([0], pa.int32()),
            }
        )
    )
    return list(zip(tbl.column("kind").to_pylist(), tbl.column("form").to_pylist()))
