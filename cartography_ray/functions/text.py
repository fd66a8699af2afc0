"""Text-analysis operators for training-data pipelines (SURVEY brief):

- token counting (whitespace tokens via a compiled regex),
- quality signals (token / punctuation / stopword counts — integer
  outputs so the DuckDB oracle matches bit-for-bit),
- language-ID (marker-word heuristic; argmax with deterministic
  tie-break),
- document fingerprinting (md5 of whitespace-normalized, lowercased
  text — the exact-dedup key).

All stages are ``map_batches`` friendly: ``TextStats`` is an actor-pool
class (regexes compiled once per actor); the others are pure batch
functions. Regex syntax is RE2-compatible so oracles reuse the patterns.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.,;:!?]"
STOP_RE = r"\b(the|and|of|to|a|is|in)\b"

# marker words per language for the lang-id heuristic; ties break by
# language code ascending (deterministic, mirrored in the SQL oracle)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|is|of|to)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "es": r"\b(el|la|los|que|es)\b",
    "fr": r"\b(le|la|les|est|et)\b",
}


class TextStats:
    """Actor-pool stage: integer quality counters per document."""

    def __init__(self) -> None:
        self.token = re.compile(TOKEN_RE)
        self.punct = re.compile(PUNCT_RE)
        self.stop = re.compile(STOP_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tok = np.fromiter(
            (len(self.token.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        n_punct = np.fromiter(
            (len(self.punct.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        n_stop = np.fromiter(
            (len(self.stop.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        n_chars = pc.utf8_length(pc.cast(batch.column("text"), pa.string()))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok),
                "n_punct": pa.array(n_punct),
                "n_stop": pa.array(n_stop),
                "n_chars2": pc.cast(n_chars, pa.int64()),
            }
        )


def langid_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language-ID: argmax of marker-word hits, ties → code asc."""
    texts = [(t or "").lower() for t in batch.column("text").to_pylist()]
    langs = sorted(LANG_MARKERS)
    pats = {lang: re.compile(LANG_MARKERS[lang]) for lang in langs}
    hits = {lang: [len(pats[lang].findall(t)) for t in texts] for lang in langs}
    best = []
    for i in range(len(texts)):
        scored = [(-(hits[lang][i]), lang) for lang in langs]
        scored.sort()
        best.append(scored[0][1] if -scored[0][0] > 0 else "und")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(best, pa.string()),
            "en_hits": pa.array(hits["en"], pa.int64()),
        }
    )


def normalize_text_array(col) -> pa.Array:
    """lower + collapse whitespace to single spaces (fingerprint input)."""
    s = pc.utf8_lower(pc.cast(col, pa.string()))
    return pc.replace_substring_regex(s, r"\s+", " ")


def fingerprint_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """md5 fingerprint of normalized text (the exact-dedup / lineage key)."""
    norm = normalize_text_array(batch.column(text_col))
    fps = pa.array(
        [hashlib.md5(t.encode()).hexdigest() if t is not None else None for t in norm.to_pylist()],
        pa.string(),
    )
    return pa.table({id_col: batch.column(id_col), "fingerprint": fps})


class QualityFilter:
    """Actor-pool stage: keep (doc_id, text) rows passing integer quality
    thresholds — same compiled counters as TextStats, so the SQL oracle
    (the docs_stats regexes in a WHERE clause) is bit-identical."""

    def __init__(self, min_tokens: int = 0, min_stop: int = 0) -> None:
        self.token = re.compile(TOKEN_RE)
        self.stop = re.compile(STOP_RE)
        self.min_tokens = min_tokens
        self.min_stop = min_stop

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tok = np.fromiter(
            (len(self.token.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        n_stop = np.fromiter(
            (len(self.stop.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        mask = pa.array((n_tok >= self.min_tokens) & (n_stop >= self.min_stop))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text": batch.column("text")}
        ).filter(mask)
