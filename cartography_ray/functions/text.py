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


# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1 — public).
# Every rule is an INTEGER comparison over RE2-count features (ratios
# cross-multiplied), so the DuckDB oracle matches bit-for-bit.
GOPHER_BULLET_RE = r"(?m)^[-*•]"
GOPHER_ELLIPSIS_RE = r"(?m)(\.\.\.|…)$"
GOPHER_SYMBOL_RE = r"#|…|\.\.\."
GOPHER_ALPHA_WORD_RE = r"\S*[a-zA-Z]\S*"
GOPHER_STOPWORDS = ("the", "and", "of", "to", "a", "is", "in")
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 90


class GopherQuality:
    """Actor-pool stage: per-document Gopher quality rules as 0/1 int
    columns plus the conjunction (``gopher_pass``).

    Rules (all integer arithmetic — no float ratios):
      r_wordcount  GOPHER_MIN_WORDS ≤ words ≤ GOPHER_MAX_WORDS
      r_meanlen    3 ≤ mean word length ≤ 10   (cross-multiplied)
      r_symbol     symbol(#/…/...)-to-word ratio ≤ 0.1
      r_bullet     ≤ 90% of lines start with a bullet
      r_ellipsis   ≤ 30% of lines end with an ellipsis
      r_alpha      ≥ 80% of words contain an alphabetic character
      r_stop       ≥ 2 distinct stopwords present
    """

    def __init__(self) -> None:
        self.word = re.compile(TOKEN_RE)
        self.space = re.compile(r"\s")
        self.bullet = re.compile(GOPHER_BULLET_RE)
        self.ellipsis = re.compile(GOPHER_ELLIPSIS_RE)
        self.symbol = re.compile(GOPHER_SYMBOL_RE)
        self.alpha_word = re.compile(GOPHER_ALPHA_WORD_RE)
        self.stops = [re.compile(rf"\b{w}\b") for w in GOPHER_STOPWORDS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        cols: dict[str, np.ndarray] = {
            k: np.zeros(n, np.int64)
            for k in (
                "n_words", "r_wordcount", "r_meanlen", "r_symbol",
                "r_bullet", "r_ellipsis", "r_alpha", "r_stop",
            )
        }
        for i, t in enumerate(texts):
            t = t or ""
            words = len(self.word.findall(t))
            word_chars = len(t) - len(self.space.findall(t))
            lines = t.count("\n") + 1
            cols["n_words"][i] = words
            cols["r_wordcount"][i] = GOPHER_MIN_WORDS <= words <= GOPHER_MAX_WORDS
            cols["r_meanlen"][i] = (
                3 * words <= word_chars and word_chars <= 10 * words
            )
            cols["r_symbol"][i] = 10 * len(self.symbol.findall(t)) <= words
            cols["r_bullet"][i] = 10 * len(self.bullet.findall(t)) <= 9 * lines
            cols["r_ellipsis"][i] = 10 * len(self.ellipsis.findall(t)) <= 3 * lines
            cols["r_alpha"][i] = 5 * len(self.alpha_word.findall(t)) >= 4 * words
            cols["r_stop"][i] = sum(1 for p in self.stops if p.search(t)) >= 2
        passing = np.ones(n, np.int64)
        for k in cols:
            if k.startswith("r_"):
                passing &= cols[k]
        out = {"doc_id": batch.column("doc_id")}
        out.update({k: pa.array(v) for k, v in cols.items()})
        out["gopher_pass"] = pa.array(passing)
        return pa.table(out)


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


# tokens for the vocabulary / chunking family: runs of [a-z0-9] over the
# lowered text (vocab) or whitespace tokens (chunking) — both RE2-exact
# in DuckDB so the oracles reuse them verbatim
VOCAB_SPLIT_RE = r"[^a-z0-9]+"


def token_frequency(ds, text_col: str = "text", top_n: int = 100,
                    num_partitions: int | None = None):
    """Corpus vocabulary: global token→count, top ``top_n`` by count
    (the training-data vocabulary/frequency sweep).

    Shape: per-batch tokenize (``pc.split_pattern_regex`` — C-level) +
    per-batch count combiner → ONE token-keyed shuffle of vocab-sized
    partials (never the token stream) → exact totals. The global top-n is
    then pruned per-block first: after the groupby every token's total
    lives in exactly one block, so the global top-n is a subset of the
    per-block top-ns — the final sort sees candidates, not the
    vocabulary. Ordering: count desc, token asc (deterministic; SQL twin
    ``ORDER BY n DESC, token ASC LIMIT n``).
    """
    import pandas as pd

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.runtime import drop_empty_blocks

    def tokenize_count(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        toks = pc.list_flatten(pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pd.Series(toks.to_pandas()).value_counts(sort=False)
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy().astype("int64"), pa.int64()),
            }
        )

    return _count_topn(
        ds.map_batches(tokenize_count, batch_format="pyarrow"),
        key_col="token", top_n=top_n, num_partitions=num_partitions,
    )


def _count_topn(partials, key_col: str, top_n: int,
                num_partitions: int | None = None):
    """Shared tail of the frequency sweeps: exact totals over per-batch
    (key, n) count partials → per-block top-n prune → candidate sort.
    After the groupby every key's total lives in exactly one block, so
    the global top-n is a subset of the per-block top-ns."""
    import pandas as pd

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.runtime import drop_empty_blocks

    totals = partial_groupby_agg(
        partials,
        [key_col], {"n": ("n", "sum")}, num_partitions=num_partitions,
        # a whitespace-only / fully-filtered corpus yields zero tokens —
        # a realistic state after an upstream quality filter; return a
        # typed empty instead of crashing the shuffle finalize
        empty_schema=pa.schema([(key_col, pa.string()), ("n", pa.int64())]),
    )
    # vocab-sized: pin once so the count probe and the prune+sort below
    # read cached blocks instead of re-running the shuffle
    totals = totals.materialize()
    if totals.count() == 0:
        return totals

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", key_col], ascending=[False, True], kind="mergesort"
        )
        out = df.head(top_n)
        return pa.table(
            {
                key_col: pa.array(out[key_col].to_numpy(), pa.string()),
                "n": pa.array(out["n"].to_numpy().astype("int64"), pa.int64()),
            }
        )

    pruned = drop_empty_blocks(totals.map_batches(prune, batch_format="pyarrow"))
    return pruned.sort(["n", key_col], descending=[True, False]).limit(top_n)


def bigram_frequency(ds, text_col: str = "text", top_n: int = 100,
                     num_partitions: int | None = None):
    """Corpus collocation sweep: global adjacent-token-pair → count,
    top ``top_n`` by count (the n-gram statistics / collocation-mining
    member of the text family; bigrams never cross document bounds).

    Same shape as ``token_frequency``: per-batch tokenize + pair + count
    combiner (all C-level Arrow kernels — ``list_parent_indices`` keeps
    pairs within their document, ``binary_join_element_wise`` forms the
    pair key) → ONE bigram-keyed shuffle of vocab-sized partials →
    ``_count_topn``. Ordering: count desc, bigram asc (SQL twin
    ``ORDER BY n DESC, bigram ASC LIMIT n``).
    """
    import pandas as pd

    empty = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def pair_count(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lists = pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
            parent = parent.combine_chunks()
        n = len(flat)
        if n < 2:
            return empty
        same = pc.equal(parent.slice(0, n - 1), parent.slice(1, n - 1))
        left = flat.slice(0, n - 1).filter(same)
        if len(left) == 0:
            return empty
        bg = pc.binary_join_element_wise(left, flat.slice(1, n - 1).filter(same), " ")
        vc = pd.Series(bg.to_pandas()).value_counts(sort=False)
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy().astype("int64"), pa.int64()),
            }
        )

    return _count_topn(
        ds.map_batches(pair_count, batch_format="pyarrow"),
        key_col="bigram", top_n=top_n, num_partitions=num_partitions,
    )


def chunk_documents(ds, id_col: str = "doc_id", text_col: str = "text",
                    max_tokens: int = 64):
    """Split documents into fixed-size whitespace-token chunks (the RAG /
    training-window chunking step): one output row per (doc, chunk) —
    ``(id, chunk_idx, n_tokens, chunk_text)``, chunks rejoined with
    single spaces, last chunk ragged, empty docs emit nothing.

    Pure per-batch ``flat_map`` — no shuffle, no state; the per-doc loop
    is C-level ``str.split``/``join``. SQL twin: ``list_filter(
    regexp_split_to_array(text, '\\s+'), ...)`` + ``unnest(range(...))``
    + ``list_slice`` (see SQL_DOCS_CHUNKS).
    """

    # explicit ASCII whitespace class: identical token boundaries in
    # Python re and DuckDB RE2 (str.split()/\s are unicode-aware in
    # Python but ASCII in RE2 — pin the class instead)
    ws = re.compile(r"[ \t\n\r\f\v]+")

    def fn(batch: pa.Table) -> pa.Table:
        ids_out, idxs, ns, texts_out = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = [x for x in ws.split(t or "") if x]
            for j in range(0, len(toks), max_tokens):
                part = toks[j : j + max_tokens]
                ids_out.append(ids[i])
                idxs.append(j // max_tokens)
                ns.append(len(part))
                texts_out.append(" ".join(part))
        return pa.table(
            {
                id_col: pa.array(ids_out, batch.schema.field(id_col).type),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
                "chunk_text": pa.array(texts_out, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style per-document repetition signals, integer-exact so the
    DuckDB twin is a full hash oracle (the repetition-rule inputs of
    training-data quality filtering — Rae et al. 2021 §A1.1 use the
    duplicate-n-gram FRACTIONS; emitting the integer numerators keeps the
    oracle bit-exact and lets callers derive any ratio):

    - ``n_tokens``   total tokens (``VOCAB_SPLIT_RE`` over lowered text),
    - ``n_distinct`` distinct tokens,
    - ``top_tok_n``  occurrences of the most frequent token,
    - ``top_bigram_n`` occurrences of the most frequent adjacent-token
      bigram (0 for docs with <2 tokens).

    Pure per-batch ``map_batches`` — a document is ONE input row, so its
    counts never span batches and the operator needs NO shuffle. The
    kernel is Arrow split + pandas groupby (vectorized); every output is
    int64.
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lists = pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE)
        toks = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(toks, "")
        tv = toks.filter(keep).to_pandas().to_numpy()
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        n_tokens = np.zeros(n, np.int64)
        n_distinct = np.zeros(n, np.int64)
        top_tok = np.zeros(n, np.int64)
        top_big = np.zeros(n, np.int64)
        if len(par):
            uni = (
                pd.DataFrame({"p": par, "t": tv})
                .groupby(["p", "t"], sort=False)
                .size()
            )
            g = uni.groupby(level=0)
            tot, dis, mx = g.sum(), g.size(), g.max()
            n_tokens[tot.index.to_numpy()] = tot.to_numpy()
            n_distinct[dis.index.to_numpy()] = dis.to_numpy()
            top_tok[mx.index.to_numpy()] = mx.to_numpy()
            same = par[1:] == par[:-1]
            if same.any():
                bg = (
                    pd.DataFrame(
                        {
                            "p": par[1:][same],
                            # tokens never contain the separator (it is a
                            # split boundary), so the join is injective
                            "b": pd.Series(tv[:-1][same]) + " " + pd.Series(tv[1:][same]),
                        }
                    )
                    .groupby(["p", "b"], sort=False)
                    .size()
                    .groupby(level=0)
                    .max()
                )
                top_big[bg.index.to_numpy()] = bg.to_numpy()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tokens),
                "n_distinct": pa.array(n_distinct),
                "top_tok_n": pa.array(top_tok),
                "top_bigram_n": pa.array(top_big),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


ENTROPY_SCALE = 1_000_000


def token_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document token-distribution Shannon entropy, integer-exact.

    A gibberish / repetition quality signal: low entropy = one token
    dominates, high entropy = uniform vocabulary. Emitted as
    ``entropy_scaled = Σ_distinct c·(fln(T) − fln(c))`` where
    ``fln(x) = floor(ENTROPY_SCALE·ln(x))``, T = total tokens — the
    floor-scaled-ln construction ``lm_score`` / ``tfidf_topk`` already
    use, so DuckDB's ``ln`` reproduces every term bit-exactly and the
    oracle is a full hash match (true entropy in nats ≈
    entropy_scaled / (ENTROPY_SCALE·T)). Pure per-batch kernel — a doc
    is one row, so no shuffle.
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lists = pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE)
        toks = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(toks, "")
        tv = toks.filter(keep).to_pandas().to_numpy()
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        n_tokens = np.zeros(n, np.int64)
        ent = np.zeros(n, np.int64)
        if len(par):
            counts = (
                pd.DataFrame({"p": par, "t": tv})
                .groupby(["p", "t"], sort=False)
                .size()
            )
            c = counts.to_numpy(np.int64)
            p = counts.index.get_level_values(0).to_numpy(np.int64)
            tot = np.zeros(n, np.int64)
            np.add.at(tot, p, c)
            fln_c = np.floor(ENTROPY_SCALE * np.log(c)).astype(np.int64)
            fln_t = np.zeros(n, np.int64)
            nz = tot > 0
            fln_t[nz] = np.floor(
                ENTROPY_SCALE * np.log(tot[nz].astype(np.float64))
            ).astype(np.int64)
            np.add.at(ent, p, c * (fln_t[p] - fln_c))
            n_tokens[:] = tot
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tokens),
                "entropy_scaled": pa.array(ent),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def prune_frequent_tokens(
    ds,
    n_docs: int,
    df_limit: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Corpus-document-frequency token pruning (the boilerplate-removal /
    stopword-strip step of training-data cleaning, CCNet-style but at
    token granularity): every token appearing in ≥ ``df_limit`` documents
    is removed from EVERY document; each doc is rewritten as the
    single-space join of its surviving tokens in original order
    (lowercased — the same normalization the tokenizer applies). Docs
    with nothing left emit no row.

    Output: ``(id_col, clean_text, n_kept)``.

    Shape: per-batch distinct ``(doc, token)`` rows (a doc is one input
    row, so per-batch dedup is exact) → ONE vocab-sized shuffle for df →
    the pruned set broadcast via ``ray.put`` → per-batch rewrite.

    The broadcast is UNCONDITIONALLY safe — unlike generic small-side
    lookups it is bounded by corpus *shape*, not size: tokens with
    df ≥ T number at most (Σ per-doc distinct tokens)/T ≤
    n_docs·avg_distinct/T, so with T = frac·n_docs the set holds ≤
    avg_distinct_per_doc/frac tokens no matter how many documents exist.
    """
    import pandas as pd
    import ray

    from cartography_ray.ops.agg import partial_groupby_agg

    def doc_tokens(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lists = pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE)
        toks = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(toks, "")
        df = pd.DataFrame(
            {
                "p": parent.filter(keep).to_numpy(zero_copy_only=False),
                "token": toks.filter(keep).to_pandas(),
            }
        ).drop_duplicates()
        return pa.table({"token": pa.array(df["token"].to_numpy(), pa.string())})

    df_ds = partial_groupby_agg(
        ds.map_batches(doc_tokens, batch_format="pyarrow"),
        ["token"],
        {"df": (None, "count")},
        num_partitions=num_partitions,
        empty_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )
    from cartography_ray.runtime import to_pandas_typed

    # a corpus with no frequent tokens yields an all-empty filter output,
    # which plain to_pandas() returns schema-less in Ray 2.49
    frequent = to_pandas_typed(df_ds.filter(expr=f"df >= {int(df_limit)}"))
    pruned_ref = ray.put(frozenset(frequent["token"]))

    def rewrite(batch: pa.Table) -> pa.Table:
        pruned = ray.get(pruned_ref)
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lists = pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE)
        toks = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        tv = toks.to_pandas()
        keep = (tv != "").to_numpy() & ~tv.isin(pruned).to_numpy()
        par = parent.to_numpy(zero_copy_only=False)[keep]
        g = pd.Series(tv.to_numpy()[keep]).groupby(par)
        joined, counts = g.agg(" ".join), g.size()
        rows = pa.array(joined.index.to_numpy())
        return pa.table(
            {
                id_col: batch.column(id_col).take(rows),
                "clean_text": pa.array(joined.to_numpy(), pa.string()),
                "n_kept": pa.array(counts.to_numpy().astype("int64"), pa.int64()),
            }
        )

    return ds.map_batches(rewrite, batch_format="pyarrow")


# df→idf side of tfidf_topk: broadcast below (vocab-sized map via
# ray.put), reduce-side hash join above — the repo's standard
# size-guarded contract
TFIDF_VOCAB_BROADCAST_LIMIT = 2_000_000


def _tf_rows_fn(id_col: str, text_col: str):
    """Per-batch exact ``(id, token, tf)`` rows: a document's text is ONE
    input row, so its term counts never span batches and tf needs NO
    shuffle. Tokenization = ``VOCAB_SPLIT_RE`` over lowered text (C-level
    Arrow kernels), counting = one vectorized pandas groupby."""
    import pandas as pd

    def tf_rows(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lists = pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE)
        toks = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(toks, "")
        toks, parent = toks.filter(keep), parent.filter(keep)
        df = pd.DataFrame(
            {"__row": parent.to_numpy(zero_copy_only=False), "token": toks.to_pandas()}
        )
        g = df.groupby(["__row", "token"], sort=False).size().reset_index(name="tf")
        ids = batch.column(id_col).take(pa.array(g["__row"].to_numpy()))
        return pa.table(
            {
                id_col: ids,
                "token": pa.array(g["token"].to_numpy(), pa.string()),
                "tf": pa.array(g["tf"].to_numpy().astype("int64"), pa.int64()),
            }
        )

    return tf_rows


def tfidf_topk(
    ds,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    idf_scale: int = 1_000_000,
    vocab_broadcast_limit: int | None = None,
    num_partitions: int | None = None,
):
    """Top-``k`` TF-IDF terms per document — integer-exact by design so
    the DuckDB oracle hash-matches: tf is an integer count, idf is
    ``floor(idf_scale · ln(n_docs / df))`` (one libm ``ln`` per distinct
    token, identical in numpy and DuckDB on the same host), and the
    score is their int64 product.

    Shape: per-batch exact (doc, token, tf) rows — a document's text is
    ONE input row, so its term counts never span batches and tf needs NO
    shuffle. df is one vocab-sized shuffle over those rows (each (doc,
    token) appears once). The idf map is vocab-sized: broadcast via
    ``ray.put`` under ``vocab_broadcast_limit``, reduce-side
    ``hash_join`` above. The final per-doc ranking is ``grouped_topk``
    (per-batch combiner, candidate-sized shuffle). ``n_docs`` is the
    TOTAL corpus document count (caller-supplied — parquet footers know
    it without a scan).

    Output: ``(id_col, token, tf, score, rn)`` with ``rn`` the 1-based
    rank (score desc, token asc).
    """
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.window import grouped_topk

    limit = TFIDF_VOCAB_BROADCAST_LIMIT if vocab_broadcast_limit is None else vocab_broadcast_limit

    tf_ds = ds.map_batches(
        _tf_rows_fn(id_col, text_col), batch_format="pyarrow"
    ).materialize()
    # each (doc, token) appears exactly once above → df = row count/token
    df_ds = partial_groupby_agg(
        tf_ds.map_batches(lambda t: t.select(["token"]), batch_format="pyarrow"),
        ["token"],
        {"df": (None, "count")},
        num_partitions=num_partitions,
        empty_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    ).materialize()

    def idf_of(df_arr: np.ndarray) -> np.ndarray:
        return np.floor(
            idf_scale * np.log(float(n_docs) / df_arr.astype("float64"))
        ).astype("int64")

    if df_ds.count() <= limit:
        import ray

        vocab = df_ds.to_pandas()
        idf_map_ref = ray.put(
            dict(zip(vocab["token"], idf_of(vocab["df"].to_numpy())))
        )

        def score(t: pa.Table) -> pa.Table:
            import ray as _ray

            m = _ray.get(idf_map_ref)
            toks = t.column("token").to_pandas()
            idf = toks.map(m).to_numpy().astype("int64")
            return t.append_column(
                "score",
                pa.array(t.column("tf").to_numpy() * idf, pa.int64()),
            )

        scored = tf_ds.map_batches(score, batch_format="pyarrow")
    else:
        from cartography_ray.ops.joins import hash_join

        idf_ds = df_ds.map_batches(
            lambda t: pa.table(
                {
                    "token": t.column("token"),
                    "idf": pa.array(
                        idf_of(t.column("df").to_numpy(zero_copy_only=False)), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            tf_ds, idf_ds, left_on="token", num_partitions=num_partitions
        )
        scored = joined.map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    "token": t.column("token"),
                    "tf": t.column("tf"),
                    "score": pc.multiply(t.column("tf"), t.column("idf")),
                }
            ),
            batch_format="pyarrow",
        )

    return grouped_topk(
        scored, id_col, "score", k=k, descending=True, tiebreak=["token"],
        num_partitions=num_partitions,
    )


def pack_sequences(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    budget: int = 512,
    num_buckets: int = 64,
    num_partitions: int | None = None,
    chunk_us: int | None = None,
):
    """Sequence packing for pretraining: assign every document to a
    fixed-token-budget training bin within its group (offset binning) —
    ``bin = exclusive_prefix_tokens // budget`` over the ``(group, id)``
    order. Output: ``(group_col, id_col, n_tokens, bin)``.

    Bins fill greedily in id order; a document whose tokens straddle a
    boundary belongs to the bin its FIRST token falls in, so a bin's
    total is < ``budget + max_doc_tokens`` — the contract used by
    fixed-length packing with cross-boundary truncation at training
    time. Deterministic (no RNG), resume-identical.

    Shape: token counting is a shuffle-free ``map_batches`` (ASCII
    whitespace class, identical in Python re and DuckDB RE2 — see
    ``chunk_documents``); the global per-group prefix is ONE key shuffle
    via ``ops.window.running_sum`` (pass ``chunk_us`` to spread a
    corpus-scale group across reducers); the bin arithmetic is a pure
    vectorized epilogue. SQL twin: ``(SUM(n) OVER (PARTITION BY group
    ORDER BY id) - n) // budget``.
    """
    from cartography_ray.ops.window import running_sum

    ws = re.compile(r"[ \t\n\r\f\v]+")

    def count_tokens(batch: pa.Table) -> pa.Table:
        n = np.fromiter(
            (
                sum(1 for x in ws.split(t or "") if x)
                for t in batch.column(text_col).to_pylist()
            ),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                group_col: batch.column(group_col),
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")
    run = running_sum(
        counted,
        key=group_col,
        order_cols=[id_col],
        value_col="n_tokens",
        out_col="__run",
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        chunk_us=chunk_us,
        ts_col=id_col if chunk_us is not None else None,
    )

    def binned(batch: pa.Table) -> pa.Table:
        prefix = pc.subtract(batch.column("__run"), batch.column("n_tokens"))
        return pa.table(
            {
                group_col: batch.column(group_col),
                id_col: batch.column(id_col),
                "n_tokens": batch.column("n_tokens"),
                "bin": pc.divide(prefix, pa.scalar(int(budget), pa.int64())),
            }
        )

    return run.map_batches(binned, batch_format="pyarrow")


# PII pattern families, applied IN ORDER (urls first — they may contain
# '@' or digit runs that the later patterns would chew on). RE2 syntax
# only: the engine runs them through pyarrow.compute (RE2) and the
# oracle through DuckDB (also RE2), so match semantics are identical by
# construction — [0-9] instead of \d (Python-unicode vs RE2-ASCII
# divergence is impossible because Python re is not involved).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ \t\n\r\f\v]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("handle", r"@[A-Za-z0-9_]+", "<HANDLE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(ds, id_cols: list[str], text_col: str = "text"):
    """Redact PII-like spans (URLs, emails, @handles, IPv4s) and count
    them per row — the scrubbing step before text leaves a curation
    pipeline. Output: ``id_cols + [text_col] + n_<family>...`` with the
    text fully redacted and each count taken at its stage (i.e. on the
    text AFTER the earlier families were replaced, so an email's
    '@domain' tail is never double-counted as a handle).

    Pure shuffle-free ``map_batches``: both the counts
    (``count_substring_regex``) and the replacements
    (``replace_substring_regex``) are Arrow C++ kernels over the column
    — no per-row Python, no state, trivially scale-free.
    """

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column(text_col), pa.string())
        counts: dict[str, pa.Array] = {}
        for name, pat, token in PII_PATTERNS:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64()
            )
            txt = pc.replace_substring_regex(txt, pattern=pat, replacement=token)
        cols = {c: batch.column(c) for c in id_cols}
        cols[text_col] = txt
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def lm_score(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    nll_scale: int = 1_000_000,
    vocab_broadcast_limit: int | None = None,
    num_partitions: int | None = None,
):
    """Perplexity-proxy quality scoring with a corpus-trained unigram LM
    (the CCNet-style "score every document against a language model"
    filter step, with the corpus itself as the model so the operator is
    self-contained and cross-engine checkable). For each document:
    ``nll = Σ_tokens tf·floor(nll_scale·ln(T / c(token)))`` where ``c``
    is the token's corpus count and ``T`` the corpus token total —
    an integer-exact negative-log-likelihood sum (consumers divide by
    ``n_tokens`` for the per-token quality signal; high = surprising /
    low-quality-or-rare). Output: ``(id_col, n_tokens, nll)``, one row
    per document with ≥1 token (zero-token docs emit nothing — they have
    no likelihood; filter them upstream with a quality gate).

    Integer-exact by the same construction as ``tfidf_topk``: ONE libm
    ``ln`` per distinct token on an int-ratio input — bit-identical in
    numpy and DuckDB on the same host — then int64 multiply/sum.

    Shape: per-batch exact tf rows (no shuffle, see ``_tf_rows_fn``) →
    vocab-sized count aggregation (ONE shuffle of per-batch partials) →
    nll map broadcast ≤ ``vocab_broadcast_limit`` / ``hash_join`` above
    → doc-keyed sum aggregation (per-batch combiner, ONE shuffle of
    doc-sized partials). The corpus token stream itself never shuffles.
    """
    import ray

    from cartography_ray.ops.agg import partial_groupby_agg

    limit = (
        TFIDF_VOCAB_BROADCAST_LIMIT
        if vocab_broadcast_limit is None
        else vocab_broadcast_limit
    )

    tf_ds = ds.map_batches(
        _tf_rows_fn(id_col, text_col), batch_format="pyarrow"
    ).materialize()
    id_type = _arrow_field_type(tf_ds, id_col)
    counts = partial_groupby_agg(
        tf_ds,
        ["token"],
        {"c": ("tf", "sum")},
        num_partitions=num_partitions,
        empty_schema=pa.schema([("token", pa.string()), ("c", pa.int64())]),
    ).materialize()
    if counts.count() == 0:
        return ray.data.from_arrow(
            pa.schema(
                [(id_col, id_type), ("n_tokens", pa.int64()), ("nll", pa.int64())]
            ).empty_table()
        )
    total = int(counts.sum("c"))

    def nll_of(c: np.ndarray) -> np.ndarray:
        return np.floor(
            nll_scale * np.log(float(total) / c.astype("float64"))
        ).astype("int64")

    if counts.count() <= limit:
        vocab = counts.to_pandas()
        nll_map_ref = ray.put(
            dict(zip(vocab["token"], nll_of(vocab["c"].to_numpy())))
        )

        # a document's tf rows all live in ONE tf_ds block (see
        # _tf_rows_fn), so the per-doc fold is a per-batch groupby —
        # the broadcast path needs NO doc-keyed shuffle at all (it was
        # a third fixed-cost exchange; assumes unique ids, like every
        # documents-table operator here)
        def weigh_fold(t: pa.Table) -> pa.Table:
            import pandas as pd
            import ray as _ray

            m = _ray.get(nll_map_ref)
            toks = t.column("token").to_pandas()
            nll = toks.map(m).to_numpy().astype("int64")
            tf = t.column("tf").to_numpy(zero_copy_only=False)
            df = pd.DataFrame(
                {
                    "__id": t.column(id_col).to_numpy(zero_copy_only=False),
                    "n_tokens": tf,
                    "nll": tf * nll,
                }
            )
            g = df.groupby("__id", sort=False, as_index=False).sum()
            return pa.table(
                {
                    id_col: pa.array(g["__id"].to_numpy(), id_type),
                    "n_tokens": pa.array(g["n_tokens"].to_numpy().astype("int64"), pa.int64()),
                    "nll": pa.array(g["nll"].to_numpy().astype("int64"), pa.int64()),
                }
            )

        return tf_ds.map_batches(weigh_fold, batch_format="pyarrow")
    else:
        from cartography_ray.ops.joins import hash_join

        nll_ds = counts.map_batches(
            lambda t: pa.table(
                {
                    "token": t.column("token"),
                    "nll": pa.array(
                        nll_of(t.column("c").to_numpy(zero_copy_only=False)),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        weighted = hash_join(
            tf_ds, nll_ds, left_on="token", num_partitions=num_partitions
        ).map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    "tf": t.column("tf"),
                    "w": pc.multiply(t.column("tf"), t.column("nll")),
                }
            ),
            batch_format="pyarrow",
        )

    return partial_groupby_agg(
        weighted,
        [id_col],
        {"n_tokens": ("tf", "sum"), "nll": ("w", "sum")},
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [(id_col, id_type), ("n_tokens", pa.int64()), ("nll", pa.int64())]
        ),
    )


def _arrow_field_type(ds, col: str) -> pa.DataType:
    schema = ds.schema()
    return schema.base_schema.field(col).type if hasattr(
        schema, "base_schema"
    ) else schema.field(col).type


# explicit ASCII whitespace inside the class (no \s: Python re is
# unicode-aware where RE2 is ASCII) so engine and oracle tokenize URLs
# identically; group 1 is the host
URL_DOMAIN_RE = r"https?://([^/ \t\n\r\f\v:]+)"


def domain_frequency(ds, text_col: str = "text", top_n: int = 100,
                     num_partitions: int | None = None):
    """Top source domains by URL mention count (the web-curation
    blocklist / per-domain mixing sweep): extract every URL host from
    the text, lowercase, count corpus-wide, return the top ``top_n``
    as ``(domain, n)`` — count desc, domain asc.

    Same shape as ``token_frequency``: per-batch extract+count combiner
    (compiled ``findall`` per row is the only per-row work — C-level
    regex scan) → ONE domain-keyed shuffle of domain-sized partials →
    per-block prune → candidate-only global sort. SQL twin:
    ``regexp_extract_all(text, pat, 1)`` + GROUP BY.
    """
    import pandas as pd

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.runtime import drop_empty_blocks

    pat = re.compile(URL_DOMAIN_RE)

    def extract_count(batch: pa.Table) -> pa.Table:
        doms: list[str] = []
        for t in batch.column(text_col).to_pylist():
            if t:
                doms.extend(pat.findall(t))
        vc = pd.Series([d.lower() for d in doms], dtype="object").value_counts(
            sort=False
        )
        return pa.table(
            {
                "domain": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy().astype("int64"), pa.int64()),
            }
        )

    totals = partial_groupby_agg(
        ds.map_batches(extract_count, batch_format="pyarrow"),
        ["domain"], {"n": ("n", "sum")}, num_partitions=num_partitions,
        empty_schema=pa.schema([("domain", pa.string()), ("n", pa.int64())]),
    ).materialize()
    if totals.count() == 0:
        return totals

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "domain"], ascending=[False, True], kind="mergesort"
        ).head(top_n)
        return pa.table(
            {
                "domain": pa.array(df["domain"].to_numpy(), pa.string()),
                "n": pa.array(df["n"].to_numpy().astype("int64"), pa.int64()),
            }
        )

    pruned = drop_empty_blocks(totals.map_batches(prune, batch_format="pyarrow"))
    return pruned.sort(["n", "domain"], descending=[True, False]).limit(top_n)


# GPT-2-style pre-tokenizer, RE2-compatible (ASCII classes, no
# lookahead — RE2 has none): contractions, then optionally-space-
# prefixed letter runs / digit runs / punctuation runs. No whitespace
# alternative: the scan simply skips unmatched whitespace, so counting
# matches counts pre-tokens directly. The engine counts it with Arrow's
# RE2 and the oracle with DuckDB's RE2, so Python re (whose quantifier
# semantics could differ) is never involved.
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9 \t\n\r\f\v]+"
)


def bpe_token_count(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Token counting the way a BPE training-data budget does it
    (SURVEY §2.13 "whitespace + a BPE-ish regex"): per document, the
    whitespace token count AND the GPT-2-style pre-token count
    (``BPE_SPLIT_RE`` matches — the units a byte-pair tokenizer would
    start from, a far better proxy for model tokens than whitespace
    words on code/punctuation-heavy text).
    Output: ``(id_col, n_ws_tokens, n_bpe_tokens)``.

    Shuffle-free ``map_batches``; both counts are single Arrow RE2
    kernels over the column — no per-row Python.
    """

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column(text_col), pa.string())
        # whitespace tokens = non-whitespace runs
        n_ws = pc.count_substring_regex(txt, r"[^ \t\n\r\f\v]+")
        n_bpe = pc.count_substring_regex(txt, BPE_SPLIT_RE)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_ws_tokens": pc.cast(n_ws, pa.int64()),
                "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def source_temperature_weights(
    ds,
    group_col: str = "source",
    size_col: str = "n_chars",
    alpha: float = 0.7,
    score_scale: int = 1_000_000,
):
    """Temperature-scaled corpus mixing weights — the multinomial
    sampling-weight computation multi-source LM training uses
    (w_s ∝ (size_s / total)^α with α < 1 upweighting small sources;
    α=1 is proportional, α=0 uniform).

    Distribution: per-source (count, size) via ``bounded_groupby_agg``
    (sources are dimension-bounded by contract; the partials stream
    through the driver fold, never the corpus). The weight arithmetic
    is integer-exact cross-engine: per-source scores are
    ``floor(scale · pow(size/total, α))`` in int64 (one libm ``pow``
    per source, identical in numpy and DuckDB on the same host) and
    the normalizer is an ORDER-FREE int64 sum, so the one final IEEE
    division matches the SQL twin bit-for-bit.

    Returns a pyarrow.Table (dimension-sized by contract):
    ``(group_col, n_docs, chars, score, weight6)``.
    """
    import numpy as np

    from cartography_ray.ops.agg import bounded_groupby_agg

    stats = bounded_groupby_agg(
        ds, group_col, {"n_docs": (None, "count"), "chars": (size_col, "sum")}
    )
    chars = stats.column("chars").to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(chars.sum())
    score = np.floor(
        score_scale * np.power(chars.astype(np.float64) / float(max(total, 1)), alpha)
    ).astype(np.int64)
    tsc = int(score.sum())
    weight6 = pc.round(
        pa.array(score.astype(np.float64) / float(max(tsc, 1)), pa.float64()),
        6,
        round_mode="half_towards_infinity",  # == DuckDB round()
    )
    return pa.table(
        {
            group_col: stats.column(group_col),
            "n_docs": pc.cast(stats.column("n_docs"), pa.int64()),
            "chars": pa.array(chars, pa.int64()),
            "score": pa.array(score, pa.int64()),
            "weight6": weight6,
        }
    )


def bm25_topk(
    ds,
    terms: list[str],
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf_scale: int = 1_000_000,
):
    """Top-``k`` documents by BM25 score for a fixed query-term list —
    the retrieval-ranking member of the text family (Robertson/Sparck
    Jones idf, Okapi tf saturation). Integer-exact across engines the
    same way ``events_corr`` is: every float input (tf, dl, df, N) is
    an EXACT integer, avgdl is one double division of two exact ints,
    idf is ``floor(idf_scale·ln(1 + (N−df+0.5)/(df+0.5)))`` (one libm
    ``ln`` per TERM — query-sized, the tfidf/lm_score idiom), each
    per-term score is floored to int64 micro-units with the IDENTICAL
    float64 expression tree on both engines (IEEE +,×,/ are correctly
    rounded), and the per-doc sum is then an order-free int64 sum.

    Shape: one pass over the text emits a per-doc compact projection
    (doc_id, dl, tf per query term — query-sized width, never the
    token stream); a block-count-bounded stats fold derives df/avgdl
    driver-side (query-sized scalars); scoring + global top-k then run
    over the materialized projection (per-block prune, driver final
    sees ≤ k×blocks candidate rows). Docs containing no query term
    never leave the scoring filter.
    """
    import math

    import pandas as pd

    terms = list(terms)
    m = len(terms)

    def per_doc(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lists = pc.split_pattern_regex(lowered, VOCAB_SPLIT_RE)
        flat = pc.list_flatten(lists).combine_chunks()
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dl = np.bincount(parent[ne], minlength=n).astype("int64")
        cols = {
            id_col: batch.column(id_col),
            "dl": pa.array(dl, pa.int64()),
        }
        for i, t in enumerate(terms):
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            cols[f"tf_{i}"] = pa.array(
                np.bincount(parent[hit], minlength=n).astype("int64"), pa.int64()
            )
        return pa.table(cols)

    proj = ds.map_batches(per_doc, batch_format="pyarrow").materialize()

    def stats(batch: pa.Table) -> pa.Table:
        out = {"dl_sum": pa.array([int(pc.sum(batch.column("dl")).as_py() or 0)], pa.int64())}
        for i in range(m):
            out[f"df_{i}"] = pa.array(
                [int(pc.sum(pc.cast(pc.greater(batch.column(f"tf_{i}"), 0), pa.int64())).as_py() or 0)],
                pa.int64(),
            )
        return pa.table(out)

    st = proj.map_batches(stats, batch_format="pyarrow").to_pandas().sum()
    total_tokens = int(st["dl_sum"])
    avgdl = float(total_tokens) / float(n_docs)
    idf6 = []
    for i in range(m):
        dfi = int(st[f"df_{i}"])
        idf6.append(
            int(math.floor(idf_scale * math.log(1.0 + (float(n_docs) - dfi + 0.5) / (dfi + 0.5))))
        )

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def score(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(dl)
        s = np.zeros(n, dtype=np.int64)
        any_hit = np.zeros(n, dtype=bool)
        for i in range(m):
            tf = batch.column(f"tf_{i}").to_numpy(zero_copy_only=False).astype(np.float64)
            # expression tree mirrored EXACTLY in the SQL twin
            term = np.floor(
                float(idf6[i]) * ((tf * k1p1) / (tf + k1 * (one_minus_b + b * dl / avgdl)))
            )
            hit = tf > 0
            s[hit] += term[hit].astype(np.int64)
            any_hit |= hit
        return pa.table(
            {
                id_col: batch.column(id_col).filter(pa.array(any_hit)),
                "score_micro": pa.array(s[any_hit], pa.int64()),
            }
        )

    scored = proj.map_batches(score, batch_format="pyarrow")

    def prune(bdf: pd.DataFrame) -> pd.DataFrame:
        return bdf.sort_values(
            ["score_micro", id_col], ascending=[False, True]
        ).head(k)

    final = (
        scored.map_batches(prune, batch_format="pandas")
        .to_pandas()
        .sort_values(["score_micro", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    final["rn"] = np.arange(1, len(final) + 1, dtype=np.int64)
    return pa.Table.from_pandas(final, preserve_index=False).replace_schema_metadata(None)
