"""BPE merge training (byte-pair-encoding vocabulary induction) —
Sennrich-style: learn the n highest-frequency adjacent-symbol merges
over a corpus, with an end-of-word marker and deterministic
lexicographic tie-breaks.

Shape (Ray-Data-first): the corpus reduces ONCE to a (word, count)
vocabulary table — per-batch lowercase/split/count combiner → one
word-keyed shuffle of vocab-sized partials; corpus bytes are touched
exactly once. The merge loop then runs over that bounded table:

- driver tier (vocab ≤ ``BPE_DRIVER_VOCAB_LIMIT``, the realistic path —
  natural-language vocabularies are millions of words, not
  corpus-scale): vectorized pandas kernels — explode + shifted-equality
  pair counting, boundary-anchored regex-sub merges (leftmost-greedy
  non-overlapping == the classic in-word merge order).
- distributed tier (above the limit): each round runs the SAME kernels
  per block — pair-count combiner → pair-keyed ``partial_groupby_agg``
  → top-1 fold → the chosen merge applied per batch. n_merges × one
  vocab-partial shuffle; nothing vocab-sized on the driver. Both tiers
  are equality-tested.

Not SQL-expressible (iterative argmax + rewrite), so the catalogue
entry is rows-only; correctness is a pure-python reference-
implementation equality test (tests/test_fuzzy.py's sibling in
tests/test_functions.py).

Symbols are joined with the \\x01 separator inside a word's working
representation (stripped from input text defensively), so merges and
pair counts are plain vectorized string ops, never per-word Python.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BPE_SEP = "\x01"  # intra-word symbol separator (stripped from input)
BPE_EOW = "</w>"  # end-of-word marker symbol
BPE_DRIVER_VOCAB_LIMIT = 2_000_000


def _bpe_word_counts(ds, text_col: str, num_partitions: int | None):
    """Distributed corpus → (word, c) reduction."""
    from cartography_ray.ops.agg import partial_groupby_agg

    def wc(batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
        lowered = pc.replace_substring(lowered, BPE_SEP, "")
        lowered = pc.replace_substring(lowered, BPE_EOW, "")
        toks = pc.list_flatten(pc.split_pattern_regex(lowered, r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pd.Series(toks.to_pandas()).value_counts(sort=False)
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(), pa.string()),
                "c": pa.array(vc.to_numpy().astype("int64"), pa.int64()),
            }
        )

    return partial_groupby_agg(
        ds.map_batches(wc, batch_format="pyarrow"),
        ["word"],
        {"c": ("c", "sum")},
        num_partitions=num_partitions,
        empty_schema=pa.schema([("word", pa.string()), ("c", pa.int64())]),
    )


def _bpe_rep(words: pd.Series) -> pd.Series:
    """Initial representation: characters joined by BPE_SEP plus the
    end-of-word symbol — 'low' becomes 'l<SEP>o<SEP>w<SEP></w>'.
    Vectorized: one regex insertion at every intra-word boundary."""
    return (
        words.str.replace(r"(?<=.)(?=.)", BPE_SEP, regex=True)
        + BPE_SEP
        + BPE_EOW
    )


def _bpe_pair_counts(rep: pd.Series, counts: np.ndarray) -> pd.DataFrame:
    """Adjacent-symbol pair counts over spaced-symbol words, weighted by
    word count — explode + shifted index equality, no per-word Python."""
    parts = rep.str.split(BPE_SEP)
    flat = parts.explode()
    wid = flat.index.to_numpy()
    sym = flat.to_numpy()
    if len(sym) < 2:
        return pd.DataFrame({"l": [], "r": [], "c": []})
    same = wid[1:] == wid[:-1]
    df = pd.DataFrame(
        {
            "l": sym[:-1][same],
            "r": sym[1:][same],
            "c": counts[wid[:-1][same]],
        }
    )
    return df.groupby(["l", "r"], sort=False)["c"].sum().reset_index()


def _bpe_apply_merge(rep: pd.Series, left: str, right: str) -> pd.Series:
    """Merge every boundary-aligned occurrence of (left, right):
    leftmost-greedy, non-overlapping — regex ``sub`` semantics match the
    classic in-word merge order (on 'a a a a' the (a,a) merge yields
    'aa aa', never reusing a just-merged token as a left operand)."""
    pat = re.compile(
        "(?:^|(?<=" + re.escape(BPE_SEP) + "))"
        + re.escape(left + BPE_SEP + right)
        + "(?=$|" + re.escape(BPE_SEP) + ")"
    )
    repl = (left + right).replace("\\", "\\\\")
    return rep.str.replace(pat, repl, regex=True)


def train_bpe_merges(
    ds,
    text_col: str = "text",
    n_merges: int = 50,
    num_partitions: int | None = None,
    driver_vocab_limit: int | None = None,
):
    """Learn ``n_merges`` BPE merges; returns a Dataset
    ``(rank, left, right, freq)`` — the merge table a tokenizer applies
    in rank order. Ties break on the lexicographically smallest
    (left, right), so the result is deterministic cross-engine. See the
    module docstring for the tier split."""
    from cartography_ray.ops.agg import _to_clean_arrow, partial_groupby_agg, topk
    from cartography_ray.runtime import drop_empty_blocks

    limit = BPE_DRIVER_VOCAB_LIMIT if driver_vocab_limit is None else driver_vocab_limit
    words = _bpe_word_counts(ds, text_col, num_partitions).materialize()
    n_vocab = words.count()
    out_schema = pa.schema(
        [("rank", pa.int64()), ("left", pa.string()),
         ("right", pa.string()), ("freq", pa.int64())]
    )

    def _result(merges: list[tuple[str, str, int]]):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "rank": pa.array(np.arange(len(merges), dtype="int64")),
                    "left": pa.array([m[0] for m in merges], pa.string()),
                    "right": pa.array([m[1] for m in merges], pa.string()),
                    "freq": pa.array([m[2] for m in merges], pa.int64()),
                },
                schema=out_schema,
            )
        )

    if n_vocab == 0:
        return _result([])

    if n_vocab <= limit:
        pdf = words.to_pandas()
        rep = _bpe_rep(pdf["word"].astype(str)).reset_index(drop=True)
        counts = pdf["c"].to_numpy()
        merges: list[tuple[str, str, int]] = []
        for _ in range(n_merges):
            pairs = _bpe_pair_counts(rep, counts)
            if not len(pairs):
                break
            best = pairs.sort_values(
                ["c", "l", "r"], ascending=[False, True, True], kind="mergesort"
            ).iloc[0]
            merges.append((best["l"], best["r"], int(best["c"])))
            rep = _bpe_apply_merge(rep, best["l"], best["r"])
        return _result(merges)

    # distributed tier: the vocabulary itself exceeds the driver bound
    def to_rep(batch: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {"rep": _bpe_rep(batch["word"].astype(str)), "c": batch["c"]}
        )
        return _to_clean_arrow(out)

    reps = words.map_batches(to_rep, batch_format="pandas").materialize()
    merges = []
    for _ in range(n_merges):

        def pair_partials(batch: pd.DataFrame) -> pa.Table:
            return _to_clean_arrow(
                _bpe_pair_counts(
                    batch["rep"].reset_index(drop=True), batch["c"].to_numpy()
                )
            )

        pairs = partial_groupby_agg(
            drop_empty_blocks(reps.map_batches(pair_partials, batch_format="pandas")),
            ["l", "r"],
            {"c": ("c", "sum")},
            num_partitions=num_partitions,
            empty_schema=pa.schema(
                [("l", pa.string()), ("r", pa.string()), ("c", pa.int64())]
            ),
        )
        if pairs.count() == 0:
            break
        top = topk(pairs, "c", 1, descending=True, tiebreak=["l", "r"]).take(1)[0]
        left, right, freq = top["l"], top["r"], int(top["c"])
        merges.append((left, right, freq))

        def apply(batch: pd.DataFrame, _l=left, _r=right) -> pa.Table:
            out = pd.DataFrame(
                {"rep": _bpe_apply_merge(batch["rep"], _l, _r), "c": batch["c"]}
            )
            return _to_clean_arrow(out)

        reps = reps.map_batches(apply, batch_format="pandas").materialize()
    return _result(merges)


class BpeEncoder:
    """Actor-pool tokenizer-apply stage: the other half of the BPE loop
    (``train_bpe_merges`` learns the merge table, this applies it).

    State per ACTOR, not per batch: the merge table is pulled from the
    object store once and its ``n_merges`` boundary-anchored regexes are
    compiled in ``__init__``. Per batch, the classic unique-word cache
    trick keeps the work sublinear in corpus size: merges rewrite only
    the batch's DISTINCT words (vectorized ``str.replace`` in rank
    order — identical leftmost-greedy semantics to training), then
    per-word token counts fan back to documents with a groupby sum.
    Emits ``(id_col, n_words, bpe_n_tokens)``; empty/whitespace docs
    count zero of both.
    """

    def __init__(self, merges_ref, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.text_col, self.id_col = text_col, id_col
        self.steps = [
            (
                re.compile(
                    "(?:^|(?<=" + re.escape(BPE_SEP) + "))"
                    + re.escape(left + BPE_SEP + right)
                    + "(?=$|" + re.escape(BPE_SEP) + ")"
                ),
                (left + right).replace("\\", "\\\\"),
            )
            for left, right in merges
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(self.id_col), pa.int64())
        lowered = pc.utf8_lower(
            pc.fill_null(pc.cast(batch.column(self.text_col), pa.string()), "")
        )
        lowered = pc.replace_substring(lowered, BPE_SEP, "")
        lowered = pc.replace_substring(lowered, BPE_EOW, "")
        toks = pc.split_pattern_regex(lowered, r"\s+")
        flat = pd.Series(pc.list_flatten(toks).to_pandas())
        doc_of = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False),
        )
        keep = flat.to_numpy() != ""
        flat, doc_of = flat[keep].reset_index(drop=True), doc_of[keep]
        uniq, inv = np.unique(flat.to_numpy(), return_inverse=True)
        rep = _bpe_rep(pd.Series(uniq, dtype=object))
        for pat, repl in self.steps:
            rep = rep.str.replace(pat, repl, regex=True)
        word_tokens = (rep.str.count(re.escape(BPE_SEP)) + 1).to_numpy(np.int64)
        per_doc_tokens = np.zeros(batch.num_rows, np.int64)
        np.add.at(per_doc_tokens, doc_of, word_tokens[inv])
        per_doc_words = np.zeros(batch.num_rows, np.int64)
        np.add.at(per_doc_words, doc_of, 1)
        return pa.table(
            {
                self.id_col: ids,
                "n_words": pa.array(per_doc_words, pa.int64()),
                "bpe_n_tokens": pa.array(per_doc_tokens, pa.int64()),
            }
        )


def bpe_encode(
    ds,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
    batch_size: int | None = None,
):
    """Apply a trained merge table to a corpus (actor pool — regexes
    compiled once per actor, merge table broadcast once via ``ray.put``).
    Shuffle-free: pure per-batch transform."""
    import ray

    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={
            "merges_ref": ray.put([(l, r) for l, r in merges]),
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
