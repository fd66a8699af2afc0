"""BPE merge training (functions/bpe.py): equality against a pure-python
Sennrich reference, driver vs distributed tier identity, and tie-break
determinism."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest


def _ref_bpe(word_counts: dict, n: int):
    """Textbook Sennrich BPE: count adjacent pairs over the vocabulary
    (weighted), merge the most frequent (ties: lexicographically
    smallest pair), leftmost-greedy within a word."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        new = {}
        for sym, cc in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + cc
        vocab = new
    return merges


def _corpus_df(rng, n_docs=60):
    words = ["low", "lower", "lowest", "newer", "newest", "wide", "wider",
             "aaaa", "aaa", "banana", "bandana", "cab", "abc"]
    docs = [
        " ".join(rng.choice(words, int(rng.integers(5, 40))))
        for _ in range(n_docs)
    ]
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype="int64"), "text": docs})


def _want_merges(df, n):
    toks = " ".join(df["text"]).lower().split()
    return _ref_bpe(Counter(toks), n)


def test_bpe_matches_reference(ray_session):
    import ray.data

    from cartography_ray.functions.bpe import train_bpe_merges

    rng = np.random.default_rng(61)
    df = _corpus_df(rng)
    want = _want_merges(df, 25)
    assert len(want) == 25

    got = train_bpe_merges(
        ray.data.from_pandas(df).repartition(5), n_merges=25, num_partitions=4
    ).to_pandas()
    got_list = list(zip(got["left"], got["right"], got["freq"]))
    assert got_list == want
    assert got["rank"].tolist() == list(range(25))


def test_bpe_distributed_tier_matches_driver(ray_session):
    import ray.data

    from cartography_ray.functions.bpe import train_bpe_merges

    rng = np.random.default_rng(67)
    df = _corpus_df(rng, n_docs=30)
    ds = ray.data.from_pandas(df).repartition(4)
    drv = train_bpe_merges(ds, n_merges=8, num_partitions=4).to_pandas()
    dist = train_bpe_merges(
        ds, n_merges=8, num_partitions=4, driver_vocab_limit=0
    ).to_pandas()
    pd.testing.assert_frame_equal(drv, dist)


def test_bpe_overlap_and_exhaustion(ray_session):
    """'aaaa' exercises the leftmost-greedy non-overlap rule; a tiny
    corpus exhausts its merges before n_merges and must stop early."""
    import ray.data

    from cartography_ray.functions.bpe import train_bpe_merges

    df = pd.DataFrame({"text": ["aa aa aaaa", "ab"]})
    want = _want_merges(df, 50)
    got = train_bpe_merges(ray.data.from_pandas(df), n_merges=50).to_pandas()
    assert list(zip(got["left"], got["right"], got["freq"])) == want
    assert len(got) < 50  # exhausted


def _ref_encode_counts(text: str, merges: list):
    """Textbook BPE APPLY: split to words, char+</w> symbols, apply the
    merge list in rank order (leftmost-greedy), count symbols."""
    total_tokens = 0
    n_words = 0
    for w in text.lower().split():
        sym = list(w) + ["</w>"]
        for l, r in merges:
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        total_tokens += len(sym)
        n_words += 1
    return n_words, total_tokens


def test_bpe_encode_matches_reference(ray_session):
    """The tokenizer-apply stage (functions/bpe.bpe_encode) equals the
    textbook per-word merge loop on every document, including empty and
    null texts; zero merges degrades to chars+1 per word."""
    import ray.data

    from cartography_ray.functions.bpe import bpe_encode, train_bpe_merges

    rng = np.random.default_rng(71)
    df = _corpus_df(rng, n_docs=40)
    df.loc[3, "text"] = ""          # empty doc
    df.loc[7, "text"] = "   "       # whitespace-only
    df = pd.concat(
        [df, pd.DataFrame({"doc_id": [999], "text": [None]})], ignore_index=True
    )
    merges_df = train_bpe_merges(
        ray.data.from_pandas(df), n_merges=20, num_partitions=4
    ).to_pandas()
    merges = list(zip(merges_df["left"], merges_df["right"]))

    got = (
        bpe_encode(ray.data.from_pandas(df).repartition(4), merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(df)
    for _, row in df.iterrows():
        nw, nt = _ref_encode_counts(row["text"] or "", merges)
        g = got[got["doc_id"] == row["doc_id"]].iloc[0]
        assert (g["n_words"], g["bpe_n_tokens"]) == (nw, nt), row["doc_id"]

    # zero merges: every word costs len(word)+1 symbols
    got0 = bpe_encode(ray.data.from_pandas(df), [], concurrency=2).to_pandas()
    want0 = {
        int(r["doc_id"]): sum(len(w) + 1 for w in (r["text"] or "").lower().split())
        for _, r in df.iterrows()
    }
    for _, g in got0.iterrows():
        assert g["bpe_n_tokens"] == want0[int(g["doc_id"])]
