"""Deduplication operator family for training-data pipelines.

Five strategies, each a Dataset transform (SURVEY brief §dedup):

- ``exact_dedup``            — content-hash → hash-partitioned groupby →
  keep min-id row per hash (deterministic representative).
- ``minhash_lsh_pairs``      — shingle → minhash signature → band →
  ``groupby(band, band_hash)`` candidate pairs → exact-Jaccard verify.
- ``simhash_pairs``          — 64-bit simhash, banded into 16-bit chunks
  (hamming ≤ 3 ⇒ at least one identical chunk by pigeonhole), verify by
  true hamming distance.
- ``jaccard_pairs_smallside``— exact O(n·m) n-gram Jaccard against a
  broadcast subset (the oracle-checkable baseline; also the verify
  kernel the LSH paths reuse).
- embedding cosine near-dup  — see functions/ann.py (same machinery).

Scale notes: signatures/bands are computed per batch (stateless,
vectorized-ish); the only shuffles are the band groupby (bounded by
signature width, hot buckets are split by the band hash itself) and the
verify join. Verification fetches text via a broadcast doc map by
default — swap in ops.joins.hash_join for corpora whose keeper table
cannot be broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cartography_ray.functions.text import normalize_text_array

_M61 = (1 << 61) - 1


def _shingles(text: str, k: int) -> set[int]:
    """Character k-gram shingle hashes (stable across processes)."""
    if not text or len(text) < k:
        return {hash_bytes(text.encode())} if text else set()
    arr = {hash_bytes(text[i : i + k].encode()) for i in range(len(text) - k + 1)}
    return arr


def hash_bytes(b: bytes) -> int:
    # FNV-1a 64-bit: deterministic across processes (unlike Python's hash)
    h = 0xCBF29CE484222325
    for byte in b:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: one deterministic keeper (min id) per normalized text.

    hash-partition by fingerprint + per-group min — the MERGE-by-id
    pattern applied to content identity.
    """
    from cartography_ray.runtime import drop_empty_blocks

    def fp(batch: pa.Table) -> pa.Table:
        norm = normalize_text_array(batch.column(text_col))
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "fingerprint": norm,
            }
        )

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_col)

    hashed = ds.map_batches(fp, batch_format="pyarrow")
    return drop_empty_blocks(
        hashed.groupby("fingerprint").map_groups(keep_min, batch_format="pandas")
    )


def _minhash_signature(shingle_sets: list[set[int]], num_perm: int, seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) minhash matrix via universal hashing a*x+b mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=num_perm, dtype=np.int64).astype(object)
    b = rng.integers(0, _M61, size=num_perm, dtype=np.int64).astype(object)
    out = np.full((len(shingle_sets), num_perm), _M61, dtype=np.int64)
    for i, sh in enumerate(shingle_sets):
        if not sh:
            continue
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh)).astype(object)
        # (a*x + b) mod p, per permutation — object dtype avoids overflow
        for j in range(num_perm):
            out[i, j] = int(min((a[j] * xi + b[j]) % _M61 for xi in x))
    return out


class MinHasher:
    """Actor-pool stage: doc batch → (band_id, band_hash, id) rows."""

    def __init__(self, num_perm: int = 32, bands: int = 8, shingle_k: int = 5, seed: int = 7):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k, self.seed = num_perm, bands, shingle_k, seed
        rng = np.random.default_rng(seed)
        # a < 2^29 and 32-bit shingle hashes keep a*x + b < 2^61 inside
        # uint64 — the whole (num_perm × n_shingles) universal hash runs as
        # one vectorized numpy expression, no per-permutation Python loop
        self.a = rng.integers(1, 1 << 29, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles((text or "").lower(), self.k)
        if not sh:
            return np.full(self.num_perm, _M61, dtype=np.int64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh)) & np.uint64(0xFFFFFFFF)
        hashed = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_M61)
        return hashed.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_pylist()
        texts = batch.column("text").to_pylist()
        rows_id, rows_band, rows_hash = [], [], []
        r = self.num_perm // self.bands
        for i, t in enumerate(texts):
            sig = self.signature(t)
            for band in range(self.bands):
                chunk = sig[band * r : (band + 1) * r]
                h = hash_bytes(chunk.tobytes())
                rows_id.append(ids[i])
                rows_band.append(band)
                rows_hash.append(h % (1 << 62))
        return pa.table(
            {
                "doc_id": pa.array(rows_id, pa.int64()),
                "band": pa.array(rows_band, pa.int32()),
                "band_hash": pa.array(rows_hash, pa.int64()),
            }
        )


def _group_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Distinct sorted id-pairs within one (band, band_hash) bucket."""
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    concurrency: int = 4,
):
    """Near-dup pairs via MinHash-LSH with exact-Jaccard verification.

    Returns (id_a, id_b) pairs with char-k-gram Jaccard ≥ threshold.
    Verification broadcasts the (id → text) map — replace with a
    hash_join for corpora that cannot broadcast.
    """
    import ray

    from cartography_ray.runtime import drop_empty_blocks

    banded = ds.map_batches(
        MinHasher(num_perm=num_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    cand = drop_empty_blocks(
        banded.groupby(["band", "band_hash"]).map_groups(_group_pairs, batch_format="pandas")
    )

    # distinct pairs across bands
    def _local_dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    def _head(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    cand = drop_empty_blocks(
        cand.map_batches(_local_dedup, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(_head, batch_format="pandas")
    )

    texts = {}
    for blk in ds.select_columns(["doc_id", "text"]).iter_batches(batch_format="pyarrow"):
        texts.update(zip(blk.column("doc_id").to_pylist(), blk.column("text").to_pylist()))
    texts_ref = ray.put(texts)
    k = shingle_k

    def verify(batch: pa.Table) -> pa.Table:
        tmap = ray.get(texts_ref)
        ia = batch.column("id_a").to_pylist()
        ib = batch.column("id_b").to_pylist()
        keep_a, keep_b, sims = [], [], []
        cache: dict[int, set] = {}

        def sh(i):
            if i not in cache:
                cache[i] = _shingles((tmap.get(i) or "").lower(), k)
            return cache[i]

        for x, y in zip(ia, ib):
            j = jaccard(sh(x), sh(y))
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                sims.append(j)
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


class SimHasher:
    """Actor-pool stage: 64-bit simhash + 16-bit chunk keys per doc."""

    def __init__(self, shingle_k: int = 5):
        self.k = shingle_k

    def simhash(self, text: str) -> int:
        sh = _shingles((text or "").lower(), self.k)
        if not sh:
            return 0
        v = np.zeros(64, dtype=np.int64)
        for h in sh:
            bits = np.unpackbits(np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8))
            v += np.where(bits.astype(np.int64) > 0, 1, -1)
        bits = (v > 0).astype(np.uint8)
        return int.from_bytes(np.packbits(bits).tobytes(), "little")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_pylist()
        hs = [self.simhash(t) for t in batch.column("text").to_pylist()]
        out_id, out_chunk, out_key, out_sim = [], [], [], []
        for i, h in zip(ids, hs):
            for c in range(4):
                out_id.append(i)
                out_chunk.append(c)
                out_key.append((h >> (16 * c)) & 0xFFFF)
                out_sim.append(h % (1 << 62))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk": pa.array(out_chunk, pa.int32()),
                "chunk_key": pa.array(out_key, pa.int64()),
                "simhash_mod": pa.array(out_sim, pa.int64()),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, shingle_k: int = 5, concurrency: int = 4):
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.

    Banding: 4 chunks of 16 bits ⇒ any pair within hamming 3 shares at
    least one chunk (pigeonhole), so the chunk groupby finds all of them;
    verification recomputes true hamming on the full hashes.
    """
    import ray

    from cartography_ray.runtime import drop_empty_blocks

    hashed = ds.map_batches(
        SimHasher(shingle_k=shingle_k), batch_format="pyarrow", concurrency=concurrency
    )
    sims: dict[int, int] = {}
    hashed_mat = drop_empty_blocks(hashed)
    for blk in hashed_mat.iter_batches(batch_format="pyarrow"):
        for i, c, key, m in zip(
            blk.column("doc_id").to_pylist(),
            blk.column("chunk").to_pylist(),
            blk.column("chunk_key").to_pylist(),
            blk.column("simhash_mod").to_pylist(),
        ):
            sims.setdefault(i, 0)
            sims[i] |= int(key) << (16 * int(c))
    sims_ref = ray.put(sims)

    cand = drop_empty_blocks(
        hashed_mat.groupby(["chunk", "chunk_key"]).map_groups(_group_pairs, batch_format="pandas")
    )

    def _local_dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates()

    def _head(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    cand = drop_empty_blocks(
        cand.map_batches(_local_dedup, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(_head, batch_format="pandas")
    )

    def verify(batch: pa.Table) -> pa.Table:
        smap = ray.get(sims_ref)
        keep_a, keep_b, dists = [], [], []
        for x, y in zip(batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()):
            d = bin(smap.get(x, 0) ^ smap.get(y, 0)).count("1")
            if d <= max_hamming:
                keep_a.append(x)
                keep_b.append(y)
                dists.append(d)
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
                "hamming": pa.array(dists, pa.int64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def jaccard_pairs_smallside(
    ds,
    subset_ids: list[int],
    threshold: float,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact n-gram Jaccard pairs of the corpus × a broadcast subset.

    The oracle-checkable baseline: every (row, subset-doc) pair with
    id_row < id_subset and Jaccard ≥ threshold. O(n·|subset|) — subset
    must be broadcastable.
    """
    import ray

    sub = set(subset_ids)
    texts = {}
    for blk in ds.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        for i, t in zip(blk.column(id_col).to_pylist(), blk.column(text_col).to_pylist()):
            if i in sub:
                texts[i] = t
    sub_sh = {i: _shingles((t or "").lower(), shingle_k) for i, t in texts.items()}
    sub_ref = ray.put(sub_sh)

    def pairs(batch: pa.Table) -> pa.Table:
        smap = ray.get(sub_ref)
        out_a, out_b, out_j = [], [], []
        for i, t in zip(
            pc.cast(batch.column(id_col), pa.int64()).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            sh = _shingles((t or "").lower(), shingle_k)
            for j_id, j_sh in smap.items():
                if i >= j_id:
                    continue
                val = jaccard(sh, j_sh)
                if val >= threshold:
                    out_a.append(i)
                    out_b.append(j_id)
                    out_j.append(val)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")
