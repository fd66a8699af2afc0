"""Deduplication operator family for training-data pipelines.

Five strategies, each a Dataset transform (SURVEY brief §dedup):

- ``exact_dedup``            — content-hash → hash-partitioned groupby →
  keep min-id row per hash (deterministic representative).
- ``minhash_lsh_pairs``      — shingle → minhash signature → band; text
  rides with the banded rows so exact-Jaccard verification happens
  INSIDE the band-bucket group; hot LSH buckets are SALTED into
  chunk-pair cells (north-rule skew handling) so no verify task exceeds
  ~limit² pairs. Text never materializes on the driver.
- ``simhash_pairs``          — 64-bit simhash, banded into 16-bit chunks
  (hamming ≤ 3 ⇒ at least one identical chunk by pigeonhole); the full
  signature rides with the banded rows so hamming verification happens
  inside the band group — no driver-side signature map.
- ``jaccard_pairs_smallside``— exact O(n·m) n-gram Jaccard against a
  broadcast subset (the oracle-checkable baseline).
- embedding cosine near-dup  — see functions/ann.py (same machinery).

All shingle hashing is vectorized numpy: texts are viewed as UTF-32
codepoint arrays (character k-gram semantics — matches the SQL oracle's
``substring(lower(text), i, k)``), rolling-polynomial-hashed in one pass
per batch, finalized with a splitmix-style mixer. No per-byte Python
loops anywhere in the hot path.

Scale notes: the shuffles are the (salted) band groupby, a tiny hot-key
histogram aggregation, and the skinny verified-pair dedup groupby —
every one hash-bucketed so group count stays O(partitions), never
O(keys) (per-group pandas overhead dominates otherwise; measured 191 s
for a per-pair groupby over 4.7M pairs vs 8 s bucketed). Nothing
gathers the corpus onto the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cartography_ray.functions.text import normalize_text_array

_M61 = (1 << 61) - 1
_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
# cap on concatenated shingles processed per internal chunk (bounds the
# (num_perm × S) universal-hash temporary to ~128 MB at num_perm=64)
_SHINGLE_CHUNK = 1 << 18


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wraparound)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _batch_shingle_hashes(texts: list[str | None], k: int) -> list[np.ndarray]:
    """Per-doc sorted-unique uint64 character-k-gram hashes, vectorized.

    The whole batch's lowercased codepoints are concatenated into ONE
    uint64 array; a single rolling polynomial pass hashes every window;
    per-doc windows are sliced out and uniqued. Texts shorter than k
    hash as one whole-text shingle (matching the prior semantics).
    """
    cps = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        c = np.frombuffer((t or "").lower().encode("utf-32-le"), dtype=np.uint32)
        cps.append(c)
        lens[i] = c.size
    if not cps:
        return []
    buf = np.concatenate(cps).astype(np.uint64) if len(cps) > 1 else cps[0].astype(np.uint64)
    starts = np.zeros(len(cps), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    n_windows = max(0, buf.size - k + 1)
    H = np.full(n_windows, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            H = H * _FNV_PRIME + buf[j : j + n_windows]
    H = _mix64(H)
    out: list[np.ndarray] = []
    for i in range(len(cps)):
        s, L = int(starts[i]), int(lens[i])
        if L == 0:
            out.append(np.empty(0, dtype=np.uint64))
        elif L < k:
            # whole-short-text shingle: same polynomial over its codepoints
            h = _FNV_OFFSET
            with np.errstate(over="ignore"):
                for v in buf[s : s + L]:
                    h = h * _FNV_PRIME + v
                out.append(_mix64(np.array([h], dtype=np.uint64)))
        else:
            out.append(np.unique(H[s : s + L - k + 1]))
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash arrays (searchsorted
    membership — no re-sort, ~3× faster than intersect1d per call)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size > b.size:
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = 0
    inter = int(np.count_nonzero(b[idx] == a))
    return inter / max(1, a.size + b.size - inter)


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: one deterministic keeper (min id) per normalized text.

    Hash-BUCKET partition by fingerprint + ONE vectorized sort/
    drop_duplicates per bucket — not a per-fingerprint groupby, whose
    per-group pandas overhead scales with content cardinality (the same
    measured trap `_dedup_pairs` documents). All rows of one fingerprint
    land in one bucket, so the min-id keeper is exact. Inputs whose
    size is known (parquet footers, or an already-materialized upstream
    stage) and measured under the joins' local-merge guard fold in one
    task with no shuffle at all; unknown-size inputs keep the streaming
    plan (no barrier added on the 100-TB path).
    """
    from cartography_ray.runtime import drop_empty_blocks, shuffle_partitions
    from cartography_ray.state.store import stable_bucket

    def fp(batch: pa.Table) -> pa.Table:
        norm = normalize_text_array(batch.column(text_col))
        t = pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "fingerprint": norm,
            }
        )
        return t.append_column(
            "__gb", pc.cast(stable_bucket(t.column("fingerprint"), 64), pa.int64())
        )

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        s = group.sort_values(id_col, kind="mergesort")
        return s.drop_duplicates("fingerprint")[[id_col, "fingerprint"]]

    from cartography_ray.runtime import known_input_bytes

    nbytes = known_input_bytes(ds)
    hashed = ds.map_batches(fp, batch_format="pyarrow")
    from cartography_ray.ops.joins import (
        LOCAL_MERGE_BYTE_LIMIT,
        _local_or_shuffle,
        _nonempty_refs,
    )

    if nbytes is not None and nbytes <= LOCAL_MERGE_BYTE_LIMIT:
        refs, n_rows, n_bytes = _nonempty_refs(hashed)
        if refs:
            return drop_empty_blocks(
                _local_or_shuffle(
                    refs, n_rows, n_bytes, keep_min, None,
                    batch_format="pandas", group_key="__gb",
                )
            )
        # fully-empty measured input: emptiness is proven, so return a
        # typed empty result directly — falling through would re-run the
        # fingerprint map AND hit Ray 2.49's fully-empty-groupby finalize
        # crash (CLAUDE.md sharp edge).
        import ray.data as _rd

        return _rd.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), ("fingerprint", pa.string())]
            ).empty_table()
        )
    return drop_empty_blocks(
        hashed.groupby("__gb", num_partitions=shuffle_partitions(n_bytes=nbytes)).map_groups(
            keep_min, batch_format="pandas"
        )
    )


def incremental_exact_dedup(
    ds,
    state_dir: str,
    epoch: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Dedup a NEW batch of documents against a persisted fingerprint
    index — the dedup-the-new-crawl-against-history operation a standing
    100-TB pipeline runs every ingest.

    Index layout: ``state_dir/bucket=K/epoch=<epoch>.parquet`` holding
    md5 fingerprints of normalized text (one compact string per novel
    document ever seen). The anti-join is bucket-ALIGNED: the new batch
    shuffles ONCE on ``stable_bucket(fingerprint)``; each reducer reads
    only its own bucket's index files — the (corpus-scale) history never
    moves, never shuffles, and is never driver-resident. Reducers also
    append their surviving fingerprints as that bucket's epoch file, so
    the index update is co-located with the membership check.

    Idempotent / kill-rerun-safe per epoch: readers EXCLUDE the current
    epoch's files and the write overwrites them, so re-running an epoch
    (after a crash, or byte-identically on purpose) yields the same
    survivors and the same index state.

    Within-batch duplicates keep the min ``id_col`` (exact_dedup
    semantics). Returns the surviving ``(id_col, fingerprint)`` rows.

    A measured-small new batch (file-backed or materialized input under
    the joins' local-merge guards) folds in ONE task — the kernel is
    bucket-agnostic (loops the real ``__gb`` values it was handed), so
    per-bucket index reads/writes are identical either way; large
    batches shuffle once, sized to the measured input bytes.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    from cartography_ray.functions.text import fingerprint_batch
    from cartography_ray.runtime import drop_empty_blocks
    from cartography_ray.state.store import stable_bucket

    os.makedirs(state_dir, exist_ok=True)

    def fp(batch: pa.Table) -> pa.Table:
        t = fingerprint_batch(batch, id_col=id_col, text_col=text_col)
        t = pa.table(
            {
                id_col: pc.cast(t.column(id_col), pa.int64()),
                "fingerprint": t.column("fingerprint"),
            }
        )
        return t.append_column(
            "__gb", pc.cast(stable_bucket(t.column("fingerprint"), num_buckets), pa.int64())
        )

    def _one_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["__gb"].iloc[0])
        # min-id keeper per fingerprint within the new batch
        new = group.sort_values(id_col, kind="mergesort").drop_duplicates("fingerprint")
        bdir = os.path.join(state_dir, f"bucket={bucket}")
        hist: list[pa.ChunkedArray] = []
        for f in sorted(_glob.glob(os.path.join(bdir, "epoch=*.parquet"))):
            if os.path.basename(f) == f"epoch={epoch}.parquet":
                continue  # current epoch: ignored for idempotent reruns
            if os.path.basename(f) == "epoch=base.parquet":
                # compacted base: per-row epoch provenance keeps the
                # rerun contract — skip rows THIS epoch contributed
                t = _pq.read_table(f)
                if "epoch" in t.column_names:
                    t = t.filter(
                        pc.not_equal(t.column("epoch"), pa.scalar(epoch, pa.int64()))
                    )
                hist.append(t.column("fingerprint"))
                continue
            hist.append(_pq.read_table(f, columns=["fingerprint"]).column("fingerprint"))
        fps = pa.array(new["fingerprint"].to_numpy(), pa.string())
        if hist:
            value_set = pa.chunked_array([c for h in hist for c in h.chunks])
            keep = pc.invert(pc.is_in(fps, value_set=value_set)).to_numpy(
                zero_copy_only=False
            )
            out = new[keep][[id_col, "fingerprint"]]
        else:
            out = new[[id_col, "fingerprint"]]
        os.makedirs(bdir, exist_ok=True)
        tmp = os.path.join(bdir, f".epoch={epoch}.parquet.tmp")
        _pq.write_table(
            pa.table({"fingerprint": pa.array(out["fingerprint"].to_numpy(), pa.string())}),
            tmp,
        )
        os.replace(tmp, os.path.join(bdir, f"epoch={epoch}.parquet"))
        return out.reset_index(drop=True)

    def kernel(group: pd.DataFrame) -> pd.DataFrame:
        # bucket-AGNOSTIC (the local-merge contract): a map_groups call
        # sees exactly one __gb, the whole-union local fold sees many —
        # either way each bucket's history read + epoch write happens
        # once, keyed on the REAL bucket id.
        outs = [
            _one_bucket(sub) for _, sub in group.groupby("__gb", sort=True)
        ]
        if not outs:
            return group.iloc[0:0][[id_col, "fingerprint"]]
        return pd.concat(outs, ignore_index=True)

    from cartography_ray.ops.joins import (
        LOCAL_MERGE_BYTE_LIMIT,
        _local_or_shuffle,
        _nonempty_refs,
    )
    from cartography_ray.runtime import known_input_bytes, shuffle_partitions

    nbytes = known_input_bytes(ds)
    hashed = ds.map_batches(fp, batch_format="pyarrow")
    if nbytes is not None and nbytes <= LOCAL_MERGE_BYTE_LIMIT:
        refs, n_rows, n_bytes = _nonempty_refs(hashed)
        if refs:
            return drop_empty_blocks(
                _local_or_shuffle(
                    refs, n_rows, n_bytes, kernel, num_partitions,
                    batch_format="pandas", group_key="__gb",
                )
            )
        import ray.data as _rd

        return _rd.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), ("fingerprint", pa.string())]
            ).empty_table()
        )
    return drop_empty_blocks(
        hashed.groupby(
            "__gb",
            num_partitions=num_partitions
            if num_partitions is not None
            else shuffle_partitions(n_bytes=nbytes),
        ).map_groups(kernel, batch_format="pandas")
    )


def incremental_minhash_dedup(
    ds,
    state_dir: str,
    epoch: int,
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    num_partitions: int | None = None,
    concurrency: int = 4,
    drop_broadcast_limit: int = 2_000_000,
):
    """NEAR-dup the new crawl against a persisted LSH band-bucket index —
    the per-ingest fuzzy companion of ``incremental_exact_dedup`` (which
    only catches byte-identical text after normalization).

    Index layout: ``state_dir/bucket=K/epoch=<e>.parquet`` holding
    (band, band_hash, sig) rows of every SURVIVING document, bucketed on
    ``band_hash % num_buckets`` — the same bucket-aligned contract as
    the exact variant: the (corpus-scale) history never moves, never
    shuffles, and is never driver-resident; each reducer reads only its
    own bucket's files. The signature (fixed 8·num_perm bytes/row) rides
    instead of text, so index volume is bounded per document regardless
    of document size and matching needs no text join.

    Match semantics (approximate by design, the minhash family
    contract): a new document is DROPPED when any of its bands collides
    with a historical band bucket and the full-signature agreement
    fraction ≥ ``threshold``. Deterministic end to end (splitmix hash
    family, no RNG) — reruns and retries yield identical survivors.

    Three phases, shuffling only the NEW batch (twice):
      1. band+sign → one bucket shuffle → per-bucket match vs history →
         hit doc ids;
      2. drop set = distinct hit ids (size-guarded broadcast ≤
         ``drop_broadcast_limit``, else a distributed anti hash_join);
      3. survivors' band rows shuffle once more onto buckets and are
         written as this epoch's index files (tmp+rename; readers
         exclude the current epoch, so re-running an epoch is
         idempotent).

    Within-batch near-duplicates are out of scope (both copies survive
    and enter the index) — compose with ``minhash_lsh_pairs`` for the
    intra-batch pass, as ``docs_clean_corpus`` does for the exact case.
    Returns the surviving ``(id_col,)`` rows.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    from cartography_ray.ops.joins import broadcast_semi_anti, hash_join
    from cartography_ray.runtime import (
        drop_empty_blocks,
        known_input_bytes,
        shuffle_partitions,
    )

    os.makedirs(state_dir, exist_ok=True)
    nbytes = known_input_bytes(ds)
    parts = (
        num_partitions
        if num_partitions is not None
        else shuffle_partitions(n_bytes=nbytes)
    )
    hasher = MinHasher(
        num_perm=num_perm, bands=bands, shingle_k=shingle_k, payload="sig"
    )

    def band_bucket(t: pa.Table) -> pa.Table:
        out = hasher(
            pa.table(
                {
                    "doc_id": pc.cast(t.column(id_col), pa.int64()),
                    "text": pc.cast(t.column(text_col), pa.string()),
                }
            )
        )
        gb = (
            out.column("band_hash").to_numpy(zero_copy_only=False)
            % num_buckets
        )
        return out.append_column("__gb", pa.array(gb, pa.int64()))

    def _bucket_files(bucket: int) -> list[str]:
        bdir = os.path.join(state_dir, f"bucket={bucket}")
        return [
            f
            for f in sorted(_glob.glob(os.path.join(bdir, "epoch=*.parquet")))
            if os.path.basename(f) != f"epoch={epoch}.parquet"
        ]

    def _match_one(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["__gb"].iloc[0])
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64")})
        files = _bucket_files(bucket)
        if not files:
            return empty
        def _read_hist(f: str) -> pd.DataFrame:
            if os.path.basename(f) == "epoch=base.parquet":
                # compacted base: skip rows THIS epoch contributed so
                # reruns of an already-compacted epoch stay idempotent
                t = _pq.read_table(f)
                if "epoch" in t.column_names:
                    t = t.filter(
                        pc.not_equal(
                            t.column("epoch"), pa.scalar(epoch, pa.int64())
                        )
                    )
                return t.select(["band", "band_hash", "sig"]).to_pandas()
            return _pq.read_table(
                f, columns=["band", "band_hash", "sig"]
            ).to_pandas()

        hist = pd.concat(
            [_read_hist(f) for f in files], ignore_index=True
        )
        cand = group.merge(
            hist, on=["band", "band_hash"], suffixes=("", "_h")
        )
        if not len(cand):
            return empty
        sn = np.stack(cand["sig"].to_numpy())
        sh = np.stack(cand["sig_h"].to_numpy())
        est = (sn == sh).mean(axis=1)
        hits = cand.loc[est >= threshold, "doc_id"].unique()
        return pd.DataFrame({id_col: hits.astype(np.int64)})

    def match_kernel(group: pd.DataFrame) -> pd.DataFrame:
        # bucket-AGNOSTIC (local-merge contract): loops the real __gb
        # values it was handed — one map_groups bucket or the whole
        # measured-small union alike
        outs = [_match_one(sub) for _, sub in group.groupby("__gb", sort=True)]
        if not outs:
            return pd.DataFrame({id_col: pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    def _write_one(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["__gb"].iloc[0])
        bdir = os.path.join(state_dir, f"bucket={bucket}")
        os.makedirs(bdir, exist_ok=True)
        sig_flat = np.concatenate(group["sig"].to_numpy())
        tbl = pa.table(
            {
                "band": pa.array(
                    group["band"].to_numpy(np.int32), pa.int32()
                ),
                "band_hash": pa.array(
                    group["band_hash"].to_numpy(np.int64), pa.int64()
                ),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig_flat, pa.int64()), num_perm
                ),
            }
        )
        tmp = os.path.join(bdir, f".epoch={epoch}.parquet.tmp")
        _pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(bdir, f"epoch={epoch}.parquet"))
        return pd.DataFrame({"bucket": [bucket]})

    def write_kernel(group: pd.DataFrame) -> pd.DataFrame:
        outs = [_write_one(sub) for _, sub in group.groupby("__gb", sort=True)]
        if not outs:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    from cartography_ray.ops.joins import _local_or_shuffle, _nonempty_refs

    banded = ds.map_batches(
        band_bucket, batch_format="pyarrow", concurrency=concurrency
    ).materialize()
    refs, n_rows, n_bytes = _nonempty_refs(banded)
    if not refs:  # proven-empty new batch: nothing to match/index
        import ray.data as _rd

        return _rd.from_arrow(
            pa.schema([(id_col, pa.int64())]).empty_table()
        )
    import ray.data as _rd

    banded = _rd.from_arrow_refs(refs)
    # both kernels are LINEAR in rows (the per-bucket history read is
    # file-count-bounded) — a measured-small new batch matches and later
    # writes in ONE task each instead of two hash shuffles
    dropped = drop_empty_blocks(
        _local_or_shuffle(
            refs, n_rows, n_bytes, match_kernel, parts,
            batch_format="pandas", group_key="__gb",
        )
    ).materialize()

    # one id row per doc from the already-materialized banded (band 0
    # exists for every doc) — NOT from the lazy ds, whose whole upstream
    # would execute a second time (CLAUDE.md fan-out rule)
    ids = banded.map_batches(
        lambda t: pa.table(
            {
                id_col: pc.cast(
                    t.filter(
                        pc.equal(t.column("band"), pa.scalar(0, pa.int32()))
                    ).column("doc_id"),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    n_drop = dropped.count()
    if n_drop == 0:
        survivors = ids
        surv_banded = banded
    elif n_drop <= drop_broadcast_limit:
        keys = dropped.to_pandas()[id_col].astype(str).tolist()
        survivors = broadcast_semi_anti(ids, keys, on=id_col, anti=True)
        surv_banded = broadcast_semi_anti(
            banded, keys, on="doc_id", anti=True
        )
    else:
        survivors = hash_join(
            ids, dropped, left_on=id_col, how="anti",
            num_partitions=parts,
        )
        surv_banded = hash_join(
            banded, dropped.map_batches(
                lambda t: pa.table({"doc_id": t.column(id_col)}),
                batch_format="pyarrow",
            ),
            left_on="doc_id", how="anti", num_partitions=parts,
        )
    # phase 3: persist survivors' band rows as this epoch's index files.
    # The write is a side effect; consume the tiny bucket-receipt rows.
    # Guard the proven-empty case (everything dropped against history):
    # a fully-empty groupby input crashes the hash-aggregator finalize.
    s_refs, s_rows, s_bytes = _nonempty_refs(surv_banded)
    if s_refs:
        drop_empty_blocks(
            _local_or_shuffle(
                s_refs, s_rows, s_bytes, write_kernel, parts,
                batch_format="pandas", group_key="__gb",
            )
        ).materialize()
    return survivors


class MinHasher:
    """Actor-pool stage: doc batch → (band_id, band_hash, id) rows.

    Fully vectorized: one universal-hash GEMM-shaped pass per internal
    chunk, per-doc minima via ``np.minimum.reduceat``, band folding as a
    vectorized polynomial over the r rows of each band.
    """

    def __init__(
        self,
        num_perm: int = 32,
        bands: int = 8,
        shingle_k: int = 5,
        seed: int = 7,
        carry_text: bool = False,
        payload: str | None = None,
    ):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k, self.seed = num_perm, bands, shingle_k, seed
        # payload ∈ {"text", "sig", "none"}: what rides with each banded
        # row through the shuffle (carry_text kept for back-compat)
        self.payload = payload if payload is not None else ("text" if carry_text else "none")
        self.carry_text = self.payload == "text"
        rng = np.random.default_rng(seed)
        # per-permutation keys for a splitmix-style mixed hash family.
        # NOT a*x+b (mod 2^61-1): with 32-bit shingle hashes a*x never
        # wraps the modulus, so that map is order-PRESERVING in x — every
        # "permutation" elects (nearly) the same minimum element, the
        # estimator collapses to "do the docs share their min shingle?",
        # and candidate counts explode (measured: 1.8M candidates for 256
        # true pairs on the sf0.1 corpus; ~2k after this fix). A full
        # avalanche mix per permutation key is order-breaking by design.
        self.z = rng.integers(1, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)

    def _signatures(self, texts: list[str | None]) -> np.ndarray:
        """(n_docs, num_perm) int64 minhash matrix for a text chunk.
        Values are uint64 bit patterns viewed as int64 (Arrow-friendly);
        docs with no shingles sign as all -1 (uint64 max)."""
        sh = _batch_shingle_hashes(texts, self.k)
        n = len(sh)
        sig = np.full((n, self.num_perm), -1, dtype=np.int64)
        counts = np.array([s.size for s in sh], dtype=np.int64)
        nz = np.flatnonzero(counts)
        if nz.size == 0:
            return sig
        xs = np.concatenate([sh[i] for i in nz])
        offs = np.zeros(nz.size, dtype=np.int64)
        np.cumsum(counts[nz][:-1], out=offs[1:])
        with np.errstate(over="ignore"):
            hashed = _mix64(xs[None, :] + self.z[:, None])
        mins = np.minimum.reduceat(hashed, offs, axis=1)  # (num_perm, n_nonempty)
        sig[nz] = mins.T.view(np.int64)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        r = self.num_perm // self.bands
        sig_parts, lo = [], 0
        # chunk by shingle budget so the (num_perm × S) temp stays bounded
        budget, acc = _SHINGLE_CHUNK, 0
        for i, t in enumerate(texts):
            acc += max(1, len(t or ""))
            if acc >= budget:
                sig_parts.append(self._signatures(texts[lo : i + 1]))
                lo, acc = i + 1, 0
        if lo < len(texts):
            sig_parts.append(self._signatures(texts[lo:]))
        sig = np.vstack(sig_parts) if sig_parts else np.empty((0, self.num_perm), np.int64)
        n = sig.shape[0]
        # fold each band's r values into one 62-bit hash, vectorized
        resh = sig.view(np.uint64).reshape(n, self.bands, r)
        bh = np.full((n, self.bands), _FNV_OFFSET, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(r):
                bh = bh * _FNV_PRIME + resh[:, :, j]
        bh = (_mix64(bh) & np.uint64((1 << 62) - 1)).astype(np.int64)
        cols = {
            "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array(bh.ravel(), pa.int64()),
        }
        if self.payload == "text":
            # text rides with each banded row (×bands amplification) so
            # verification can happen INSIDE the band-bucket group — one
            # shuffle total instead of candidate + two text joins
            t = pc.cast(batch.column("text"), pa.string())
            cols["text"] = pa.array(
                np.repeat(t.to_numpy(zero_copy_only=False), self.bands), pa.string()
            )
        elif self.payload == "sig":
            # the full minhash signature rides instead of text: fixed
            # 8·num_perm bytes per row REGARDLESS of document size, and
            # it powers a vectorized in-cell jaccard-estimate prefilter
            rep = np.repeat(sig, self.bands, axis=0)
            cols["sig"] = pa.FixedSizeListArray.from_arrays(
                pa.array(rep.ravel(), pa.int64()), self.num_perm
            )
        return pa.table(cols)


def _group_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Distinct sorted id-pairs within one (band, band_hash) bucket."""
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def _banded_pairs(banded, num_buckets: int = 64):
    """Candidate pairs from a banded table via a HASH-BUCKET groupby: the
    natural per-(band, band_hash) groupby creates one tiny pandas group
    per bucket (tens of thousands), and per-group overhead dominates
    (measured ~24 s for 80k banded rows). Instead: shuffle once on
    ``hash(band_hash) % num_buckets`` (all rows of one band bucket
    co-locate) and build pairs inside each partition with ONE vectorized
    self-merge on (band, band_hash)."""
    from cartography_ray.runtime import drop_empty_blocks

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["band_hash"].to_numpy(dtype=np.int64, copy=False).view(np.uint64)
        return batch.assign(__bb=(_mix64(h) % np.uint64(num_buckets)).astype(np.int64))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        sub = group.drop(columns="__bb")
        m = sub.merge(sub, on=["band", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = pd.DataFrame(
            {
                "id_a": m["doc_id_x"].to_numpy(dtype=np.int64),
                "id_b": m["doc_id_y"].to_numpy(dtype=np.int64),
            }
        )
        return out.drop_duplicates()

    return drop_empty_blocks(
        banded.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def _dedup_pairs(cand, num_buckets: int = 64, num_partitions: int | None = None):
    """Distinct (id_a, id_b) via a HASH-BUCKET groupby — NOT a per-pair
    groupby: millions of two-row groups make per-group pandas overhead the
    bottleneck (measured 191 s for 4.7M pairs); 64 bucket groups with a
    vectorized drop_duplicates inside run in seconds. Same shuffle volume.
    Extra columns ride along (first row per pair wins)."""
    from cartography_ray.runtime import drop_empty_blocks

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.drop_duplicates(["id_a", "id_b"])
        a = batch["id_a"].to_numpy(dtype=np.int64, copy=False).view(np.uint64)
        b = batch["id_b"].to_numpy(dtype=np.int64, copy=False).view(np.uint64)
        with np.errstate(over="ignore"):
            h = _mix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b)
        return batch.assign(__pb=(h % np.uint64(num_buckets)).astype(np.int64))

    def bucket_distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["id_a", "id_b"]).drop(columns="__pb")

    return drop_empty_blocks(
        cand.map_batches(add_bucket, batch_format="pandas")
        .groupby("__pb", num_partitions=num_partitions)
        .map_groups(bucket_distinct, batch_format="pandas")
    )


def compact_dedup_index(state_dir: str, exclude_epochs: tuple = ()):
    """Merge each bucket's per-epoch index files into ONE base file —
    the maintenance pass a standing incremental-dedup pipeline runs so
    per-ingest history reads stay O(1) files per bucket instead of
    O(#epochs). Works on both incremental index layouts
    (``incremental_exact_dedup``'s fingerprint files and
    ``incremental_minhash_dedup``'s band/signature files): readers need
    NO changes because the base file name ``epoch=base.parquet``
    matches their ``epoch=*.parquet`` glob and can never collide with
    an integer epoch name.

    The base PRESERVES per-row epoch provenance (an ``epoch`` column
    derived from each merged file's name), so the per-epoch
    rerun-idempotency contract survives compaction: a reader excluding
    epoch N skips both the ``epoch=N.parquet`` file AND the base rows
    tagged N — re-running an already-compacted epoch still yields its
    original survivors instead of dropping everything against itself.

    Crash-safe against KILLS, not concurrent writers: the merged base
    is tmp+renamed FIRST (unique tmp name per run), the merged inputs
    deleted after — a crash in between leaves duplicated rows, which
    both consumers treat idempotently, and re-running compaction
    converges. A per-bucket flock serializes compactors on one host;
    run ONE compactor per state_dir across hosts (the same
    single-writer contract the epoch writers already have per epoch).
    ``exclude_epochs`` skips in-flight epochs. One Ray task per bucket
    (task-parallel, no shuffle; each task's working set is one
    bucket's index — the same bound the readers already assume).

    Returns {"buckets": compacted, "files_merged": total}.
    """
    import glob as _glob
    import os

    import ray

    skip = {f"epoch={e}.parquet" for e in exclude_epochs}

    @ray.remote
    def _compact_one(bdir: str) -> int:
        import fcntl
        import glob as _g
        import os as _os
        import uuid as _uuid

        import pyarrow as _pa
        import pyarrow.parquet as _pq2

        with open(_os.path.join(bdir, ".compact.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            files = [
                f
                for f in sorted(_g.glob(_os.path.join(bdir, "epoch=*.parquet")))
                if _os.path.basename(f) not in skip
            ]
            if len(files) <= 1:
                return 0
            parts = []
            for f in files:
                t = _pq2.read_table(f)
                if "epoch" not in t.column_names:
                    ep = int(
                        _os.path.basename(f)[len("epoch=") : -len(".parquet")]
                    )
                    t = t.append_column(
                        "epoch",
                        _pa.array([ep] * t.num_rows, _pa.int64()),
                    )
                parts.append(t)
            t = _pa.concat_tables(parts)
            if sorted(t.column_names) == ["epoch", "fingerprint"]:
                # exact layout: membership set — one row per fingerprint;
                # each fingerprint was written by exactly one epoch (it
                # only enters the index when NOVEL), so min() is that
                # epoch, not a choice
                t = t.group_by("fingerprint").aggregate([("epoch", "min")])
                t = t.rename_columns(["fingerprint", "epoch"])
            tmp = _os.path.join(bdir, f".base-{_uuid.uuid4().hex[:8]}.tmp")
            _pq2.write_table(t, tmp)
            _os.replace(tmp, _os.path.join(bdir, "epoch=base.parquet"))
            for f in files:
                if _os.path.basename(f) != "epoch=base.parquet":
                    _os.remove(f)
            return len(files)

    buckets = sorted(_glob.glob(os.path.join(state_dir, "bucket=*")))
    merged = ray.get([_compact_one.remote(b) for b in buckets])
    return {
        "buckets": sum(1 for m in merged if m),
        "files_merged": int(sum(merged)),
    }


class _FoldTooHot(Exception):
    """Raised inside a fold/bucket task when the measured pair workload
    (Σ per-bucket n²) is too superlinear for the current plan; the
    caller falls back to a plan built for that regime (minhash local
    fold → distributed plan; jaccard default path → prefix-filtered
    plan). Module-level so the exception unpickles across the task
    boundary."""


def _is_fold_too_hot(e: BaseException) -> bool:
    return isinstance(getattr(e, "cause", None), _FoldTooHot) or "_FoldTooHot" in str(e)


_probe_ok_task = None  # bound lazily: ray.remote at import breaks ray-less use


def _ensure_probe_task():
    """Zero-CPU task that dereferences a ref WORKER-side: surfacing a
    dependency's exception to the driver without copying the (possibly
    output-sized) payload into the driver heap."""
    global _probe_ok_task
    if _probe_ok_task is None:
        import ray

        _probe_ok_task = ray.remote(num_cpus=0)(lambda _t: True)
    return _probe_ok_task


def _hot_band_buckets(banded_skinny, limit: int, num_partitions: int | None = None) -> dict:
    """(band, band_hash) → chunk count for buckets larger than ``limit``.

    Two-phase: per-batch partial counts, then a small hash-bucket groupby
    sums them and keeps ONLY hot keys — the collected set is provably
    ≤ total_rows / limit entries, so the driver never holds the full
    bucket histogram (the salted-repartition prerequisite of the north
    rule's skew handling).
    """
    from cartography_ray.runtime import drop_empty_blocks

    def local_count(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby(["band", "band_hash"], sort=False).size().reset_index(name="n")
        h = out["band_hash"].to_numpy(dtype=np.int64, copy=False).view(np.uint64)
        return out.assign(__cb=(_mix64(h) % np.uint64(64)).astype(np.int64))

    def hot_only(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["band", "band_hash"], sort=False)["n"].sum().reset_index()
        return tot[tot["n"] > limit]

    hot = drop_empty_blocks(
        banded_skinny.map_batches(local_count, batch_format="pandas")
        .groupby("__cb", num_partitions=num_partitions)
        .map_groups(hot_only, batch_format="pandas")
    ).to_pandas()
    if hot.empty or "band" not in hot.columns:  # no hot buckets anywhere
        return {}
    return {
        (int(b), int(h)): int(-(-n // limit))
        for b, h, n in zip(hot["band"], hot["band_hash"], hot["n"])
    }


CARRY_TEXT_MAX_BYTES = 256 << 20  # above this corpus size, band-skinny wins


def _corpus_bytes(ds) -> int | None:
    """Best-effort input size (file-backed or materialized). Thin alias
    of ``runtime.known_input_bytes`` so the minhash payload choice and
    the elision gates answer "how big is this input" identically."""
    from cartography_ray.runtime import known_input_bytes

    return known_input_bytes(ds)


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    concurrency: int = 4,
    hot_bucket_limit: int = 256,
    carry_text: bool | str = "auto",
    payload: str | None = None,
    est_margin: float = 0.2,
):
    """Near-dup pairs via MinHash-LSH with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) pairs with char-k-gram Jaccard ≥
    threshold. Three band-shuffle payload strategies (``payload``, or
    the legacy ``carry_text`` flag: True→"text", False→"none"):

    - ``"sig"`` (the ``carry_text="auto"`` choice above
      ``CARRY_TEXT_MAX_BYTES``) — the minhash SIGNATURE rides with each
      banded row: a fixed 8·num_perm bytes
      regardless of document size, so the main exchange is size-bounded
      at any corpus scale. In-cell, a fully vectorized signature-
      agreement estimate prefilters candidate pairs (keep when
      est ≥ threshold − ``est_margin``); survivors are deduped and then
      EXACTLY verified with text joined back candidate-only. The margin
      makes prefilter false-negatives exponentially rare
      (P[miss | j ≥ t] ≈ Φ(−margin·√num_perm/σ); ≈7e-4 at margin 0.2,
      num_perm 64) — this operator is approximate-by-design and the
      recall test governs. Measured: the estimate collapses a 1.8M-
      candidate bench corpus to ~true-pair volume before any text moves.
    - ``"text"`` (the ``auto`` choice at or below the limit) — text
      rides with the banded rows (×bands amplification) and exact
      verification happens INSIDE the band cell: one main shuffle
      total, exact candidate semantics. Best for small corpora of small
      documents.
    - ``"none"`` (VERDICT r02 item 5's skinny path) — only
      (doc_id, band, band_hash) rides (~24 B/row); ALL candidate pairs
      are deduped then text-verified via joins. Exact candidate
      semantics with the smallest band shuffle, but every candidate
      pays the text join + exact-Jaccard cost.

    "text" and "none" produce identical pairs (same banding → same
    candidates → same exact verification); "sig" produces a subset
    missing borderline pairs with the probability above (all asserted in
    tests). The corpus never lands on the driver in any path.

    **Skew (north rule: salt hot keys)**: an LSH bucket with m docs emits
    m(m-1)/2 pairs; one template cluster would serialize the whole verify
    on one task (measured: a 1,619-doc bucket = 1.3M pairs = a 16 s
    straggler). Buckets above ``hot_bucket_limit`` are therefore split
    into ceil(m/limit) doc-chunks and every chunk PAIR (i ≤ j) becomes
    its own verify cell — each row ships once per chunk it must meet, so
    no cell exceeds ~limit² pairs and the verify stage load-balances.
    """
    import ray

    from cartography_ray.runtime import drop_empty_blocks

    if payload is None:
        if carry_text == "auto":
            # small corpus: carrying text is one shuffle and the in-cell
            # verify touches ~true-pair volume — fastest. Large corpus:
            # the sig payload bounds the exchange at 8·num_perm B/row
            # regardless of document size.
            nbytes = _corpus_bytes(ds)
            payload = (
                "text" if nbytes is not None and nbytes <= CARRY_TEXT_MAX_BYTES else "sig"
            )
        else:
            payload = "text" if carry_text else "none"
    assert payload in ("sig", "text", "none")

    hasher = MinHasher(
        num_perm=num_perm, bands=bands, shingle_k=shingle_k, payload=payload
    )
    banded = ds.map_batches(
        hasher, batch_format="pyarrow", concurrency=concurrency
    ).materialize()
    # size every downstream shuffle to the (now known) banded volume —
    # the per-partition fixed cost otherwise dominates (BASELINE.md)
    from cartography_ray.runtime import shuffle_partitions

    n_banded, banded_bytes = banded.count(), banded.size_bytes()
    parts = shuffle_partitions(n_rows=n_banded, n_bytes=banded_bytes)
    k = shingle_k

    def explode_core(hmap: dict, b: pa.Table) -> pa.Table:
        """Arrow-native cell assignment (text stays an Arrow string array —
        no Python-object round trip through the shuffle)."""
        band = b.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(band)
        if hmap:
            # vectorized membership: fold (band, band_hash) into one key
            # (band < 64 bands ⇒ the low bits don't collide) — the per-row
            # tuple-in-dict generator was a measured multi-second cost at
            # 1M+ banded rows
            with np.errstate(over="ignore"):
                row_key = bh.view(np.uint64) * np.uint64(64) + band.view(np.uint64)
                hot_keys = np.array(
                    [np.uint64(h) * np.uint64(64) + np.uint64(bd) for bd, h in hmap],
                    dtype=np.uint64,
                )
            hot_mask = np.isin(row_key, hot_keys)
        else:
            hot_mask = np.zeros(n, dtype=bool)
        # cold rows pass through once; hot rows replicate to their chunk
        # cells via a take-index list (arrow `take` keeps text zero-copy-ish)
        take_idx = [np.flatnonzero(~hot_mask)]
        n_cold = take_idx[0].size
        chunk = [np.zeros(n_cold, dtype=np.int64)]
        gx = [np.zeros(n_cold, dtype=np.int64)]
        gy = [np.zeros(n_cold, dtype=np.int64)]
        for idx in np.flatnonzero(hot_mask):
            c = hmap[(int(band[idx]), int(bh[idx]))]
            ci = int(_mix64(np.array([did[idx]], dtype=np.uint64))[0] % c)
            cells = [(min(ci, j), max(ci, j)) for j in range(c)]
            take_idx.append(np.full(len(cells), idx, dtype=np.int64))
            chunk.append(np.full(len(cells), ci, dtype=np.int64))
            gx.append(np.array([x for x, _ in cells], dtype=np.int64))
            gy.append(np.array([y for _, y in cells], dtype=np.int64))
        take = np.concatenate(take_idx)
        out = b.take(pa.array(take, pa.int64()))
        gx_o = np.concatenate(gx)
        gy_o = np.concatenate(gy)
        with np.errstate(over="ignore"):
            cell = _mix64(
                bh[take].view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ^ (gx_o.view(np.uint64) << np.uint64(32))
                ^ gy_o.view(np.uint64)
            )
        return (
            out.append_column("chunk", pa.array(np.concatenate(chunk), pa.int64()))
            .append_column("gx", pa.array(gx_o, pa.int64()))
            .append_column("gy", pa.array(gy_o, pa.int64()))
            .append_column("__bb", pa.array((cell % np.uint64(64)).astype(np.int64), pa.int64()))
        )

    _PAIR_EMPTY = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )

    def cell_pairs(sub: pd.DataFrame) -> pd.DataFrame:
        """Distinct sorted candidate id-pairs of one salted cell."""
        key = sub[["band", "band_hash", "gx", "gy", "chunk", "doc_id"]]
        m = key.merge(key, on=["band", "band_hash", "gx", "gy"])
        m = m[
            (m["chunk_x"] == m["gx"])
            & (m["chunk_y"] == m["gy"])
            & (m["doc_id_x"] != m["doc_id_y"])
        ]
        if not len(m):
            return _PAIR_EMPTY
        ia = np.minimum(m["doc_id_x"].to_numpy(dtype=np.int64), m["doc_id_y"].to_numpy(dtype=np.int64))
        ib = np.maximum(m["doc_id_x"].to_numpy(dtype=np.int64), m["doc_id_y"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"id_a": ia, "id_b": ib}).drop_duplicates()

    def verify_cell(group: pd.DataFrame) -> pd.DataFrame:
        empty = _PAIR_EMPTY.assign(jaccard=pd.Series(dtype="float64"))
        sub = group.drop(columns="__bb").reset_index(drop=True)
        pairs = cell_pairs(sub)
        if not len(pairs):
            return empty
        # shingle ONLY candidate-pair members, each once — shingling every
        # unique doc in the partition re-hashed ~k× the corpus (a doc's
        # banded rows scatter over ~min(bands, partitions) partitions) and
        # was the measured dominant cost of the whole operator
        need = np.union1d(
            pairs["id_a"].to_numpy(dtype=np.int64), pairs["id_b"].to_numpy(dtype=np.int64)
        )
        docs_u = sub[sub["doc_id"].isin(need)].drop_duplicates("doc_id")
        sh_u = _batch_shingle_hashes(docs_u["text"].tolist(), k)
        pos = {int(i): j for j, i in enumerate(docs_u["doc_id"].to_numpy(dtype=np.int64))}
        ix = pairs["id_a"].to_numpy(dtype=np.int64)
        iy = pairs["id_b"].to_numpy(dtype=np.int64)
        sims = np.fromiter(
            (jaccard(sh_u[pos[int(a)]], sh_u[pos[int(b)]]) for a, b in zip(ix, iy)),
            dtype=np.float64,
            count=len(ix),
        )
        keep = sims >= threshold
        return pd.DataFrame({"id_a": ix[keep], "id_b": iy[keep], "jaccard": sims[keep]})

    def sig_filter_cell(group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized signature-agreement prefilter: keep candidate pairs
        whose estimated jaccard (fraction of agreeing permutations)
        clears threshold − est_margin. No text, no Python pair loop."""
        sub = group.drop(columns="__bb").reset_index(drop=True)
        pairs = cell_pairs(sub)
        if not len(pairs):
            return _PAIR_EMPTY
        docs_u = sub.drop_duplicates("doc_id")
        sig_mat = np.stack(docs_u["sig"].to_numpy())  # (m, num_perm)
        pos = pd.Series(
            np.arange(len(docs_u), dtype=np.int64),
            index=docs_u["doc_id"].to_numpy(dtype=np.int64),
        )
        ia = pairs["id_a"].to_numpy(dtype=np.int64)
        ib = pairs["id_b"].to_numpy(dtype=np.int64)
        ra = pos.reindex(ia).to_numpy(dtype=np.int64)
        rb = pos.reindex(ib).to_numpy(dtype=np.int64)
        est = (sig_mat[ra] == sig_mat[rb]).mean(axis=1)
        keep = est >= threshold - est_margin
        return pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep]})

    def pairs_only(group: pd.DataFrame) -> pd.DataFrame:
        return cell_pairs(group.drop(columns="__bb").reset_index(drop=True))

    # ---- adaptive local fold (payload="text" only): when the measured
    # banded table sits under the joins' local-merge guards, the WHOLE
    # remainder — hot-bucket histogram, chunk explode, in-cell verify,
    # pair dedup — fits one task, replacing THREE hash shuffles with
    # zero. The kernels are cell-agnostic (cell_pairs keys on the real
    # (band, band_hash, gx, gy) columns; __bb is placement only), so the
    # whole-table fold is the one-cell special case — identical pairs.
    # sig/none are the at-scale payloads where the guard never engages;
    # they also need the doc table joined back, so they keep the
    # distributed plan unconditionally.
    if payload == "text":
        from cartography_ray.ops.joins import (
            LOCAL_MERGE_BYTE_LIMIT,
            LOCAL_MERGE_ROW_LIMIT,
            _ensure_merge_task,
            _nonempty_refs,
        )

        # Row/byte guards alone are NOT enough here: verify_cell is a
        # superlinear self-join kernel (the edit_distance_pairs cliff,
        # fuzzy.py:248) — a dup-heavy corpus under the generic guards
        # can still hide O(m²) pair verifies in one band bucket. The
        # workload guard runs INSIDE the fold task (optimistic
        # execution): the task already computes the bucket histogram as
        # its first step, so checking Σ n_b² there is free — it raises
        # when the measured pair workload is too hot and the caller
        # falls back to the distributed plan over the SAME materialized
        # refs (nothing recomputes). A driver-side pre-check would cost
        # an extra column pull on every benign run (measured 1.4 s at
        # bench scale) to protect against the rare adversarial one.
        if (
            n_banded <= LOCAL_MERGE_ROW_LIMIT
            and banded_bytes <= LOCAL_MERGE_BYTE_LIMIT
        ):
            import ray.data as _rd

            refs, _, _ = _nonempty_refs(banded)
            if not refs:
                return _rd.from_arrow(
                    pa.schema(
                        [("id_a", pa.int64()), ("id_b", pa.int64()),
                         ("jaccard", pa.float64())]
                    ).empty_table()
                )

            def local_fold(t: pa.Table) -> pd.DataFrame:
                cnt = (
                    t.select(["band", "band_hash"])
                    .to_pandas()
                    .groupby(["band", "band_hash"], sort=False)
                    .size()
                )
                if float((cnt.to_numpy(np.float64) ** 2).sum()) > 4e6:
                    raise _FoldTooHot()
                hmap = {
                    (int(b), int(h)): int(-(-n // hot_bucket_limit))
                    for (b, h), n in cnt.items()
                    if n > hot_bucket_limit
                }
                ex = explode_core(hmap, t)
                out = verify_cell(ex.to_pandas())
                return out.drop_duplicates(["id_a", "id_b"])

            out_ref = _ensure_merge_task().remote(local_fold, "pyarrow", *refs)
            try:
                # worker-side deref: surfaces _FoldTooHot without an
                # output-sized driver copy of the pair table
                ray.get(_ensure_probe_task().remote(out_ref))
                return _rd.from_arrow_refs([out_ref])
            except ray.exceptions.RayTaskError as e:
                if not isinstance(
                    getattr(e, "cause", None), _FoldTooHot
                ) and "_FoldTooHot" not in str(e):
                    raise
                # too hot for one task: fall through to the distributed
                # plan (banded is materialized — no recompute)

    hot = _hot_band_buckets(
        banded.select_columns(["band", "band_hash"]), hot_bucket_limit,
        num_partitions=parts,
    )
    hot_ref = ray.put(hot)

    def explode(b: pa.Table) -> pa.Table:
        return explode_core(ray.get(hot_ref), b)

    exploded = banded.map_batches(explode, batch_format="pyarrow")

    if payload == "text":
        verified = drop_empty_blocks(
            exploded.groupby("__bb", num_partitions=parts).map_groups(
                verify_cell, batch_format="pandas"
            )
        )
        return _dedup_pairs(verified, num_partitions=parts)

    # ---- sig / none: candidates first, text joined candidate-only --------
    cell_fn = sig_filter_cell if payload == "sig" else pairs_only
    cand = _dedup_pairs(
        drop_empty_blocks(
            exploded.groupby("__bb", num_partitions=parts).map_groups(
                cell_fn, batch_format="pandas"
            )
        ),
        num_partitions=parts,
    )
    return _verify_pairs_via_text(cand, ds, threshold, k, parts)


def _verify_pairs_via_text(cand, ds, threshold: float, k: int, parts: int | None):
    """Exact-Jaccard verification of a candidate-pair Dataset: text is
    joined back candidate-only (two reduce-side hash_joins against the
    doc table) and each unique pair is verified exactly once in a
    stateless per-batch map. Emits (id_a, id_b, jaccard ≥ threshold)."""
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    def doc_side(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                    col: pc.cast(t.column("text"), pa.string()),
                }
            )

        return fn

    with_a = hash_join(
        cand,
        ds.map_batches(doc_side("__text_a"), batch_format="pyarrow"),
        left_on="id_a",
        right_on="doc_id",
        how="inner",
        num_partitions=parts,
    )
    with_ab = hash_join(
        drop_empty_blocks(with_a),
        ds.map_batches(doc_side("__text_b"), batch_format="pyarrow"),
        left_on="id_b",
        right_on="doc_id",
        how="inner",
        num_partitions=parts,
    )

    def verify_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
        if not len(batch):
            return empty
        # shingle each unique doc once per batch (pairs cluster by id)
        docs_u = pd.concat(
            [
                batch[["id_a", "__text_a"]].rename(columns={"id_a": "doc_id", "__text_a": "t"}),
                batch[["id_b", "__text_b"]].rename(columns={"id_b": "doc_id", "__text_b": "t"}),
            ],
            ignore_index=True,
        ).drop_duplicates("doc_id")
        sh_u = _batch_shingle_hashes(docs_u["t"].tolist(), k)
        pos = {int(i): j for j, i in enumerate(docs_u["doc_id"].to_numpy(dtype=np.int64))}
        ix = batch["id_a"].to_numpy(dtype=np.int64)
        iy = batch["id_b"].to_numpy(dtype=np.int64)
        sims = np.fromiter(
            (jaccard(sh_u[pos[int(a)]], sh_u[pos[int(b)]]) for a, b in zip(ix, iy)),
            dtype=np.float64,
            count=len(ix),
        )
        keep = sims >= threshold
        return pd.DataFrame({"id_a": ix[keep], "id_b": iy[keep], "jaccard": sims[keep]})

    return drop_empty_blocks(
        with_ab.map_batches(verify_pairs, batch_format="pandas")
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


class SimHasher:
    """Actor-pool stage: 64-bit simhash + 16-bit chunk keys per doc.

    Vectorized: per-bit votes are segment sums (``np.add.reduceat``) over
    the batch's concatenated shingle hashes; the full signature is
    emitted with every banded row (int64 bit-pattern) so downstream
    verification never needs a signature lookup table.
    """

    def __init__(self, shingle_k: int = 5):
        self.k = shingle_k

    def _simhashes(self, texts: list[str | None]) -> np.ndarray:
        """(n_docs,) uint64 simhash per text."""
        sh = _batch_shingle_hashes(texts, self.k)
        n = len(sh)
        out = np.zeros(n, dtype=np.uint64)
        counts = np.array([s.size for s in sh], dtype=np.int64)
        nz = np.flatnonzero(counts)
        if nz.size == 0:
            return out
        xs = np.concatenate([sh[i] for i in nz])
        offs = np.zeros(nz.size, dtype=np.int64)
        np.cumsum(counts[nz][:-1], out=offs[1:])
        cn = counts[nz]
        sig = np.zeros(nz.size, dtype=np.uint64)
        for bit in range(64):
            bvals = ((xs >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
            ones = np.add.reduceat(bvals, offs)
            sig |= ((2 * ones > cn).astype(np.uint64)) << np.uint64(bit)
        out[nz] = sig
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        sims_parts, lo, acc = [], 0, 0
        for i, t in enumerate(texts):
            acc += max(1, len(t or ""))
            if acc >= _SHINGLE_CHUNK:
                sims_parts.append(self._simhashes(texts[lo : i + 1]))
                lo, acc = i + 1, 0
        if lo < len(texts):
            sims_parts.append(self._simhashes(texts[lo:]))
        sims = np.concatenate(sims_parts) if sims_parts else np.empty(0, np.uint64)
        n = sims.size
        chunks = np.tile(np.arange(4, dtype=np.int32), n)
        rep = np.repeat(sims, 4)
        shifts = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        keys = ((rep >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "chunk": pa.array(chunks, pa.int32()),
                "chunk_key": pa.array(keys, pa.int64()),
                "simhash": pa.array(rep.view(np.int64), pa.int64()),
            }
        )


def _simhash_bucket_pairs(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    """Hamming-verified distinct pairs within one hash bucket of the
    banded simhash table — signatures ride with the rows, so verification
    is local (no driver-side signature map). One vectorized self-merge on
    (chunk, chunk_key) builds the candidate pairs."""
    sub = group.drop(columns="__bb")
    m = sub.merge(sub, on=["chunk", "chunk_key"])
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    if not len(m):
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "hamming": pd.Series(dtype="int64"),
            }
        )
    d = _popcount64(
        m["simhash_x"].to_numpy(dtype=np.int64).view(np.uint64)
        ^ m["simhash_y"].to_numpy(dtype=np.int64).view(np.uint64)
    )
    keep = d <= max_hamming
    return pd.DataFrame(
        {
            "id_a": m["doc_id_x"].to_numpy(dtype=np.int64)[keep],
            "id_b": m["doc_id_y"].to_numpy(dtype=np.int64)[keep],
            "hamming": d[keep],
        }
    ).drop_duplicates(["id_a", "id_b"])


def simhash_pairs(ds, max_hamming: int = 3, shingle_k: int = 5, concurrency: int = 4):
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.

    Banding: 4 chunks of 16 bits ⇒ any pair within hamming 3 shares at
    least one chunk (pigeonhole), so the chunk groupby finds all of them;
    hamming is verified inside the group from the carried signatures
    (larger max_hamming values remain approximate, as documented).
    """
    from cartography_ray.runtime import drop_empty_blocks

    hashed = ds.map_batches(
        SimHasher(shingle_k=shingle_k), batch_format="pyarrow", concurrency=concurrency
    )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["chunk_key"].to_numpy(dtype=np.int64, copy=False).view(np.uint64)
        return batch.assign(__bb=(_mix64(h) % np.uint64(64)).astype(np.int64))

    from cartography_ray.runtime import shuffle_partitions

    parts = shuffle_partitions(n_bytes=_corpus_bytes(ds))
    verified = drop_empty_blocks(
        hashed.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bb", num_partitions=parts)
        .map_groups(lambda g: _simhash_bucket_pairs(g, max_hamming), batch_format="pandas")
    )
    return _dedup_pairs(verified, num_partitions=parts)


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
    must be broadcastable. Subset shingle arrays are computed once and
    shipped via ``ray.put``; batch-side hashing is vectorized.
    """
    import ray

    sub = set(subset_ids)
    sub_texts: dict[int, str] = {}
    filt = ds.map_batches(
        lambda b: b.filter(
            pc.is_in(pc.cast(b.column(id_col), pa.int64()), pa.array(sorted(sub), pa.int64()))
        ),
        batch_format="pyarrow",
    )
    for blk in filt.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        for i, t in zip(blk.column(id_col).to_pylist(), blk.column(text_col).to_pylist()):
            sub_texts[i] = t
    sub_ids = list(sub_texts)
    sub_sh = dict(
        zip(sub_ids, _batch_shingle_hashes([sub_texts[i] for i in sub_ids], shingle_k))
    )
    sub_ref = ray.put(sub_sh)
    k = shingle_k

    def pairs(batch: pa.Table) -> pa.Table:
        smap = ray.get(sub_ref)
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        shs = _batch_shingle_hashes(batch.column(text_col).to_pylist(), k)
        out_a, out_b, out_j = [], [], []
        for i, sh in zip(ids, shs):
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


JACCARD_BUCKET_PAIR_LIMIT = 16_000_000


def jaccard_pairs_exact(
    ds,
    threshold: float,
    ngram: int = 5,
    max_df: int | None = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    prefix_filter: bool | str = "auto",
    workload_limit: int | None = None,
):
    """EXACT all-pairs n-gram-Jaccard set-similarity join via a shingle
    inverted index — no broadcast side (unlike ``jaccard_pairs_smallside``)
    and no candidate misses (unlike MinHash): ONE shuffle of the
    (shingle, id) postings clustered by shingle; each reducer bucket
    self-joins its postings lists into pre-aggregated pair-count partials
    plus per-doc size partials, and two small aggregations + a sizes join
    finish ``|A∩B| / |A∪B| ≥ threshold``.

    ``max_df`` drops shingles whose document frequency exceeds it (the
    standard stop-shingle cap: a shingle in k docs costs k²/2 pairs, so
    ubiquitous grams dominate cost while carrying no discriminative
    signal). Sizes are counted AFTER the cap, so the Jaccard is exact
    over the capped shingle space — the SQL oracle applies the identical
    cap. Shingles are the true lowercased character substrings (matching
    SQL ``substring(lower(text), i, k)``); texts shorter than ``ngram``
    contribute no shingles, as in the SQL.

    ``prefix_filter=True`` switches to the AllPairs/PPJoin-style 100-TB
    path (VERDICT r03 item 5): order each doc's capped shingles by
    ascending global document frequency (tie-break by shingle) and index
    only the first ⌊(1−τ)·|d|⌋+1 per doc — candidate-complete for
    threshold τ (two docs with J ≥ τ must share a shingle inside both
    prefixes under any shared total order), so posting volume falls
    superlinearly on skewed corpora while pair output stays IDENTICAL
    (asserted in tests/test_functions.py). Candidates are then verified
    exactly against the full capped shingle sets. More shuffles than the
    one-exchange default — use it when posting volume, not fixed shuffle
    cost, dominates (i.e. at scale, not at bench scale).

    ``prefix_filter="auto"`` (the default) runs the one-exchange plan
    OPTIMISTICALLY with an in-task workload guard (the minhash fold's
    pattern): each posting bucket already computes the per-shingle df
    histogram for the cap, so checking its measured pair workload
    (Σ df² over kept shingles) is free — a bucket that would merge more
    than ``workload_limit`` pair partials (default
    ``JACCARD_BUCKET_PAIR_LIMIT``) raises a sentinel BEFORE the n²
    merge, and the caller falls back to the prefix plan over the same
    input. Skewed corpora get the 100-TB plan without a caller flag;
    benign ones never pay the prefix path's extra shuffles. Both arms
    are forced and asserted pair-identical in tests/test_functions.py.
    The fallback re-reads ``ds`` (the shingle explode is linear and the
    pair partials it would have exchanged are the thing being avoided) —
    pass a file-backed or materialized input per the fan-out rule.
    """
    if prefix_filter is True:
        return _jaccard_pairs_prefix(
            ds, threshold, ngram, max_df, id_col, text_col, num_partitions
        )
    guard_limit = (
        (JACCARD_BUCKET_PAIR_LIMIT if workload_limit is None else workload_limit)
        if prefix_filter == "auto"
        else None
    )
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join

    explode = _make_shingle_explode(ngram, id_col, text_col)

    def tag(batch: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_array(batch["g"].to_numpy(), categorize=False)
        batch = batch.copy()
        batch["__gb"] = (h % 64).astype("int64")
        return pa.Table.from_pandas(batch, preserve_index=False).replace_schema_metadata(None)

    def bucket_kernel(group: pd.DataFrame) -> pa.Table:
        """All postings of each shingle are in this bucket: apply the df
        cap, emit per-doc size partials (kind 0) and per-pair
        intersection-count partials (kind 1)."""
        if max_df is not None or guard_limit is not None:
            df_per_g = group.groupby("g", sort=False)["id"].transform("size")
            if max_df is not None:
                keep = df_per_g <= max_df
                group, df_per_g = group[keep], df_per_g[keep]
            if guard_limit is not None and float(df_per_g.sum()) > guard_limit:
                # Σ over kept rows of df == Σ_g df_g² — the exact row count
                # the merge below would materialize; too hot for this plan
                raise _FoldTooHot()
        sizes = group.groupby("id", sort=False).size()
        p = group[["g", "id"]]
        pairs = p.merge(p, on="g")
        pairs = pairs[pairs["id_x"] < pairs["id_y"]]
        pc_ = pairs.groupby(["id_x", "id_y"], sort=False).size()
        out = pd.DataFrame(
            {
                "kind": np.concatenate(
                    [np.zeros(len(sizes), np.int8), np.ones(len(pc_), np.int8)]
                ),
                "a": np.concatenate(
                    [sizes.index.to_numpy(np.int64), pc_.index.get_level_values(0).to_numpy(np.int64)]
                    if len(pc_)
                    else [sizes.index.to_numpy(np.int64), np.empty(0, np.int64)]
                ),
                "b": np.concatenate(
                    [np.full(len(sizes), -1, np.int64), pc_.index.get_level_values(1).to_numpy(np.int64)]
                    if len(pc_)
                    else [np.full(len(sizes), -1, np.int64), np.empty(0, np.int64)]
                ),
                "cnt": np.concatenate([sizes.to_numpy(np.int64), pc_.to_numpy(np.int64)]),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    postings = ds.map_batches(explode, batch_format="pyarrow").map_batches(
        tag, batch_format="pandas"
    )
    grouped = postings.groupby("__gb", num_partitions=num_partitions).map_groups(
        bucket_kernel, batch_format="pandas"
    )

    from cartography_ray.ops.joins import (
        LOCAL_MERGE_BYTE_LIMIT,
        LOCAL_MERGE_ROW_LIMIT,
        _ensure_merge_task,
        _nonempty_refs,
    )

    try:
        refs, n_rows, n_bytes = _nonempty_refs(grouped)
    except Exception as e:
        if guard_limit is None or not _is_fold_too_hot(e):
            raise
        # a posting bucket measured its pair workload too hot for the
        # one-exchange plan: rerun as the prefix-filtered plan (the
        # posting-volume regime it exists for); identical pair output
        return _jaccard_pairs_prefix(
            ds, threshold, ngram, max_df, id_col, text_col, num_partitions
        )
    if not refs:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64()),
                 ("jaccard", pa.float64())]
            ).empty_table()
        )
    # Whole-tail elision: the rest of the plan (kind split → two grouped
    # folds → two sizes joins → jaccard filter) is LINEAR in the partial
    # rows, so a measured-small partial table finishes in ONE task —
    # replacing four barrier+shuffle stages. The float expression tree
    # ((na+nb)-c, max(·,1), divide, >=) is identical to the distributed
    # finish, so outputs are bit-equal (oracle-checked via
    # docs_clean_corpus / docs_dup_clusters either way).
    if n_rows <= LOCAL_MERGE_ROW_LIMIT and n_bytes <= LOCAL_MERGE_BYTE_LIMIT:
        import ray.data as _rd

        def tail_kernel(df: pd.DataFrame) -> pa.Table:
            sizes_s = df[df["kind"] == 0].groupby("a", sort=False)["cnt"].sum()
            inter_d = (
                df[df["kind"] == 1]
                .groupby(["a", "b"], sort=False)["cnt"]
                .sum()
                .reset_index()
            )
            na = sizes_s.reindex(inter_d["a"]).to_numpy(np.float64)
            nb = sizes_s.reindex(inter_d["b"]).to_numpy(np.float64)
            c = inter_d["cnt"].to_numpy(np.float64)
            jac = c / np.maximum((na + nb) - c, 1.0)
            keep = jac >= float(threshold)
            return pa.table(
                {
                    "id_a": pa.array(
                        inter_d["a"].to_numpy(np.int64)[keep], pa.int64()
                    ),
                    "id_b": pa.array(
                        inter_d["b"].to_numpy(np.int64)[keep], pa.int64()
                    ),
                    "jaccard": pa.array(jac[keep], pa.float64()),
                }
            )

        out_ref = _ensure_merge_task().remote(tail_kernel, "pandas", *refs)
        return _rd.from_arrow_refs([out_ref])

    import ray.data as _rd

    partials = _rd.from_arrow_refs(refs)

    def split(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind))

        return fn

    # elide_small: both aggs' post-combiner volume is output-sized (per-doc
    # sizes / per-pair counts), and `partials` is already materialized —
    # at bench scale each fold collapses to one task instead of a shuffle
    sizes = partial_groupby_agg(
        partials.map_batches(split(0), batch_format="pyarrow"),
        ["a"], {"n": ("cnt", "sum")}, num_partitions=num_partitions,
        elide_small=True,
    )
    inter = partial_groupby_agg(
        partials.map_batches(split(1), batch_format="pyarrow"),
        ["a", "b"], {"c": ("cnt", "sum")}, num_partitions=num_partitions,
        elide_small=True,
    )
    j1 = hash_join(inter, sizes, left_on="a", right_prefix="sa_", num_partitions=num_partitions)

    def ren(t: pa.Table) -> pa.Table:
        return pa.table(
            {"a": t.column("a"), "b": t.column("b"), "c": t.column("c"), "na": t.column("n")}
        )

    j2 = hash_join(
        j1.map_batches(ren, batch_format="pyarrow"), sizes,
        left_on="b", right_on="a", right_prefix="sb_", num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("c"), pa.float64())
        union = pc.subtract(
            pc.add(pc.cast(t.column("na"), pa.float64()), pc.cast(t.column("n"), pa.float64())),
            c,
        )
        jac = pc.divide(c, pc.max_element_wise(union, pa.scalar(1.0)))
        keep = pc.greater_equal(jac, pa.scalar(float(threshold)))
        t = t.filter(keep)
        jac = pc.divide(
            pc.cast(t.column("c"), pa.float64()),
            pc.max_element_wise(
                pc.subtract(
                    pc.add(
                        pc.cast(t.column("na"), pa.float64()),
                        pc.cast(t.column("n"), pa.float64()),
                    ),
                    pc.cast(t.column("c"), pa.float64()),
                ),
                pa.scalar(1.0),
            ),
        )
        return pa.table(
            {"id_a": t.column("a"), "id_b": t.column("b"), "jaccard": jac}
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def _make_shingle_explode(ngram: int, id_col: str, text_col: str):
    """(id, g) posting rows: unique lowercased char n-grams per doc."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64()).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_g: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            t = (t or "").lower()
            if len(t) < ngram:
                continue
            arr = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            win = np.lib.stride_tricks.sliding_window_view(arr, ngram)
            grams = np.unique(np.ascontiguousarray(win).view(f"<U{ngram}").ravel())
            out_g.append(grams)
            out_id.append(np.full(len(grams), i, dtype=np.int64))
        if not out_g:
            return pa.table(
                {"g": pa.array([], pa.string()), "id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "g": pa.array(np.concatenate(out_g)),
                "id": pa.array(np.concatenate(out_id), pa.int64()),
            }
        )

    return explode


_SET_SEP = "\x1f"


def _jaccard_pairs_prefix(
    ds,
    threshold: float,
    ngram: int,
    max_df: int | None,
    id_col: str,
    text_col: str,
    num_partitions: int | None,
):
    """AllPairs/PPJoin-style prefix-filtered exact set-similarity join —
    the scale path behind ``jaccard_pairs_exact(prefix_filter=True)``.

    Stages (every exchange is a hash bucket groupby):
      1. by shingle: df cap, postings annotated with global df
      2. by doc: order shingles by (df, g) asc, index the first
         ⌊(1−τ)·|d|⌋+1 (candidate-complete prefix) + emit the full capped
         set per doc as one joined string (for exact verification)
      3. by shingle over PREFIX postings only: distinct candidate pairs
      4. global distinct of candidates
      5. by id_a then by id_b: attach both docs' sets, verify
         |A∩B|/|A∪B| ≥ τ exactly

    Pair output is identical to the default one-exchange path by
    construction; the win is that stage-3 volume is prefix-sized. The
    verification kernel walks candidates in Python — candidates are
    post-filter few by design (if they are not, the threshold is too low
    for prefix filtering to help and the default path is the right tool).
    """
    from cartography_ray.ops.agg import _to_clean_arrow, partial_groupby_agg
    from cartography_ray.runtime import drop_empty_blocks

    nb = 64

    def tag_by(col: str):
        # Arrow-native tagging: a pandas round-trip would float-ify the
        # nullable int64 a/b columns of the widened union and split the
        # shuffle's block schemas
        def tag(t: pa.Table) -> pa.Table:
            v = t.column(col).to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(v, categorize=False)
            return t.append_column("__gb", pa.array((h % nb).astype("int64")))

        return tag

    # -- stage 1: df cap + df annotation (all postings of a g co-located)
    def cap_kernel(group: pd.DataFrame) -> pa.Table:
        df_per = group.groupby("g", sort=False)["g"].transform("size")
        if max_df is not None:
            keep = df_per <= max_df
            group, df_per = group[keep], df_per[keep]
        out = group[["g", "id"]].copy()
        out["df"] = df_per.astype("int64")
        return _to_clean_arrow(out)

    postings = ds.map_batches(
        _make_shingle_explode(ngram, id_col, text_col), batch_format="pyarrow"
    ).map_batches(tag_by("g"), batch_format="pyarrow")
    from cartography_ray.ops.joins import _empty_table_ds, _nonempty_or_none

    out_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
    )
    postings = _nonempty_or_none(postings)
    if postings is None:
        return _empty_table_ds(out_schema)
    capped = drop_empty_blocks(
        postings.groupby("__gb", num_partitions=num_partitions).map_groups(
            cap_kernel, batch_format="pandas"
        )
    )

    # -- stage 2: per-doc prefix + full-set string
    def prefix_kernel(group: pd.DataFrame) -> pa.Table:
        s = group.sort_values(["id", "df", "g"], kind="mergesort")
        n = s.groupby("id", sort=False)["g"].transform("size").to_numpy()
        pos = s.groupby("id", sort=False).cumcount().to_numpy()
        plen = np.floor((1.0 - threshold) * n).astype("int64") + 1
        pref = s[pos < plen][["g", "id"]].copy()
        pref["doc"] = ""
        sets = s.groupby("id", sort=False)["g"].agg(_SET_SEP.join).reset_index()
        sets.columns = ["id", "doc"]
        sets["g"] = ""
        pref["kind"] = np.int8(0)
        sets["kind"] = np.int8(1)
        return _to_clean_arrow(
            pd.concat(
                [pref[["kind", "g", "id", "doc"]], sets[["kind", "g", "id", "doc"]]],
                ignore_index=True,
            )
        )

    staged = drop_empty_blocks(
        capped.map_batches(tag_by("id"), batch_format="pyarrow")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(prefix_kernel, batch_format="pandas")
    )

    def split(kind: int, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind)).select(cols)

        return fn

    prefix_postings = staged.map_batches(split(0, ["g", "id"]), batch_format="pyarrow")
    doc_sets = staged.map_batches(split(1, ["id", "doc"]), batch_format="pyarrow")

    # -- stage 3: candidate pairs (prefix postings only)
    def cand_kernel(group: pd.DataFrame) -> pa.Table:
        p = group[["g", "id"]]
        pairs = p.merge(p, on="g")
        pairs = pairs[pairs["id_x"] < pairs["id_y"]]
        return _to_clean_arrow(
            pairs[["id_x", "id_y"]].drop_duplicates().rename(columns={"id_x": "a", "id_y": "b"})
        )

    cands = drop_empty_blocks(
        prefix_postings.map_batches(tag_by("g"), batch_format="pyarrow")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(cand_kernel, batch_format="pandas")
    )
    # -- stage 4: global distinct
    cands = partial_groupby_agg(
        cands, ["a", "b"], {"__c": (None, "count")}, num_partitions=num_partitions
    ).select_columns(["a", "b"])

    # -- stage 5: attach set(a), then set(b) + exact verify
    def attach(side: str):
        """Union candidates with doc sets, co-locate by the side's id, map
        each candidate row to its doc string (kernel dict is bucket-local,
        bounded by the bucket's doc count)."""

        def widen_cand(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "key": t.column("a" if side == "a" else "b"),
                    "a": t.column("a"),
                    "b": t.column("b"),
                    "doc": pa.nulls(n, pa.string()),
                    "doc_a": t.column("doc_a") if "doc_a" in t.column_names else pa.nulls(n, pa.string()),
                }
            )

        def widen_set(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "key": t.column("id"),
                    "a": pa.nulls(n, pa.int64()),
                    "b": pa.nulls(n, pa.int64()),
                    "doc": t.column("doc"),
                    "doc_a": pa.nulls(n, pa.string()),
                }
            )

        return widen_cand, widen_set

    def attach_kernel(out_col: str):
        def fn(group: pd.DataFrame) -> pa.Table:
            is_set = group["a"].isna()
            m = dict(zip(group.loc[is_set, "key"], group.loc[is_set, "doc"]))
            c = group[~is_set].copy()
            c[out_col] = c["key"].map(m)
            keep = ["a", "b", "doc_a"] if out_col == "doc_a" else ["a", "b", "doc_a", "doc_b"]
            c["a"] = c["a"].astype("int64")
            c["b"] = c["b"].astype("int64")
            return _to_clean_arrow(c[keep])

        return fn

    wc_a, ws_a = attach("a")
    round1 = drop_empty_blocks(
        cands.map_batches(wc_a, batch_format="pyarrow")
        .union(doc_sets.map_batches(ws_a, batch_format="pyarrow"))
        .map_batches(tag_by("key"), batch_format="pyarrow")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(attach_kernel("doc_a"), batch_format="pandas")
    )
    wc_b, ws_b = attach("b")
    round2 = drop_empty_blocks(
        round1.map_batches(wc_b, batch_format="pyarrow")
        .union(doc_sets.map_batches(ws_b, batch_format="pyarrow"))
        .map_batches(tag_by("key"), batch_format="pyarrow")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(attach_kernel("doc_b"), batch_format="pandas")
    )

    def verify(batch: pd.DataFrame) -> pa.Table:
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        for a, b, da, db in zip(batch["a"], batch["b"], batch["doc_a"], batch["doc_b"]):
            sa = set(da.split(_SET_SEP))
            sb = set(db.split(_SET_SEP))
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac = inter / max(union, 1)
            if jac >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(jac)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return round2.map_batches(verify, batch_format="pandas")


# benchmark shingle sets are small by nature (an eval suite is thousands
# of docs next to a corpus of billions) — broadcast below this many
# distinct shingles, distributed semi/anti join above
DECONTAM_BROADCAST_LIMIT = 5_000_000


def decontaminate(
    corpus,
    bench,
    ngram: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
):
    """Benchmark decontamination — the eval-overlap scrub of training-data
    assembly: drop every corpus document that shares at least one
    ``ngram``-char lowered shingle with ANY benchmark document. Returns
    the surviving corpus rows with all input columns.

    Two plans behind one size guard (the repo's standard contract, cf.
    ``resolve_keys`` / ``tfidf_topk``):

    - distinct benchmark shingles ≤ ``broadcast_limit`` (the real-world
      shape): ONE ``ray.put`` of the shingle set, then a pure per-batch
      sliding-window membership scan of the corpus — NO corpus shuffle.
    - above the limit: the corpus explodes into distinct (doc, shingle)
      postings that ``hash_join(how="semi")`` the benchmark shingles on a
      shingle-keyed shuffle; the contaminated id set (distinct-folded,
      ≤ one row per corpus doc) then ``hash_join(how="anti")``s back onto
      the corpus. Fully distributed; the corpus pays one posting-sized
      exchange (≈ chars per doc), the price of an unbroadcastable bench.

    Shingles are true codepoint substrings of ``lower(text)`` (stride 1),
    identical to SQL ``substring(lower(text), i, ngram)``, so the DuckDB
    twin is a full hash oracle. Both plans emit identical rows (asserted
    in tests/test_functions.py).
    """
    import ray

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join

    limit = DECONTAM_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    explode = _make_shingle_explode(ngram, id_col, text_col)

    bench_sh = partial_groupby_agg(
        bench.map_batches(explode, batch_format="pyarrow"),
        ["g"],
        {"__c": (None, "count")},
        num_partitions=num_partitions,
        empty_schema=pa.schema([("g", pa.string()), ("__c", pa.int64())]),
    ).materialize()

    if bench_sh.count() <= limit:
        grams: list[str] = []
        for blk in bench_sh.select_columns(["g"]).iter_batches(batch_format="pyarrow"):
            grams.extend(blk.column("g").to_pylist())
        bench_ref = ray.put(frozenset(grams))

        def scan(batch: pa.Table) -> pa.Table:
            bset = ray.get(bench_ref)
            texts = batch.column(text_col).to_pylist()
            keep = np.ones(len(texts), dtype=bool)
            for i, t in enumerate(texts):
                t = (t or "").lower()
                if len(t) < ngram:
                    continue
                arr = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                win = np.lib.stride_tricks.sliding_window_view(arr, ngram)
                grams_i = np.unique(np.ascontiguousarray(win).view(f"<U{ngram}").ravel())
                if any(g in bset for g in grams_i):
                    keep[i] = False
            return batch.filter(pa.array(keep))

        return corpus.map_batches(scan, batch_format="pyarrow")

    postings = corpus.map_batches(explode, batch_format="pyarrow")
    # most corpus shingles are NOT in the benchmark — the textbook
    # selective semi join: a bench-sized bloom drops them before the
    # posting exchange, so the shuffle carries hits + false positives
    n_bench = bench_sh.count()
    hits = hash_join(
        postings,
        bench_sh.select_columns(["g"]),
        left_on="g",
        how="semi",
        num_partitions=num_partitions,
        bloom_prefilter_bits=max(1 << 16, 10 * n_bench),
    )
    contaminated = partial_groupby_agg(
        hits.map_batches(lambda t: t.select(["id"]), batch_format="pyarrow"),
        ["id"],
        {"__c": (None, "count")},
        num_partitions=num_partitions,
        empty_schema=pa.schema([("id", pa.int64()), ("__c", pa.int64())]),
    )
    return hash_join(
        corpus,
        contaminated.map_batches(lambda t: t.select(["id"]), batch_format="pyarrow"),
        left_on=id_col,
        right_on="id",
        how="anti",
        num_partitions=num_partitions,
        right_schema=pa.schema([("id", pa.int64())]),
    )


NEAR_DECONTAM_BROADCAST_LIMIT = 5_000_000  # bench (band, hash) rows


def near_decontaminate(
    corpus,
    bench,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int | None = None,
    num_partitions: int | None = None,
):
    """NEAR-duplicate benchmark decontamination — ``decontaminate``'s
    MinHash sibling: drop every corpus document whose LSH banding
    collides with ANY benchmark document (share ≥1 of the ``bands``
    band hashes ⇒ likely char-``shingle_k``-gram Jaccard near-dup; with
    r = num_perm/bands rows per band a collision certifies r minhash
    agreements, so precision is tuned by r exactly as in
    ``minhash_lsh_pairs``). Catches the paraphrased/reformatted eval
    leakage exact-shingle containment misses. Approximate-by-design
    (rows-only; recall asserted in tests), deterministic end to end
    (splitmix hash family, no RNG at apply time).

    Two plans behind one size guard (the ``decontaminate`` contract),
    asserted row-identical in tests:

    - bench (band, band_hash) rows ≤ ``broadcast_limit`` (benchmarks are
      small by nature — the real-world shape): ONE ``ray.put`` of the
      per-band hash sets, then a pure per-batch signature scan of the
      corpus — ZERO corpus shuffles at any corpus scale.
    - above the limit: corpus banded rows ``hash_join(how="semi")`` the
      bench banded rows on (band, band_hash), the contaminated id set
      folds distinct, and an anti join returns survivors — one
      banded-row exchange (fixed 3 int64s/row × bands, text never moves).
    """
    import ray

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.ops.joins import hash_join

    limit = NEAR_DECONTAM_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    band_kwargs = dict(
        num_perm=num_perm, bands=bands, shingle_k=shingle_k, payload="none"
    )

    def banded(ds):
        sel = ds.map_batches(
            lambda t, _i=id_col, _t=text_col: pa.table(
                {"doc_id": pc.cast(t.column(_i), pa.int64()),
                 "text": pc.cast(t.column(_t), pa.string())}
            ),
            batch_format="pyarrow",
        )
        # elastic pool (min 1): a fixed min-4 pool deadlocks a 4-CPU
        # cluster when two pools + shuffle aggregators contend for slots
        return sel.map_batches(
            MinHasher, fn_constructor_kwargs=band_kwargs,
            batch_format="pyarrow", concurrency=(1, 4),
        )

    bench_bands = partial_groupby_agg(
        banded(bench).map_batches(
            lambda t: t.select(["band", "band_hash"]), batch_format="pyarrow"
        ),
        ["band", "band_hash"],
        {"__c": (None, "count")},
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("band", pa.int32()), ("band_hash", pa.int64()), ("__c", pa.int64())]
        ),
    ).materialize()

    if bench_bands.count() <= limit:
        bpdf = bench_bands.select_columns(["band", "band_hash"]).to_pandas()
        per_band = {
            int(b): np.sort(g.to_numpy(np.int64))
            for b, g in bpdf.groupby("band", sort=False)["band_hash"]
        }
        bands_ref = ray.put(per_band)

        class _Scanner(MinHasher):
            def __call__(self, batch: pa.Table) -> pa.Table:
                bset = ray.get(bands_ref)
                rows = super().__call__(
                    pa.table(
                        {
                            "doc_id": pa.array(
                                np.arange(batch.num_rows, dtype=np.int64), pa.int64()
                            ),
                            "text": pc.cast(
                                pc.fill_null(
                                    pc.cast(batch.column(text_col), pa.string()), ""
                                ),
                                pa.string(),
                            ),
                        }
                    )
                )
                keep = np.ones(batch.num_rows, dtype=bool)
                rid = rows.column("doc_id").to_numpy(zero_copy_only=False)
                rb = rows.column("band").to_numpy(zero_copy_only=False)
                rh = rows.column("band_hash").to_numpy(zero_copy_only=False)
                for b, arr in bset.items():  # ≤ `bands` iterations
                    sel = rb == b
                    if sel.any():
                        hit = np.isin(rh[sel], arr, assume_unique=False)
                        keep[rid[sel][hit]] = False
                return batch.filter(pa.array(keep))

        return corpus.map_batches(
            _Scanner, fn_constructor_kwargs=band_kwargs,
            batch_format="pyarrow", concurrency=(1, 4),
        )

    hits = hash_join(
        banded(corpus),
        bench_bands.select_columns(["band", "band_hash"]),
        left_on=["band", "band_hash"],
        how="semi",
        num_partitions=num_partitions,
    )
    contaminated = partial_groupby_agg(
        hits.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow"),
        ["doc_id"],
        {"__c": (None, "count")},
        num_partitions=num_partitions,
        empty_schema=pa.schema([("doc_id", pa.int64()), ("__c", pa.int64())]),
    )
    return hash_join(
        corpus,
        contaminated.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow"),
        left_on=id_col,
        right_on="doc_id",
        how="anti",
        num_partitions=num_partitions,
        right_schema=pa.schema([("doc_id", pa.int64())]),
    )


def span_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    num_buckets: int = 64,
    num_partitions: int | None = None,
    payload: str = "text",
    bloom_bits: int = 1 << 22,
):
    """Corpus-wide duplicate-SPAN removal (the MassiveText / RefinedWeb
    sub-document dedup step, at fixed-window granularity): split every
    document into ``span_tokens``-token chunks, keep each distinct chunk
    text only at its globally FIRST occurrence (lexicographic min of
    ``(doc_id, chunk_idx)``), delete every other occurrence, and
    reassemble documents from their surviving chunks. Output:
    ``(id_col, text_col)`` — one row per input document (documents that
    lose every span keep an empty string; whitespace is normalized to
    single spaces by the chunking step).

    Shape: chunking is the shuffle-free ``chunk_documents`` flat_map.
    Keep-first is a per-batch combiner (local argmin per chunk key —
    any local non-min can never be the global min, so dropping it
    pre-shuffle is exact) followed by ONE keyed ``partial_groupby_agg``
    min over the packed occurrence id ``doc_id·2^20 + chunk_idx``.
    Reassembly is one survivor-sized doc-keyed shuffle, and the
    all-documents outer anchor is an id-only ``hash_join`` (no text).
    Nothing corpus-sized touches the driver.

    ``payload`` picks what the DEDUP shuffle ships (the minhash payload
    pattern):
    - ``"text"`` (default, exact): the chunk text is the groupby key.
    - ``"hash"`` (the 100-TB posture): the dedup exchange ships only
      ``(h1, h2, occ)`` — a 128-bit siphash of the chunk text in two
      independently-keyed 64-bit halves — and survivor text is fetched
      afterwards with a bloom-prefiltered semi-join of the (cheaply
      recomputed) chunk stream against the skinny survivor occ set, so
      non-surviving chunk text never enters ANY exchange. One more
      (skinny) exchange than ``"text"``, but exchange bytes no longer
      scale with span width. Equal-hash distinct spans are treated as
      duplicates (128-bit: negligible; false bloom positives only waste
      shuffle rows, never correctness). Output-identical to ``"text"``
      (test-asserted, and the catalogue twin shares the oracle).
    """
    import ray.data

    from cartography_ray.functions.text import chunk_documents
    from cartography_ray.ops.agg import _to_clean_arrow, partial_groupby_agg
    from cartography_ray.ops.joins import hash_join
    from cartography_ray.runtime import drop_empty_blocks

    if payload not in ("text", "hash"):
        raise ValueError(f"span_dedup: payload must be text|hash, got {payload!r}")

    IDX_BITS = 20

    chunks = chunk_documents(
        ds, id_col=id_col, text_col=text_col, max_tokens=span_tokens
    )

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype("int64")
        idx = batch.column("chunk_idx").to_numpy(zero_copy_only=False).astype("int64")
        if idx.size and int(idx.max()) >= (1 << IDX_BITS):
            raise ValueError(
                f"span_dedup: document with ≥2^{IDX_BITS} chunks — raise "
                "span_tokens or widen the packed occurrence id"
            )
        return pa.table(
            {
                "chunk_text": batch.column("chunk_text"),
                "occ": pa.array((ids << IDX_BITS) | idx, pa.int64()),
            }
        )

    packed = chunks.map_batches(pack, batch_format="pyarrow")

    if payload == "text":
        survivors = partial_groupby_agg(
            packed,
            ["chunk_text"],
            {"occ": ("occ", "min")},
            num_buckets=num_buckets,
            num_partitions=num_partitions,
            empty_schema=pa.schema(
                [("chunk_text", pa.string()), ("occ", pa.int64())]
            ),
        )
    else:
        packed = packed.materialize()  # consumed twice: skinny agg + probe

        def skinny(batch: pa.Table) -> pa.Table:
            s = pd.Series(batch.column("chunk_text").to_pandas())
            h1 = pd.util.hash_pandas_object(s, index=False, hash_key="0123456789123456")
            h2 = pd.util.hash_pandas_object(s, index=False, hash_key="fedcba9876543210")
            return pa.table(
                {
                    "h1": pa.array(h1.to_numpy().view("int64"), pa.int64()),
                    "h2": pa.array(h2.to_numpy().view("int64"), pa.int64()),
                    "occ": batch.column("occ"),
                }
            )

        surv_occ = partial_groupby_agg(
            packed.map_batches(skinny, batch_format="pyarrow"),
            ["h1", "h2"],
            {"occ": ("occ", "min")},
            num_buckets=num_buckets,
            num_partitions=num_partitions,
            empty_schema=pa.schema(
                [("h1", pa.int64()), ("h2", pa.int64()), ("occ", pa.int64())]
            ),
        ).map_batches(lambda t: t.select(["occ"]), batch_format="pyarrow")
        survivors = hash_join(
            packed,
            surv_occ,
            left_on="occ",
            how="semi",
            num_buckets=num_buckets,
            num_partitions=num_partitions,
            left_schema=pa.schema(
                [("chunk_text", pa.string()), ("occ", pa.int64())]
            ),
            right_schema=pa.schema([("occ", pa.int64())]),
            bloom_prefilter_bits=bloom_bits,
        )
        # zero-row join blocks skip the unpack UDF below and reach the
        # reassembly shuffle without __gb (Ray 2.49 empty-block rule)
        survivors = drop_empty_blocks(survivors)

    def unpack(batch: pa.Table) -> pa.Table:
        occ = batch.column("occ").to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                id_col: pa.array(occ >> IDX_BITS, pa.int64()),
                "chunk_idx": pa.array(occ & ((1 << IDX_BITS) - 1), pa.int64()),
                "chunk_text": batch.column("chunk_text"),
            }
        )
        h = pd.util.hash_pandas_object(
            pd.Series(occ >> IDX_BITS), index=False
        ).to_numpy()
        return out.append_column(
            "__gb", pa.array((h % num_buckets).astype("int64"), pa.int64())
        )

    def assemble(group: pd.DataFrame) -> pa.Table:
        g = (
            group.sort_values([id_col, "chunk_idx"], kind="mergesort")
            .groupby(id_col, sort=False)["chunk_text"]
            .agg(" ".join)
            .reset_index(name=text_col)
        )
        return _to_clean_arrow(g)

    assembled = (
        survivors.map_batches(unpack, batch_format="pyarrow")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(assemble, batch_format="pandas")
    )
    anchor = ds.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow"
    )
    joined = hash_join(
        anchor,
        assembled,
        left_on=id_col,
        how="left",
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, pa.int64())]),
        right_schema=pa.schema([(id_col, pa.int64()), (text_col, pa.string())]),
    )
    return drop_empty_blocks(
        joined.map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    text_col: pc.coalesce(
                        pc.cast(t.column(text_col), pa.string()), pa.scalar("")
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
