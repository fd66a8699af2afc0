"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: brute-force cosine top-k — the correctness baseline.
  The query matrix is broadcast once (``ray.put``); each batch does one
  float64 GEMM against it and emits its LOCAL top-k per query; a final
  small groupby merges per-query candidates. The corpus is streamed,
  never gathered.
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets corpus
  AND queries; only matching buckets are scanned. Recall < 1 by design;
  parameterize planes/probes per corpus.

Determinism: similarities are rounded to 6 decimals before ranking and
ties break by ascending vec_id, so results are stable across block
orders and match the DuckDB oracle's ORDER BY round(sim, 6) DESC, id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _matrix_of(batch: pa.Table, col: str) -> np.ndarray:
    lists = batch.column(col)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(lists)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _parquet_row_count(files: list[str]) -> int:
    """Row count from parquet footers — the indexed-kNN telemetry used to
    call ``Dataset.count()``, which re-read every probed partition before
    the query read them again (ADVICE r03: 2× I/O on the hot path)."""
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in files)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute(
    ds,
    queries: dict[int, np.ndarray],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Top-k cosine neighbors per query (excluding the query row itself).

    Returns (query_id, neighbor_id, rank, sim6) — sim rounded to 6dp.
    """
    import ray

    from cartography_ray.runtime import drop_empty_blocks

    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    q_ref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(q_ref)
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        mat = _normalize(_matrix_of(batch, vec_col))
        if mat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim6": pa.array([], pa.float64()),
                }
            )
        sims = np.round(qmat_ @ mat.T, 6)  # (n_queries, n_batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])
        for qi, qid in enumerate(qids_):
            row = sims[qi]
            # local candidates: top (k+1) by (sim desc, id asc)
            order = np.lexsort((ids, -row))[:kk]
            for j in order:
                if ids[j] == qid:
                    continue
                out_q.append(qid)
                out_n.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim6": pa.array(out_s, pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim6", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "neighbor_id", "rank", "sim6"]]

    # candidate stream is #queries × k per block — size the merge shuffle
    # to the (tiny) query count, not the session default
    merged = drop_empty_blocks(
        cand.groupby("query_id", num_partitions=max(1, min(len(qids), 16))).map_groups(
            merge, batch_format="pandas"
        )
    )
    return merged


def mmr_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    lam: float = 0.7,
    pool: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maximal-Marginal-Relevance diverse top-k (Carbonell & Goldstein
    1998): greedily select argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
    — the diversity-aware selection a training-data pipeline uses to
    sample varied exemplars instead of k near-copies.

    Two stages: (1) DISTRIBUTED pool selection — per-batch cosine
    top-``pool`` partials with vectors riding along, merged to the
    global pool by (sim6 desc, id asc — the ann family's determinism
    contract); driver memory is pool × dim floats plus pool × blocks
    candidate rows, bounded by the POOL parameter, never the corpus.
    (2) The greedy argmax loop over the pool (k × pool numpy ops).
    Greedy MMR is restricted to the pool by construction; pool ≥ corpus
    recovers textbook MMR exactly (reference-equality tested).

    Returns (rank, vec_id, sim6, mmr6): ``rank`` 1..k in selection
    order (rank 1 is the plain nearest neighbor), ``mmr6`` the rounded
    objective at selection time (empty-set diversity term = 0).
    Iterative argmax has no tractable SQL twin — rows-only in the
    driver gate, reference-equality in tests (the PageRank-family
    precedent).
    """
    import ray

    q = _normalize(np.asarray(query, dtype=np.float64)[None, :])[0]
    q_ref = ray.put(q)

    def _ride_type(batch: pa.Table) -> pa.DataType:
        # Preserve the corpus's float width in the ride-along: a float32
        # cast of float64 vectors would perturb the driver's diversity
        # sims by ~1e-7 and can flip a 6-decimal argmax tie, breaking
        # the "pool ≥ corpus recovers textbook MMR exactly" contract.
        vt = batch.schema.field(vec_col).type
        value = getattr(vt, "value_type", pa.float32())
        return pa.list_(
            pa.float64() if pa.types.is_float64(value) else pa.float32()
        )

    def local_pool(batch: pa.Table) -> pa.Table:
        q_ = ray.get(q_ref)
        vec_type = _ride_type(batch)
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        mat = _normalize(_matrix_of(batch, vec_col))
        if mat.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "sim6": pa.array([], pa.float64()),
                    vec_col: pa.array([], vec_type),
                }
            )
        sims = np.round(mat @ q_, 6)
        order = np.lexsort((ids, -sims))[: min(pool, len(ids))]
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "sim6": pa.array(sims[order], pa.float64()),
                vec_col: col.take(pa.array(order, pa.int64())).cast(vec_type),
            }
        )

    def _empty():
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim6": pa.array([], pa.float64()),
                "mmr6": pa.array([], pa.float64()),
            }
        )

    cand = ds.map_batches(local_pool, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return _empty()
    cand = (
        cand.sort_values(["sim6", id_col], ascending=[False, True])
        .head(pool)
        .reset_index(drop=True)
    )
    vecs = _normalize(np.stack(cand[vec_col].to_numpy()).astype(np.float64))
    simq = cand["sim6"].to_numpy(np.float64)
    ids = cand[id_col].to_numpy(np.int64)
    n = len(ids)
    active = np.ones(n, dtype=bool)
    max_div = np.full(n, -np.inf)
    ranks, sel_ids, sel_sims, sel_mmr = [], [], [], []
    for r in range(1, min(k, n) + 1):
        div = np.where(np.isneginf(max_div), 0.0, max_div)
        obj6 = np.round(lam * simq - (1.0 - lam) * div, 6)
        obj6 = np.where(active, obj6, -np.inf)
        best = int(np.lexsort((ids, -obj6))[0])
        ranks.append(r)
        sel_ids.append(int(ids[best]))
        sel_sims.append(float(simq[best]))
        sel_mmr.append(float(obj6[best]))
        active[best] = False
        max_div = np.maximum(max_div, np.round(vecs @ vecs[best], 6))
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "vec_id": pa.array(sel_ids, pa.int64()),
            "sim6": pa.array(sel_sims, pa.float64()),
            "mmr6": pa.array(sel_mmr, pa.float64()),
        }
    )


class _LshTag:
    """Random-hyperplane signature: bucket = sign-bit pattern of P planes."""

    def __init__(self, dim: int, planes: int, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((planes, dim))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        return bits @ (1 << np.arange(bits.shape[1]))


def knn_lsh(
    ds,
    queries: dict[int, np.ndarray],
    k: int = 5,
    planes: int = 6,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
):
    """Approximate top-k: scan only corpus rows whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe). Same output
    schema as knn_brute; recall < 1 by design — tune planes/probe."""
    import ray

    from cartography_ray.runtime import drop_empty_blocks

    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    dim = qmat.shape[1]
    tagger = _LshTag(dim, planes, seed)
    qbuckets = tagger.bucket(qmat)
    q_ref = ray.put((qids, qmat, qbuckets))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qmat_, qb_ = ray.get(q_ref)
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        mat = _normalize(_matrix_of(batch, vec_col))
        out_q, out_n, out_s = [], [], []
        if mat.size:
            buckets = tagger.bucket(mat)
            for qi, qid in enumerate(qids_):
                xor = np.bitwise_xor(buckets.astype(np.int64), int(qb_[qi]))
                # popcount via numpy byte view
                pop = np.unpackbits(xor.astype(np.uint64).view(np.uint8).reshape(len(xor), 8), axis=1).sum(axis=1)
                mask = pop <= probe_hamming
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                sims = np.round(qmat_[qi] @ mat[mask].T, 6)
                order = np.lexsort((sub_ids, -sims))[: k + 1]
                for j in order:
                    if sub_ids[j] == qid:
                        continue
                    out_q.append(qid)
                    out_n.append(int(sub_ids[j]))
                    out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim6": pa.array(out_s, pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim6", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "neighbor_id", "rank", "sim6"]]

    return drop_empty_blocks(
        cand.groupby("query_id", num_partitions=max(1, min(len(qids), 16))).map_groups(
            merge, batch_format="pandas"
        )
    )


# ------------------------------------------------------------------ indexed


def build_lsh_index(
    ds,
    index_dir: str,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    input_fingerprint: str | None = None,
) -> str:
    """Write the corpus ONCE partitioned by LSH bucket (one Hive
    directory per sign-pattern bucket) — the scale path VERDICT asked
    for: queries then read ONLY matching partitions instead of scanning
    every batch and filtering. Returns the index dir. A ``meta.json``
    records (planes, seed, dim, input_fingerprint) so query-side tagging
    matches and callers can detect a stale index when the source corpus
    is regenerated in place (ADVICE r02)."""
    import glob as _glob
    import json
    import os

    import pyarrow.parquet as pq

    def tag(batch: pa.Table) -> pa.Table:
        mat = _normalize(_matrix_of(batch, vec_col))
        if mat.size == 0:
            return batch.append_column("lsh_bucket", pa.array([], pa.int64()))
        tagger = _LshTag(mat.shape[1], planes, seed)
        return batch.append_column(
            "lsh_bucket", pa.array(tagger.bucket(mat).astype(np.int64), pa.int64())
        )

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["lsh_bucket"]
    )
    parts = sorted(_glob.glob(os.path.join(index_dir, "**", "*.parquet"), recursive=True))
    if parts:
        first = pq.read_table(parts[0], columns=[vec_col]).column(vec_col)
        dim = len(first[0]) if len(first) else 0
    else:
        dim = 0  # empty corpus: meta still written so readers get a clean empty
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {"planes": planes, "seed": seed, "dim": dim,
             "input_fingerprint": input_fingerprint},
            f,
        )
    return index_dir


def knn_lsh_indexed(
    index_dir: str,
    queries: dict[int, np.ndarray],
    k: int = 5,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Approximate top-k over a ``build_lsh_index`` directory: only the
    partitions within ``probe_hamming`` of any query bucket are READ —
    scan volume is the matching buckets, not the corpus. Same candidate
    semantics (and output schema) as ``knn_lsh``.

    Returns (result_dataset, stats) with stats = {"partitions_read",
    "partitions_total", "rows_scanned"}.
    """
    import glob as _glob
    import json
    import os

    import ray.data

    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    planes, seed = int(meta["planes"]), int(meta["seed"])
    if int(meta["dim"]) == 0:  # empty corpus indexed — clean empty result
        import pyarrow as _pa
        import ray.data

        empty = _pa.table(
            {
                "query_id": _pa.array([], _pa.int64()),
                "neighbor_id": _pa.array([], _pa.int64()),
                "rank": _pa.array([], _pa.int64()),
                "sim6": _pa.array([], _pa.float64()),
            }
        )
        return ray.data.from_arrow(empty), {
            "partitions_read": 0, "partitions_total": 0, "rows_scanned": 0,
        }
    tagger = _LshTag(int(meta["dim"]), planes, seed)
    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    qbuckets = set(int(b) for b in tagger.bucket(qmat))
    # multi-probe: all buckets within probe_hamming of any query bucket
    probe: set[int] = set()
    for qb in qbuckets:
        for b in range(1 << planes):
            if bin(b ^ qb).count("1") <= probe_hamming:
                probe.add(b)
    all_parts = sorted(_glob.glob(os.path.join(index_dir, "lsh_bucket=*")))
    hit_dirs = [
        d for d in all_parts if int(os.path.basename(d).split("=", 1)[1]) in probe
    ]
    stats = {"partitions_read": len(hit_dirs), "partitions_total": len(all_parts)}
    if not hit_dirs:
        import pyarrow as _pa

        empty = _pa.table(
            {
                "query_id": _pa.array([], _pa.int64()),
                "neighbor_id": _pa.array([], _pa.int64()),
                "rank": _pa.array([], _pa.int64()),
                "sim6": _pa.array([], _pa.float64()),
            }
        )
        stats["rows_scanned"] = 0
        return ray.data.from_arrow(empty), stats
    hit_files = sorted(
        f for d in hit_dirs for f in _glob.glob(os.path.join(d, "*.parquet"))
    )
    sub = ray.data.read_parquet(hit_files, columns=[id_col, vec_col])
    stats["rows_scanned"] = _parquet_row_count(hit_files)
    out = knn_lsh(
        sub,
        queries,
        k=k,
        planes=planes,
        probe_hamming=probe_hamming,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
    )
    return out, stats


def cosine_neardup_pairs(
    ds,
    threshold: float,
    num_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """EXACT embedding-cosine near-duplicate pairs (the last member of the
    dedup family — exact / MinHash / SimHash / Jaccard / embedding-cosine).

    Distributed triangle block-pair join: each row is assigned a block
    ``p = id % P`` and replicated to every unordered block pair
    ``(min(p,q), max(p,q))``; a groupby on the pair key then runs one
    float64 GEMM per block pair and emits pairs with
    ``round(cos, 6) >= threshold`` and ``id_a < id_b``.

    Scale posture: communication is O(n·P) rows and each group holds
    ~2n/P rows, so P is chosen so a block pair fits a worker's heap
    (P ≈ n / block_target); compute is the unavoidable exact O(n²/2)
    but spread over P(P+1)/2 independent GEMM tasks — no driver
    materialization, no broadcast of the corpus. For corpora where exact
    all-pairs is too hot, ``knn_lsh_indexed`` is the approximate path.

    Rounding convention matches the rest of the catalogue: cosine is
    computed in float64, rounded to 6dp, and BOTH the filter and the
    emitted ``sim6`` use the rounded value (oracle-stable).
    """
    import pandas as pd

    P = int(num_blocks)

    def replicate(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        mat = _matrix_of(batch, vec_col)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "__pk": pa.array([], pa.int64()),
                    "__blk": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    vec_col: pa.array([], pa.list_(pa.float64())),
                }
            )
        blk = ids % P
        # one replica per unordered pair (min(p,q), max(p,q)), q = 0..P-1
        reps_pk, reps_i = [], []
        for q in range(P):
            i, j = np.minimum(blk, q), np.maximum(blk, q)
            reps_pk.append(i * P + j)
            reps_i.append(np.arange(n))
        pk = np.concatenate(reps_pk)
        idx = np.concatenate(reps_i)
        rep = np.ascontiguousarray(mat[idx])
        vecs = pa.FixedSizeListArray.from_arrays(
            pa.array(rep.ravel(), pa.float64()), rep.shape[1]
        )
        return pa.table(
            {
                "__pk": pa.array(pk, pa.int64()),
                "__blk": pa.array(blk[idx], pa.int64()),
                id_col: pa.array(ids[idx], pa.int64()),
                vec_col: vecs,
            }
        )

    def gemm_pair(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):
            return pd.DataFrame({"id_a": [], "id_b": [], "sim6": []})
        pk = int(group["__pk"].iloc[0])
        bi, bj = divmod(pk, P)
        g = group.drop_duplicates(id_col)
        ids = g[id_col].to_numpy(dtype=np.int64)
        mat = _normalize(np.stack(g[vec_col].to_numpy()))
        if bi == bj:
            sims = np.round(mat @ mat.T, 6)
            ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
            id_a, id_b = ids[ia], ids[ib]
            s = sims[ia, ib]
        else:
            li = (ids % P) == bi
            ids_i, ids_j = ids[li], ids[~li]
            sims = np.round(mat[li] @ mat[~li].T, 6)
            ia, ib = np.nonzero(sims >= threshold)
            id_a, id_b = ids_i[ia], ids_j[ib]
            s = sims[ia, ib]
        lo, hi = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim6": s})

    from cartography_ray.runtime import drop_empty_blocks

    # exactly P(P+1)/2 groups — size the shuffle to the group count
    tagged = ds.map_batches(replicate, batch_format="pyarrow")
    n_groups = P * (P + 1) // 2
    return drop_empty_blocks(
        tagged.groupby("__pk", num_partitions=max(1, min(n_groups, 64))).map_groups(
            gemm_pair, batch_format="pandas"
        )
    )


# --------------------------------------------------------------------------
# IVF (inverted-file / k-means-partitioned) ANN — the second scale path
# --------------------------------------------------------------------------


def _hashmin_sample(ds, n: int, id_col: str, vec_col: str):
    """Deterministic n-row sample independent of block order: the rows
    whose md5-style id hash is smallest. Per-batch local winners (n rows
    each) stream to a driver merge that never holds more than ~n × blocks
    candidate rows — a seed-selection pass, not a data gather."""
    import pandas as pd

    def local(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return batch
        h = pd.util.hash_array(ids, categorize=False)
        keep = np.argsort(h, kind="stable")[:n]
        return batch.take(pa.array(np.sort(keep)))

    winners = []
    for b in ds.map_batches(local, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        if b.num_rows:
            winners.append(b)
    if not winners:
        return np.zeros((0, 0)), np.array([], dtype=np.int64)
    all_w = pa.concat_tables(winners)
    ids = pc.cast(all_w.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
    import pandas as pd

    h = pd.util.hash_array(ids, categorize=False)
    order = np.argsort(h, kind="stable")[:n]
    mat = _matrix_of(all_w, vec_col)
    return mat[order], ids[order]


def train_kmeans_ivf(
    ds,
    n_centroids: int,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed Lloyd iterations over normalized vectors (spherical
    k-means — cosine assignment is then a GEMM argmax).

    Each iteration is one streaming pass: per-batch assignment against
    the broadcast centroids plus per-batch partial (sum, count) rows per
    centroid — mergeable by addition, folded on the driver
    (centroid-count-bounded, like bounded_groupby_agg). NOT
    bit-deterministic across block orders (float sums commute only
    approximately); callers needing exact reproducibility should persist
    the index, which is what build_ivf_index does.
    """
    import ray

    cent, _ = _hashmin_sample(ds, n_centroids, id_col, vec_col)
    if cent.size == 0:
        return cent
    cent = _normalize(cent)
    kc = cent.shape[0]

    for _ in range(iters):
        c_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            mat = _normalize(_matrix_of(batch, vec_col))
            c = ray.get(c_ref)
            if mat.size == 0:
                return pa.table(
                    {
                        "cid": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            assign = np.argmax(mat @ c.T, axis=1)
            cids = np.unique(assign)
            sums = np.zeros((len(cids), mat.shape[1]))
            cnts = np.zeros(len(cids), dtype=np.int64)
            for i, cid in enumerate(cids):
                sel = assign == cid
                sums[i] = mat[sel].sum(axis=0)
                cnts[i] = int(sel.sum())
            return pa.table(
                {
                    "cid": pa.array(cids.astype(np.int64), pa.int64()),
                    "cnt": pa.array(cnts, pa.int64()),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.ravel(), pa.float64()), sums.shape[1]
                    ),
                }
            )

        acc_sum = np.zeros_like(cent)
        acc_cnt = np.zeros(kc, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            if not b.num_rows:
                continue
            cids = b.column("cid").to_numpy(zero_copy_only=False)
            cnts = b.column("cnt").to_numpy(zero_copy_only=False)
            vs = _matrix_of(b, "vsum")
            acc_sum[cids] += vs
            acc_cnt[cids] += cnts
        nonempty = acc_cnt > 0
        cent = cent.copy()
        cent[nonempty] = _normalize(acc_sum[nonempty] / acc_cnt[nonempty, None])
    return cent


def build_ivf_index(
    ds,
    index_dir: str,
    n_centroids: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    input_fingerprint: str | None = None,
) -> str:
    """Write the corpus ONCE partitioned by nearest-centroid list (one
    Hive directory per inverted list) — the IVF counterpart of
    build_lsh_index: queries read only the nprobe closest lists.
    ``meta.json`` persists the trained centroids (so query-side
    assignment is exact and stable) plus dim and the input fingerprint
    for staleness detection."""
    import json
    import os

    import ray

    cent = train_kmeans_ivf(ds, n_centroids, iters=iters, id_col=id_col, vec_col=vec_col)
    os.makedirs(index_dir, exist_ok=True)
    if cent.size == 0:
        with open(os.path.join(index_dir, "meta.json"), "w") as f:
            json.dump(
                {"dim": 0, "centroids": [], "input_fingerprint": input_fingerprint}, f
            )
        return index_dir
    c_ref = ray.put(cent)

    def tag(batch: pa.Table) -> pa.Table:
        mat = _normalize(_matrix_of(batch, vec_col))
        if mat.size == 0:
            return batch.append_column("ivf_list", pa.array([], pa.int64()))
        assign = np.argmax(mat @ ray.get(c_ref).T, axis=1)
        return batch.append_column(
            "ivf_list", pa.array(assign.astype(np.int64), pa.int64())
        )

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["ivf_list"]
    )
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "dim": int(cent.shape[1]),
                "centroids": cent.tolist(),
                "input_fingerprint": input_fingerprint,
            },
            f,
        )
    return index_dir


def knn_ivf_indexed(
    index_dir: str,
    queries: dict[int, np.ndarray],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Approximate top-k over a ``build_ivf_index`` directory: each query
    probes its ``nprobe`` closest centroids and only those inverted-list
    partitions are READ; the candidate subset then goes through the
    exact ``knn_brute`` kernel (same output schema / determinism rules).

    Returns (result_dataset, stats) with stats = {"partitions_read",
    "partitions_total", "rows_scanned"}.
    """
    import glob as _glob
    import json
    import os

    import ray.data

    meta = json.load(open(os.path.join(index_dir, "meta.json")))
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "sim6": pa.array([], pa.float64()),
        }
    )
    if int(meta["dim"]) == 0:
        return ray.data.from_arrow(empty), {
            "partitions_read": 0, "partitions_total": 0, "rows_scanned": 0,
        }
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    qids = sorted(queries)
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    sims = qmat @ cent.T
    nearest = np.argsort(-sims, axis=1, kind="stable")[:, : int(nprobe)]
    probe = set(int(c) for c in np.unique(nearest))
    all_parts = sorted(_glob.glob(os.path.join(index_dir, "ivf_list=*")))
    hit_dirs = [
        d for d in all_parts if int(os.path.basename(d).split("=", 1)[1]) in probe
    ]
    stats = {"partitions_read": len(hit_dirs), "partitions_total": len(all_parts)}
    if not hit_dirs:
        stats["rows_scanned"] = 0
        return ray.data.from_arrow(empty), stats
    hit_files = sorted(
        f for d in hit_dirs for f in _glob.glob(os.path.join(d, "*.parquet"))
    )
    sub = ray.data.read_parquet(hit_files, columns=[id_col, vec_col])
    stats["rows_scanned"] = _parquet_row_count(hit_files)
    return knn_brute(sub, queries, k=k, id_col=id_col, vec_col=vec_col), stats


def pca_fit(ds, vec_col: str = "embedding", k: int = 8):
    """Distributed PCA fit over an embedding column: per-batch moment
    partials (count, Σx, X·Xᵀ-sum as ONE float64 GEMM per batch) → a
    block-count-sized collect → d×d covariance eigendecomposition on the
    driver (d is the embedding width — driver work is O(d²) memory and
    O(d³) flops regardless of corpus size; the corpus streams once and
    never gathers).

    Returns ``(mean, components)``: ``mean`` shape (d,), ``components``
    shape (d, k) — top-k eigenvectors of the population covariance,
    eigenvalue-descending, each sign-fixed so its largest-|entry| is
    positive (deterministic across block orders and engines).
    """
    import ray.data  # noqa: F401  (ds is already a Dataset)

    def partial(batch: pa.Table) -> pa.Table:
        x = _matrix_of(batch, vec_col)
        if x.size == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64())),
                    "ss": pa.array([], pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "ss": pa.array([(x.T @ x).ravel().tolist()], pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        raise ValueError("pca_fit: empty input")
    n = int(parts["n"].sum())
    s = np.sum(np.stack([np.asarray(v) for v in parts["s"]]), axis=0)
    ss = np.sum(np.stack([np.asarray(v) for v in parts["ss"]]), axis=0)
    d = s.shape[0]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    # sign convention: the largest-|entry| of each component is positive
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return mean, comps * flip


def pca_project(ds, mean: np.ndarray, components: np.ndarray,
                vec_col: str = "embedding", id_col: str = "vec_id",
                out_col: str = "pca"):
    """Project every embedding onto fitted PCA components: one float64
    GEMM per batch against the broadcast (d×k) basis — shuffle-free,
    stateless, streaming. Output: ``(id_col, out_col)`` with ``out_col``
    a list<double> of length k."""
    import ray

    basis_ref = ray.put((np.asarray(mean), np.asarray(components)))

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        mu, comps = _ray.get(basis_ref)
        x = _matrix_of(batch, vec_col)
        proj = (x - mu) @ comps if x.size else np.zeros((0, comps.shape[1]))
        return pa.table(
            {
                id_col: batch.column(id_col),
                out_col: pa.array(
                    [row.tolist() for row in proj], pa.list_(pa.float64())
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id",
                  vec_col: str = "embedding", out_col: str = "cluster_id"):
    """Assign every vector to its nearest (cosine) centroid — the
    labeling half of distributed clustering (semantic bucketing for
    curation / per-cluster sampling). Centroids are broadcast once via
    ``ray.put``; each batch is one normalize + GEMM + argmax, so the
    corpus streams and nothing vector-sized leaves the workers.
    Output: ``(id_col, out_col)`` int64 cluster ids in centroid order.
    """
    import ray

    c_ref = ray.put(_normalize(np.asarray(centroids, dtype="float64")))

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(c_ref)
        mat = _normalize(_matrix_of(batch, vec_col))
        assign = (
            np.argmax(mat @ c.T, axis=1).astype("int64")
            if mat.size
            else np.zeros(0, dtype="int64")
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                out_col: pa.array(assign, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------- product
# quantization (the IVFPQ-style vector-compression scale path: m uint8
# codes per vector instead of dim float32s — 32-64x memory, ADC scan)


def train_pq_codebooks(
    ds,
    m: int = 8,
    k: int = 256,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Train product-quantization codebooks: split each NORMALIZED
    vector into ``m`` contiguous subspaces and k-means each subspace
    (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    Search" — public method). All m subspaces train in the SAME
    streaming pass per Lloyd iteration: per-batch (sub, code) partial
    sums folded driver-side, bounded by m × k × dsub floats — never the
    corpus. Returns float64 codebooks of shape (m, k_eff, dsub).

    Cosine works out exactly: for normalized q and x, q·x =
    Σ_sub q_sub·x_sub, so ADC with per-subspace dot-product lookup
    tables decomposes the true dot product — the ONLY approximation is
    snapping x_sub to its nearest codeword.
    """
    import ray

    # codes are uint8 by contract (pq_encode) — k beyond 256 would wrap
    # silently and encode every high codeword as the wrong one (a
    # correctness guard, so a raise rather than an assert)
    if not 1 <= k <= 256:
        raise ValueError(f"PQ codebook size k={k} must be in [1, 256] (uint8 codes)")
    seed_mat, _ = _hashmin_sample(ds, k, id_col, vec_col)
    if seed_mat.size == 0:
        return np.zeros((m, 0, 0))
    seed_mat = _normalize(seed_mat)
    dim = seed_mat.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    k_eff = min(k, seed_mat.shape[0])
    # (m, k_eff, dsub): subspace s seeded from the sample's slice s
    books = np.stack(
        [seed_mat[:k_eff, s * dsub : (s + 1) * dsub] for s in range(m)]
    )

    for _ in range(iters):
        b_ref = ray.put(books)

        def partial(batch: pa.Table) -> pa.Table:
            mat = _normalize(_matrix_of(batch, vec_col))
            bk = ray.get(b_ref)
            if mat.size == 0:
                return pa.table(
                    {
                        "sub": pa.array([], pa.int64()),
                        "code": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            subs, codes, cnts, sums = [], [], [], []
            for s in range(m):
                x = mat[:, s * dsub : (s + 1) * dsub]
                # nearest codeword by euclidean == argmax dot - ||c||²/2
                d = x @ bk[s].T - 0.5 * (bk[s] ** 2).sum(axis=1)[None, :]
                assign = np.argmax(d, axis=1)
                cids = np.unique(assign)
                for cid in cids:
                    sel = assign == cid
                    subs.append(s)
                    codes.append(int(cid))
                    cnts.append(int(sel.sum()))
                    sums.append(x[sel].sum(axis=0))
            sm = np.asarray(sums)
            return pa.table(
                {
                    "sub": pa.array(np.asarray(subs, np.int64), pa.int64()),
                    "code": pa.array(np.asarray(codes, np.int64), pa.int64()),
                    "cnt": pa.array(np.asarray(cnts, np.int64), pa.int64()),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sm.ravel(), pa.float64()), dsub
                    ),
                }
            )

        acc_sum = np.zeros((m, k_eff, dsub))
        acc_cnt = np.zeros((m, k_eff), dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            if not b.num_rows:
                continue
            su = b.column("sub").to_numpy(zero_copy_only=False)
            co = b.column("code").to_numpy(zero_copy_only=False)
            cn = b.column("cnt").to_numpy(zero_copy_only=False)
            vs = _matrix_of(b, "vsum")
            np.add.at(acc_sum, (su, co), vs)
            np.add.at(acc_cnt, (su, co), cn)
        nonzero = acc_cnt > 0
        books = books.copy()
        books[nonzero] = acc_sum[nonzero] / acc_cnt[nonzero][:, None]
    return books


def pq_encode(ds, codebooks, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Encode each vector as m uint8 codes (nearest codeword per
    subspace of the normalized vector) — a stateless per-batch map; the
    code table is what a 100-TB corpus persists (m bytes/vector)."""
    import ray

    m, k_eff, dsub = codebooks.shape
    b_ref = ray.put(codebooks)

    def fn(batch: pa.Table) -> pa.Table:
        mat = _normalize(_matrix_of(batch, vec_col))
        bk = ray.get(b_ref)
        n = mat.shape[0]
        codes = np.zeros((n, m), dtype=np.uint8)
        for s in range(m):
            x = mat[:, s * dsub : (s + 1) * dsub]
            d = x @ bk[s].T - 0.5 * (bk[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = np.argmax(d, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.uint8()), m
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def knn_pq(
    codes_ds,
    codebooks,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
):
    """Asymmetric-distance (ADC) top-k over a PQ-coded corpus: the query
    stays FULL precision; per-subspace dot-product lookup tables (m × k_eff
    floats, broadcast once) turn each candidate's similarity into m table
    lookups + a sum — no decode, no float vectors in flight. Per-batch
    top-k partials → driver merge (corpus never driver-resident), the
    knn_brute pattern. Returns (rank, vec_id, sim6) rows; approximate by
    design (codeword snapping), recall-tested against exact brute force.
    """
    import ray

    m, k_eff, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-300)
    # LUT[s, c] = q_sub(s) · codebook[s, c]
    lut = np.stack(
        [q[s * dsub : (s + 1) * dsub] @ codebooks[s].T for s in range(m)]
    )
    lut_ref = ray.put(lut)

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        codes = _matrix_of(batch, "code").astype(np.int64)
        lt = ray.get(lut_ref)
        if not len(ids):
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sim6": pa.array([], pa.float64())}
            )
        sims = np.zeros(len(ids))
        for s in range(m):
            sims += lt[s, codes[:, s]]
        sims = np.round(sims, 6)
        order = np.lexsort((ids, -sims))[: min(k, len(ids))]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "sim6": pa.array(sims[order], pa.float64()),
            }
        )

    cand = codes_ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim6": pa.array([], pa.float64()),
            }
        )
    top = (
        cand.sort_values(["sim6", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64), pa.int64()),
            "vec_id": pa.array(top[id_col].to_numpy(np.int64), pa.int64()),
            "sim6": pa.array(top["sim6"].to_numpy(np.float64), pa.float64()),
        }
    )
