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

    merged = drop_empty_blocks(
        cand.groupby("query_id").map_groups(merge, batch_format="pandas")
    )
    return merged


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

    return drop_empty_blocks(cand.groupby("query_id").map_groups(merge, batch_format="pandas"))
