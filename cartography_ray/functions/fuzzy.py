"""Fuzzy string self-join: all pairs within a Levenshtein edit-distance
bound — the record-linkage / entity-blocking primitive (near-identical
names, typo'd identifiers, OCR variants).

Design (Ray-Data-first, no reference analogue — the reference's fuzzy
matcher is a Neo4j ``CONTAINS`` clause, `cartography/graph/querybuilder.py`'s
fuzzy_and_ignore_case matcher; this is the distributed generalization):

1. **Blocking — symmetric deletes (SymSpell).** Every string emits its
   ≤``max_dist``-deletion neighborhood (all subsequences obtained by
   deleting up to d characters). If ``lev(a, b) <= d`` then some common
   subsequence is reachable from BOTH with ≤d deletions (delete each
   string's edited characters), so the candidate set is COMPLETE: every
   true pair shares at least one variant bucket. Variant generation is
   vectorized (one pandas ``str.slice`` concat per delete position, no
   per-row Python); postings carry ``hash(variant)`` — 8 bytes — plus the
   id and the original string, never the variant text, so the exchange is
   O(rows × neighborhood) skinny rows. Hash collisions between different
   variants only ADD candidates (removed by the exact verify), never drop
   them.
2. **ONE posting shuffle** on ``hash(variant) % num_buckets``; each
   bucket self-merges its variant groups into candidate pairs
   (``a_id < b_id``), pre-deduped bucket-locally.
3. **Vectorized exact verify**: a banded Levenshtein DP (band width
   ``2·max_dist+1``) computed SIMULTANEOUSLY across all candidate pairs
   of a batch — numpy ops over (pairs × band) arrays, L×(2d+1) vector
   steps total, no per-pair Python loop. Distances saturate at d+1.
4. A final pair-keyed dedup shuffle over the (tiny) verified-pair set —
   a pair found via several shared variants lands once.

Scale: the exchange is bounded by rows × neighborhood size (L+1 variants
at d=1, O(L²/2) at d=2); a variant shared by k strings costs k²/2
candidate rows in its bucket — ubiquitous variants (deletions of very
common short tokens) can be capped with ``df_cap`` at the price of
completeness for those variants only (every surviving pair is still
exact-verified). 100-TB posture: postings hash-partition, nothing is
driver-resident, and the verify is embarrassingly parallel.

Intended domain: names / tokens / identifiers (tens of characters).
Postings carry the original string alongside the 8-byte variant hash so
buckets verify locally without a fetch join — for long strings that
payload multiplies by the neighborhood size; at document scale, swap
the payload for the id and bloom-semi-join the text back (the
``span_dedup`` ``payload="hash"`` pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cartography_ray.ops.agg import _to_clean_arrow


def _codepoints(strings, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Encode strings to a padded (n, max_len) uint32 codepoint matrix +
    length vector. Codepoint-exact (UTF-32), matching DuckDB's
    per-character ``levenshtein``."""
    n = len(strings)
    out = np.zeros((n, max_len), dtype="<u4")
    lens = np.empty(n, dtype="int64")
    for i, s in enumerate(strings):
        cp = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
        lens[i] = len(cp)
        out[i, : len(cp)] = cp[:max_len]
    return out, lens


def levenshtein_banded(a_strs, b_strs, max_dist: int) -> np.ndarray:
    """Exact Levenshtein distance per pair, saturated at ``max_dist + 1``.

    Banded DP: only cells with ``|i - j| <= max_dist`` can stay ≤
    max_dist, so each DP row is ``2·max_dist+1`` cells; every cell update
    is one numpy op across ALL pairs. Cost: max_len × (2d+1) vector ops,
    independent of pair count (which only widens the vectors).
    """
    d = int(max_dist)
    inf = d + 1
    n = len(a_strs)
    if n == 0:
        return np.empty(0, dtype="int64")
    la_max = max((len(s) for s in a_strs), default=0)
    lb_max = max((len(s) for s in b_strs), default=0)
    A, la = _codepoints(a_strs, max(la_max, 1))
    B, lb = _codepoints(b_strs, max(lb_max, 1))
    ans = np.full(n, inf, dtype="int64")
    # |len difference| > d can never verify; also resolves i-loop bounds
    feasible = np.abs(la - lb) <= d
    ans[(la == 0) & feasible] = np.minimum(lb, inf)[(la == 0) & feasible]

    width = 2 * d + 1
    row = np.full((n, width), inf, dtype="int64")
    for o in range(width):
        j = o - d
        if 0 <= j:
            row[:, o] = np.where(j <= lb, min(j, inf), inf)
    i_max = int(la.max(initial=0))
    for i in range(1, i_max + 1):
        cur = np.full((n, width), inf, dtype="int64")
        for o in range(width):
            j = i + o - d
            if j < 0:
                continue
            if j == 0:
                cur[:, o] = min(i, inf)
                continue
            best = np.full(n, inf, dtype="int64")
            if o + 1 < width:
                best = np.minimum(best, row[:, o + 1] + 1)  # delete from a
            if o - 1 >= 0:
                best = np.minimum(best, cur[:, o - 1] + 1)  # insert into a
            jb = min(j - 1, B.shape[1] - 1)
            sub = row[:, o] + (A[:, i - 1] != B[:, jb]).astype("int64")
            best = np.minimum(best, sub)
            cur[:, o] = np.minimum(best, inf)
            cur[j > lb, o] = inf
        row = cur
        done = feasible & (la == i)
        if done.any():
            o_fin = lb[done] - i + d
            ans[done] = row[done, o_fin]
    return np.minimum(ans, inf)


def _delete_variants(strs: pd.Series, max_dist: int) -> pd.DataFrame:
    """All ≤max_dist-deletion subsequences per row, vectorized: one
    pandas str.slice concat per (level, position). Returns columns
    ``__row`` (positional index into strs) and ``v`` (variant),
    de-duplicated per row."""
    base = pd.DataFrame({"__row": np.arange(len(strs), dtype="int64"), "v": strs.to_numpy()})
    frames = [base]
    frontier = base
    for _ in range(max_dist):
        lens = frontier["v"].str.len()
        lmax = int(lens.max()) if len(lens) else 0
        outs = []
        for j in range(lmax):
            sub = frontier[lens > j]
            if not len(sub):
                break
            outs.append(
                pd.DataFrame(
                    {
                        "__row": sub["__row"].to_numpy(),
                        "v": (sub["v"].str.slice(0, j) + sub["v"].str.slice(j + 1)).to_numpy(),
                    }
                )
            )
        if not outs:
            break
        frontier = pd.concat(outs, ignore_index=True).drop_duplicates()
        frames.append(frontier)
    return pd.concat(frames, ignore_index=True).drop_duplicates()


def edit_distance_pairs(
    ds,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    num_buckets: int = 64,
    num_partitions: int | None = None,
    df_cap: int | None = None,
):
    """All pairs ``(a_id, b_id, dist)`` with ``a_id < b_id`` and
    ``levenshtein(a, b) <= max_dist`` — see the module docstring for the
    blocking/verify plan. ``df_cap``: optionally drop variant groups
    larger than the cap (completeness trade documented above)."""

    def postings(batch: pd.DataFrame) -> pa.Table:
        # null strings can never satisfy lev <= d (SQL semantics: NULL
        # yields NULL, no pair) — drop them up front, and use ONE str
        # cast for both blocking and the ridden-along verify payload so
        # the two stages always see the same representation
        batch = batch[batch[str_col].notna()].reset_index(drop=True)
        strs = batch[str_col].astype(str)
        vf = _delete_variants(strs, max_dist)
        out = pd.DataFrame(
            {
                "__id": batch[id_col].to_numpy()[vf["__row"].to_numpy()],
                "__s": strs.to_numpy()[vf["__row"].to_numpy()],
                "__vh": pd.util.hash_pandas_object(vf["v"], index=False)
                .to_numpy()
                .astype("int64"),
            }
        )
        out["__gb"] = (out["__vh"] % num_buckets).astype("int64")
        return _to_clean_arrow(out)

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        g = group[["__vh", "__id", "__s"]].drop_duplicates(["__vh", "__id"])
        if df_cap is not None:
            sizes = g.groupby("__vh", sort=False)["__id"].transform("size")
            g = g[sizes <= df_cap]
        m = g.merge(g, on="__vh", suffixes=("_a", "_b"))
        m = m[m["__id_a"] < m["__id_b"]]
        pairs = m.drop_duplicates(["__id_a", "__id_b"])
        if not len(pairs):
            return pa.table(
                {
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        dist = levenshtein_banded(
            pairs["__s_a"].tolist(), pairs["__s_b"].tolist(), max_dist
        )
        keep = dist <= max_dist
        return pa.table(
            {
                "a_id": pa.array(pairs["__id_a"].to_numpy()[keep], pa.int64()),
                "b_id": pa.array(pairs["__id_b"].to_numpy()[keep], pa.int64()),
                "dist": pa.array(dist[keep], pa.int64()),
            }
        )

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.runtime import drop_empty_blocks, known_input_bytes

    posted = ds.map_batches(postings, batch_format="pandas")
    # adaptive local fold: bucket_pairs merges on the REAL variant hash
    # (__gb is placement only), so a measured-small posting table can
    # block+verify in one task. The barrier is only paid when the INPUT
    # size is known AND comfortably under the guard (deletion variants
    # amplify ~|s|× for dist 1, hence the /8 headroom); unknown-size or
    # large inputs keep the barrier-free streaming shuffle. The guards
    # are TIGHTER than the joins' defaults because the kernel is a
    # self-join verify (cost superlinear in group size): at sf0.1 the
    # default guard serialized a 285k-posting Levenshtein verify in one
    # task and read 5.6 → 7.2 s — the shuffle wins there.
    candidates = None
    from cartography_ray.ops.joins import (
        LOCAL_MERGE_BYTE_LIMIT,
        _local_or_shuffle,
        _nonempty_refs,
    )

    in_bytes = known_input_bytes(ds)
    if in_bytes is not None and in_bytes <= LOCAL_MERGE_BYTE_LIMIT // 8:
        refs, n_rows, n_bytes = _nonempty_refs(posted)
        if refs:
            candidates = drop_empty_blocks(
                _local_or_shuffle(
                    refs, n_rows, n_bytes, bucket_pairs, num_partitions,
                    batch_format="pandas", group_key="__gb",
                    row_limit=65_536, byte_limit=LOCAL_MERGE_BYTE_LIMIT // 8,
                )
            )
    if candidates is None:
        candidates = drop_empty_blocks(
            posted.groupby("__gb", num_partitions=num_partitions).map_groups(
                bucket_pairs, batch_format="pandas"
            )
        )
    # a pair can verify in several variant buckets — final pair-keyed
    # dedup over the (true-pair-sized) survivor set
    return partial_groupby_agg(
        candidates,
        ["a_id", "b_id"],
        {"dist": ("dist", "min")},
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [("a_id", pa.int64()), ("b_id", pa.int64()), ("dist", pa.int64())]
        ),
    )
