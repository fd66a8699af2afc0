"""Aggregation helpers: partial (combiner) pre-aggregation and top-k.

A bare ``groupby(key).aggregate(...)`` shuffles every row; hot keys (the
north rule's skew case) make one reducer the straggler. ``partial_groupby_agg``
pre-aggregates inside ``map_batches`` — a hot key contributes ONE row per
input block to the shuffle instead of millions — then runs the small final
groupby. This is the two-phase partial/final pattern SURVEY §4 calls out
as explicit design (the reference is single-writer and never needed it).

``topk`` computes a global top-k without a global sort: per-block top-k
(cheap, parallel) → tiny final sort+limit.
"""

from __future__ import annotations

import pandas as pd


_AGG_FINAL = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def partial_groupby_agg(
    ds, keys: list[str] | str, aggs: dict[str, tuple[str, str]], num_buckets: int = 64
):
    """Two-phase grouped aggregation.

    ``aggs``: out_col → (in_col, fn) with fn ∈ {sum, count, min, max}.
    mean is expressible as sum+count followed by a division in the caller.
    Returns a Dataset with columns keys + list(aggs).

    The final phase shuffles on ``hash(keys) % num_buckets`` and runs ONE
    vectorized pandas aggregation per partition — NOT a per-group
    groupby: Ray 2.49's per-key ``aggregate`` pays per-group overhead at
    high key cardinality (measured 2.2× slower on a 95k-group hourly
    rollup). All rows of one key land in one bucket, so results are
    exact; the partial phase has already collapsed hot keys to one row
    per input block.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                cols[out] = g[col if col else keys[0]].size()
            else:
                cols[out] = getattr(g[col], fn)()
        out_df = pd.DataFrame(cols).reset_index()
        h = pd.util.hash_pandas_object(out_df[keys], index=False).to_numpy()
        out_df["__gb"] = (h % num_buckets).astype("int64")
        return out_df

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (_, fn) in aggs.items():
            cols[out] = getattr(g[out], _AGG_FINAL[fn])()
        return pd.DataFrame(cols).reset_index()

    from cartography_ray.runtime import drop_empty_blocks

    partials = drop_empty_blocks(ds.map_batches(partial, batch_format="pandas"))
    return drop_empty_blocks(
        partials.groupby("__gb").map_groups(final, batch_format="pandas")
    )


def topk(ds, by: str, k: int, descending: bool = True):
    """Global top-k: per-block prune then a k-sized final sort (no global
    shuffle of the full dataset)."""

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nlargest(k, by) if descending else batch.nsmallest(k, by)

    pruned = ds.map_batches(local, batch_format="pandas")
    return pruned.sort(by, descending=descending).limit(k)
