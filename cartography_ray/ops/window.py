"""Windowed operators over ordered partitions: gap sessionization and
per-group top-k (rank).

Ray Data has no window functions; both operators are realized as the
custom-operator composition the scale brief prescribes: an optional
per-batch combiner → ONE hash shuffle on the partition key → a
vectorized per-bucket kernel (pandas sort + numpy cumsum / cumcount, no
per-row Python).

Partitioning assumption (documented per the brief): all rows of one
partition key (a user, a customer) land in one shuffle bucket, so a
single key's row volume must fit one reducer. That holds for
activity-bounded keys; a corpus-sized key would need salting plus a
boundary-merge pass, which these operators do not implement.

- ``sessionize`` shuffles the full event stream once (inherent — session
  boundaries need every row of a key), then splits each key's timeline
  where the gap to the previous event exceeds ``gap_us``.
- ``grouped_topk`` prunes FIRST: each input batch keeps at most k rows
  per group, so the shuffle moves O(k × groups-per-batch) rows, not the
  fact table. The final kernel re-ranks the surviving candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cartography_ray.ops.agg import _to_clean_arrow


def _with_bucket(df: pd.DataFrame, keys: list[str], num_buckets: int) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    df = df.copy()
    df["__gb"] = (h % num_buckets).astype("int64")
    return df


def sessionize(
    ds,
    key: str,
    ts_col: str,
    gap_us: int,
    order_cols: list[str] | None = None,
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Gap-based sessionization: one output row per (key, session).

    Output columns: ``key``, ``session_seq`` (1-based per key),
    ``n_events``, ``session_start_us``, ``session_end_us`` (epoch
    microseconds — int64 on purpose, so oracle value-hashes are
    dtype-stable). ``order_cols`` breaks timestamp ties deterministically
    (pass a unique id column).
    """
    order_cols = list(order_cols or [])

    def tag(batch: pd.DataFrame) -> "pd.DataFrame":
        return _to_clean_arrow(_with_bucket(batch, [key], num_buckets))

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = group.sort_values([key, ts_col, *order_cols], kind="mergesort")
        ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        keys_np = pdf[key].to_numpy()
        new_key = np.empty(len(pdf), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys_np[1:] != keys_np[:-1]
        gap_break = np.empty(len(pdf), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        new_session = new_key | gap_break
        # global cumsum, then rebase each key to 1 at its first row
        seq = np.cumsum(new_session)
        key_start = np.flatnonzero(new_key)
        base = np.repeat(seq[key_start] - 1, np.diff(np.append(key_start, len(pdf))))
        pdf = pd.DataFrame(
            {key: keys_np, "session_seq": seq - base, "__ts_us": ts_us}
        )
        g = pdf.groupby([key, "session_seq"], sort=False)
        out = pd.DataFrame(
            {
                "n_events": g["__ts_us"].size(),
                "session_start_us": g["__ts_us"].min(),
                "session_end_us": g["__ts_us"].max(),
            }
        ).reset_index()
        return _to_clean_arrow(out)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = ds.map_batches(tag, batch_format="pandas")
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def grouped_topk(
    ds,
    group_keys: list[str] | str,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Top-k rows per group with a dense 1-based rank column ``rn``
    (ROW_NUMBER semantics: ordered by ``order_col`` then ``tiebreak``).

    Per-batch combiner first: a batch contributes at most k rows per
    group to the shuffle (the global per-group top-k is a subset of the
    union of per-batch top-ks), so shuffle volume is candidate-sized.
    """
    group_keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)
    tiebreak = list(tiebreak or [])
    sort_cols = group_keys + [order_col] + tiebreak
    ascending = [True] * len(group_keys) + [not descending] + [True] * len(tiebreak)

    def prune(batch: pd.DataFrame) -> "pd.DataFrame":
        s = batch.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        s = s.groupby(group_keys, sort=False).head(k)
        return _to_clean_arrow(_with_bucket(s, group_keys, num_buckets))

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        s = group.drop(columns="__gb").sort_values(
            sort_cols, ascending=ascending, kind="mergesort"
        )
        s = s.groupby(group_keys, sort=False).head(k).copy()
        s["rn"] = s.groupby(group_keys, sort=False).cumcount() + 1
        return _to_clean_arrow(s)

    from cartography_ray.runtime import drop_empty_blocks

    pruned = ds.map_batches(prune, batch_format="pandas")
    return drop_empty_blocks(
        pruned.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def with_lag(
    ds,
    key: str,
    order_cols: list[str],
    cols: list[str],
    lag: int = 1,
    prefix: str = "prev_",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Generic per-partition LAG: append each row's ``lag``-back
    predecessor values of ``cols`` within its ``key`` partition, ordered
    by ``order_cols`` (SQL ``LAG(col, lag) OVER (PARTITION BY key ORDER
    BY order_cols)``). Rows with no predecessor get nulls (lagged
    integer columns therefore come back floaty from pandas — callers
    wanting stable int output should coalesce+cast, as the catalogue
    query does).

    Same shape and partitioning assumption as ``sessionize``: one hash
    shuffle on ``key``, vectorized shift per bucket.
    """

    def tag(batch: pd.DataFrame) -> "pd.DataFrame":
        return _to_clean_arrow(_with_bucket(batch, [key], num_buckets))

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        kn = pdf[key].to_numpy()
        same = np.zeros(len(pdf), dtype=bool)
        same[lag:] = kn[lag:] == kn[:-lag]
        for c in cols:
            pdf[prefix + c] = pdf[c].shift(lag).where(same)
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = ds.map_batches(tag, batch_format="pandas")
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


# multiplier from Knuth's MMIX / Fibonacci hashing — chosen because both
# engines can evaluate it exactly in int64 (SQL: (id*K)%2^32), unlike
# library hash functions which differ between pandas and DuckDB
SAMPLE_MULT = 2654435761
SAMPLE_MOD = 1 << 32


def sample_hash(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic per-id sampling score in [0, 2^32): the SQL twin is
    ``((id + salt) * 2654435761) % 4294967296``."""
    return ((ids.astype(np.int64) + salt) * SAMPLE_MULT) % SAMPLE_MOD


def deterministic_sample(ds, id_col: str, rate: float, salt: int = 0):
    """Bernoulli-by-hash sample: keeps rows whose sampling score falls
    below ``rate`` — deterministic, order-independent, reproducible in
    SQL (no RNG state, so resumed/retried tasks keep identical rows).
    Pure per-batch filter: no shuffle, no coordination."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cut = int(rate * SAMPLE_MOD)

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(sample_hash(ids, salt) < cut))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, group_keys, id_col: str, k: int, salt: int = 0,
                      num_buckets: int = 64, num_partitions: int | None = None):
    """Exactly-k-per-group deterministic sample: rank rows within each
    group by their sampling score and keep the k smallest — a
    ``grouped_topk`` composition, so the per-batch combiner bounds
    shuffle volume to k rows per group per block."""
    import pyarrow as pa

    def score(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column("__score", pa.array(sample_hash(ids, salt), pa.int64()))

    scored = ds.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored, group_keys, "__score", k=k, descending=False, tiebreak=[id_col],
        num_buckets=num_buckets, num_partitions=num_partitions,
    )
