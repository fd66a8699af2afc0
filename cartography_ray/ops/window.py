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
activity-bounded keys. For keys that are NOT activity-bounded (a bot
user with corpus-scale events), ``sessionize`` implements the hot-key
fallback: pass ``chunk_us`` to split every key's timeline into fixed
time ranges that shuffle independently (key × chunk), sessionize each
range locally, then merge boundary sessions in a second, session-sized
pass — no reducer ever holds more than one (key, time-chunk) of events.
``asof_join``/``range_join`` accept the same ``chunk_us`` fallback
(ops/joins.py: bounded-lookback replication or a carry-in second pass).
``grouped_topk``/``with_lag`` keep the documented bounded-key
assumption: their per-batch combiners already cap a hot key's shuffle
contribution at k (or one) row per block, so the reducer holds
candidates, not the key's raw rows.

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


def _with_bucket_arrow(t, keys: list[str], num_buckets: int):
    """Arrow-native twin of ``_with_bucket`` for the placement-only tag
    stages: hashes ONLY the key columns (the pandas conversion is
    limited to them — payload columns never pay an Arrow→pandas→Arrow
    round-trip) and appends ``__gb`` to the zero-copy Arrow batch. The
    grouped kernels key on the REAL columns, so ``__gb`` only controls
    placement; schema metadata is stripped to keep block schemas
    hashable (ops.agg._to_clean_arrow's rationale)."""
    import pyarrow as pa

    h = pd.util.hash_pandas_object(
        t.select(keys).to_pandas(), index=False
    ).to_numpy()
    return t.append_column(
        "__gb", pa.array((h % num_buckets).astype("int64"))
    ).replace_schema_metadata(None)


def _bucket_tagged(ds, keys: list[str] | str, num_buckets: int):
    """``ds`` with ``__gb`` appended — the Arrow-native bucket-tag stage
    shared by every windowed operator whose pre-shuffle step is pure
    hash-and-append (the grouped kernels stay pandas, where they earn
    the conversion)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return ds.map_batches(
        lambda t: _with_bucket_arrow(t, keys, num_buckets),
        batch_format="pyarrow",
    )


def _ts_us_np(t, ts_col: str) -> np.ndarray:
    ts = t.column(ts_col).to_numpy(zero_copy_only=False)
    if np.issubdtype(ts.dtype, np.datetime64):
        return ts.astype("datetime64[us]").astype("int64")
    return ts.astype("int64")


def _with_chunk_arrow(t, ts_col: str, chunk_us: int):
    """Append the hot-key time-chunk id (``ts // chunk_us``) in Arrow."""
    import pyarrow as pa

    return t.append_column(
        "__chunk", pa.array(_ts_us_np(t, ts_col) // chunk_us, pa.int64())
    )


def _rebased_seq(new_key: np.ndarray, new_session: np.ndarray) -> np.ndarray:
    """1-based per-key session ids from break masks (vectorized): global
    cumsum, then rebase each key to 1 at its first row."""
    seq = np.cumsum(new_session)
    key_start = np.flatnonzero(new_key)
    base = np.repeat(seq[key_start] - 1, np.diff(np.append(key_start, len(seq))))
    return seq - base


def sessionize(
    ds,
    key: str,
    ts_col: str,
    gap_us: int,
    order_cols: list[str] | None = None,
    num_buckets: int = 64,
    num_partitions: int | None = None,
    chunk_us: int | None = None,
):
    """Gap-based sessionization: one output row per (key, session).

    Output columns: ``key``, ``session_seq`` (1-based per key),
    ``n_events``, ``session_start_us``, ``session_end_us`` (epoch
    microseconds — int64 on purpose, so oracle value-hashes are
    dtype-stable). ``order_cols`` breaks timestamp ties deterministically
    (pass a unique id column).

    ``chunk_us=None`` (default): ONE shuffle on ``key``; assumes one
    key's events fit one reducer. ``chunk_us=<window>``: the hot-key
    fallback — rows shuffle on ``(key, ts // chunk_us)`` so a
    corpus-scale key spreads across reducers; each (key, chunk)
    sessionizes locally, then a second shuffle (SESSION-sized rows, i.e.
    output-sized, never event-sized) merges sessions across chunk
    boundaries where the boundary gap ≤ ``gap_us`` and renumbers
    ``session_seq``. Time chunks are disjoint, so the last event of one
    chunk and the first of the next NONEMPTY chunk are adjacent in the
    key's global timeline — merging on ``next.start − prev.end ≤ gap_us``
    reproduces single-pass semantics exactly (empty middle chunks
    included); both paths are asserted identical in
    tests/test_window.py.
    """
    order_cols = list(order_cols or [])
    part_keys = [key] if chunk_us is None else [key, "__chunk"]

    def tag(t):
        if chunk_us is not None:
            t = _with_chunk_arrow(t, ts_col, chunk_us)
        return _with_bucket_arrow(t, part_keys, num_buckets)

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = group.sort_values([*part_keys, ts_col, *order_cols], kind="mergesort")
        ts_us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        keys_np = pdf[key].to_numpy()
        new_key = np.empty(len(pdf), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys_np[1:] != keys_np[:-1]
        if chunk_us is not None:
            ck = pdf["__chunk"].to_numpy()
            new_key[1:] |= ck[1:] != ck[:-1]
        gap_break = np.empty(len(pdf), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        new_session = new_key | gap_break
        # group on the raw cumsum (unique per session within this bucket —
        # no (key, chunk) collision), rebase to the 1-based per-key seq
        # only at emit (chunked path discards it; pass 2 renumbers)
        sid = np.cumsum(new_session)
        pdf = pd.DataFrame(
            {key: keys_np, "__sid": sid, "__seq": _rebased_seq(new_key, new_session), "__ts_us": ts_us}
        )
        g = pdf.groupby("__sid", sort=False)
        out = pd.DataFrame(
            {
                key: g[key].first(),
                "session_seq": g["__seq"].first(),
                "n_events": g["__ts_us"].size(),
                "session_start_us": g["__ts_us"].min(),
                "session_end_us": g["__ts_us"].max(),
            }
        ).reset_index(drop=True)
        return _to_clean_arrow(out)

    def merge_kernel(group: pd.DataFrame) -> "pd.DataFrame":
        # per-key sessions are time-disjoint with strictly increasing
        # starts, so start-order IS timeline order and next.start −
        # prev.end is the true adjacent-event gap across chunk boundaries
        pdf = group.sort_values([key, "session_start_us"], kind="mergesort")
        kn = pdf[key].to_numpy()
        start = pdf["session_start_us"].to_numpy()
        end = pdf["session_end_us"].to_numpy()
        new_key = np.empty(len(pdf), dtype=bool)
        new_key[0] = True
        new_key[1:] = kn[1:] != kn[:-1]
        brk = np.empty(len(pdf), dtype=bool)
        brk[0] = True
        brk[1:] = (start[1:] - end[:-1]) > gap_us
        merged = pd.DataFrame(
            {
                key: kn,
                "session_seq": _rebased_seq(new_key, new_key | brk),
                "__n": pdf["n_events"].to_numpy(),
                "__s": start,
                "__e": end,
            }
        )
        g = merged.groupby([key, "session_seq"], sort=False)
        out = pd.DataFrame(
            {
                "n_events": g["__n"].sum(),
                "session_start_us": g["__s"].min(),
                "session_end_us": g["__e"].max(),
            }
        ).reset_index()
        return _to_clean_arrow(out)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    local = drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )
    if chunk_us is None:
        return local
    # pass 2: session-summary rows only (output-sized); seq within a
    # (key, chunk) is discarded — merge_kernel renumbers globally per key
    resharded = _bucket_tagged(local, [key], num_buckets)
    return drop_empty_blocks(
        resharded.groupby("__gb", num_partitions=num_partitions).map_groups(
            merge_kernel, batch_format="pandas"
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

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def running_distinct(
    ds,
    key: str,
    order_cols: list[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-key running COUNT(DISTINCT ``distinct_col``) ordered by
    ``order_cols`` — how many distinct values the key has seen up to and
    including each row (the classic breadth-so-far behavioral feature).
    SQL has no windowed COUNT(DISTINCT); the twin is the first-occurrence
    trick (ROW_NUMBER per (key, value) → running SUM of the rn=1 flag),
    and the kernel here is its vectorized mirror: stable sort, pandas
    ``duplicated`` for the first-occurrence flag, grouped cumsum. Exact
    int64 — hash-stable by construction.

    Same shape as ``with_lag``: one hash shuffle on ``key``.
    """

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        first = (~pdf.duplicated([key, distinct_col])).astype("int64")
        pdf[out_col] = first.groupby(pdf[key], sort=False).cumsum()
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def locf(
    ds,
    key: str,
    order_cols: list[str],
    value_col: str,
    observed_col: str | None = None,
    out_col: str = "locf",
    sentinel: int = -1,
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-key last-observation-carried-forward fill ordered by
    ``order_cols`` (SQL ``LAST_VALUE(x IGNORE NULLS) OVER (PARTITION BY
    key ORDER BY ... ROWS UNBOUNDED PRECEDING)``): rows where
    ``observed_col`` is 0/null (or where ``value_col`` itself is null,
    when no observed column is given) inherit the most recent observed
    value; keys with no prior observation get ``sentinel``. Integer
    inputs come back int64 (the nullable-int hash convention); floats
    stay float.

    Same shape as ``with_lag``: one hash shuffle on ``key``, grouped
    C-level ffill per bucket — the densify→carry-forward stage that
    follows ``gap_fill`` in resample pipelines.
    """
    import pandas.api.types as ptypes

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        vals = pdf[value_col].astype("float64")
        if observed_col is not None:
            vals = vals.where(pdf[observed_col].to_numpy() != 0)
        filled = (
            pdf.assign(__locf=vals).groupby(key, sort=False)["__locf"].ffill()
        )
        if ptypes.is_integer_dtype(pdf[value_col].dtype):
            pdf[out_col] = filled.fillna(sentinel).astype("int64")
        else:
            pdf[out_col] = filled
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def interp_fill(
    ds,
    key: str,
    order_col: str,
    value_col: str,
    observed_col: str,
    out_col: str = "interp",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-key linear interpolation over a dense integer axis
    (``order_col``, e.g. the resample slot): observed rows keep their
    value, interior gaps take
    ``pv + (nv - pv) * ((slot - ps) / (ns - ps))`` between the
    bracketing observations, trailing gaps carry the last observation
    forward (LOCF), leading gaps are NaN (the caller's sentinel
    decision). The float expression is evaluated in EXACTLY that
    operation order — int64 differences first, one divide, one multiply,
    one add — so a SQL twin writing the same tree hash-matches
    bit-for-bit (``events_gapfill_interp``).

    Same shape as ``locf``: one hash shuffle on ``key``, vectorized
    ffill/bfill index arithmetic per bucket.
    """

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, order_col], kind="mergesort")
            .reset_index(drop=True)
        )
        obs = pdf[observed_col].to_numpy() != 0
        v = pdf[value_col].to_numpy().astype("int64")
        s = pdf[order_col].to_numpy().astype("int64")
        vm = pd.Series(np.where(obs, v, np.int64(0)), dtype="float64").where(obs)
        sm = pd.Series(np.where(obs, s, np.int64(0)), dtype="float64").where(obs)
        pv = vm.groupby(pdf[key], sort=False).ffill().to_numpy()
        ps = sm.groupby(pdf[key], sort=False).ffill().to_numpy()
        nv = vm.groupby(pdf[key], sort=False).bfill().to_numpy()
        ns = sm.groupby(pdf[key], sort=False).bfill().to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = (s - ps) / (ns - ps)
            interp = pv + (nv - pv) * frac
        out = np.where(obs, v.astype("float64"), interp)
        # trailing gap: no next observation -> carry prev forward
        out = np.where(~obs & np.isnan(nv), pv, out)
        pdf[out_col] = out
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def ewma(
    ds,
    key: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-key exponentially weighted moving average ordered by
    ``order_cols`` — the recursive smoothing y_i = (1-α)·y_{i-1} + α·x_i
    seeded with y_1 = x_1 (pandas ``ewm(adjust=False)`` semantics; the
    kernel IS pandas' C ewm loop, never a Python row loop).

    The recurrence is inherently sequential per key, so the shape is
    the ``with_lag`` contract: one hash shuffle on ``key``, C-level
    kernel per bucket. IEEE note: with dyadic α (0.5, 0.25, …) and
    integer inputs each step is multiply/multiply/add, the same
    expression tree a recursive-CTE SQL twin evaluates, so outputs
    hash-match exactly (the ``events_ewma`` oracle); non-dyadic α still
    matches pandas but an oracle should then compare at a rounding
    tolerance.
    """

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        pdf[out_col] = (
            pdf.groupby(key, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def rolling_sum(
    ds,
    key: str,
    order_cols: list[str],
    value_col: str,
    window_rows: int,
    out_col: str = "roll",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-key bounded-frame rolling sum ordered by ``order_cols`` — SQL
    ``SUM(value) OVER (PARTITION BY key ORDER BY order_cols ROWS BETWEEN
    window_rows-1 PRECEDING AND CURRENT ROW)``. Output: the input
    columns + ``out_col``.

    Exact for integer ``value_col``: computed as the key-local cumsum
    minus the cumsum ``window_rows`` back (both int64), never through
    pandas' float rolling kernel — so the SQL window-function twin
    hash-matches bit-for-bit.

    Same shape and partitioning assumption as ``with_lag``: one hash
    shuffle on ``key``, vectorized kernel per bucket; a corpus-scale hot
    key wants the ``running_sum(chunk_us=...)`` salting pattern, which
    applies unchanged here because the frame is row-bounded (carry-in =
    last ``window_rows`` rows of the previous chunk).
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        cs = pdf.groupby(key, sort=False)[value_col].cumsum().to_numpy()
        kn = pdf[key].to_numpy()
        k = window_rows
        prior = np.zeros(len(pdf), dtype=cs.dtype)
        if len(pdf) > k:
            same = kn[k:] == kn[:-k]
            prior[k:] = np.where(same, cs[:-k], prior[k:])
        pdf[out_col] = cs - prior
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def cohort_retention(ds, key: str, day_col: str,
                     num_buckets: int = 64, num_partitions: int | None = None):
    """Cohort retention matrix: how many ``key``s active on their
    cohort day (first-ever activity day) are still active ``age`` days
    later. Input: rows of ``(key, day_col)`` activity (``day_col`` an
    int64 day index; duplicates fine). Output: ``(cohort_day, age_days,
    users)`` — one row per observed (cohort, age) cell.

    Plan: per-batch distinct combiner (activity collapses to ≤ one row
    per (key, day) per batch before the exchange) → ONE key-hash
    shuffle → per-bucket kernel (exact distinct, cohort = per-key min
    day, age = day − cohort) → count partials over the (cohort, age)
    grid, which is time-span-bounded (days²), never activity-sized.
    Same hot-key contract as the rest of the family: one key's distinct
    days fit one reducer (trivially true here — a key has ≤ one row per
    day after the combiner).
    """
    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.runtime import drop_empty_blocks

    def tag(batch: pd.DataFrame) -> "pd.DataFrame":
        return _to_clean_arrow(
            _with_bucket(batch.drop_duplicates([key, day_col]), [key], num_buckets)
        )

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = group.drop(columns="__gb").drop_duplicates([key, day_col])
        cohort = pdf.groupby(key, sort=False)[day_col].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": cohort.to_numpy(dtype="int64"),
                "age_days": pdf[day_col].to_numpy(dtype="int64")
                - cohort.to_numpy(dtype="int64"),
            }
        )
        return _to_clean_arrow(out)

    cells = drop_empty_blocks(
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(kernel, batch_format="pandas")
    )
    # each (key, day) row is one distinct active user in its cell;
    # cells is already materialized (drop_empty_blocks), so the grid
    # fold (≤ days² rows post-combine) takes the free local-merge
    # elision instead of a second full shuffle
    return partial_groupby_agg(
        cells, ["cohort_day", "age_days"], {"users": (None, "count")},
        num_partitions=num_partitions, elide_small=True,
    )


def funnel_counts(ds, key: str, step_col: str, steps: list[str],
                  order_cols: list[str], num_buckets: int = 64,
                  num_partitions: int | None = None):
    """Ordered funnel: ``users`` reaching step i = keys with a step-i
    event strictly after their step-(i−1) anchor, anchors chained
    greedily from the first step-1 event (each step's anchor is the
    FIRST qualifying event). Output: ``(step, step_name, users)`` —
    exactly ``len(steps)`` rows.

    ONE key-hash shuffle; the per-bucket kernel is positional transforms
    over the (key, order) sort — no per-user loop: step-i candidacy is a
    vectorized mask (event is step i AND its position exceeds the row's
    per-key step-(i−1) anchor), the anchor a grouped ``transform('min')``.
    Per-bucket partial counts then fold through the dimension-bounded
    final phase (``len(steps)`` groups).

    ``order_cols`` must be a total order (pass a unique id last) so
    "strictly after" is well-defined — matches a SQL twin comparing
    ``(ts, id)`` tuples.
    """
    from cartography_ray.ops.agg import bounded_groupby_agg
    from cartography_ray.runtime import drop_empty_blocks

    steps = list(steps)

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        pos = np.arange(len(pdf), dtype="float64")
        kv = pdf[key].to_numpy()
        sv = pdf[step_col].to_numpy()
        users = []
        anchor = None  # per-row: the row's key's step-(i-1) anchor position
        for i, st in enumerate(steps):
            is_st = sv == st
            cand = np.where(
                is_st if i == 0 else (is_st & (pos > anchor)), pos, np.nan
            )
            anchor = (
                pd.Series(cand).groupby(kv, sort=False).transform("min").to_numpy()
            )
            users.append(pd.unique(kv[~np.isnan(anchor)]).size)
        out = pd.DataFrame(
            {
                "step": np.arange(1, len(steps) + 1, dtype="int64"),
                "step_name": steps,
                "users": np.asarray(users, dtype="int64"),
            }
        )
        return _to_clean_arrow(out)

    partials = drop_empty_blocks(
        _bucket_tagged(ds, [key], num_buckets)
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(kernel, batch_format="pandas")
    )
    return bounded_groupby_agg(
        partials, ["step", "step_name"], {"users": ("users", "sum")}
    )


# multiplier from Knuth's MMIX / Fibonacci hashing — chosen because both
# engines can evaluate it exactly in int64 (SQL: (id*K)%2^32), unlike
# library hash functions which differ between pandas and DuckDB
SAMPLE_MULT = 2654435761
SAMPLE_MOD = 1 << 32


def sample_hash(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic per-id sampling score in [0, 2^32): the SQL twin is
    ``(CAST(id AS UBIGINT) % 4294967296 + salt) * 2654435761 % 4294967296``.

    Ids are reduced mod 2^32 in uint64 BEFORE the multiply so neither
    engine can overflow: ids above ~3.46e9 used to wrap silently in the
    int64 product here while the naive BIGINT product hard-failed in
    DuckDB (ADVICE r03). Identical scores for ids already < 2^32; assumes
    non-negative ids (the UBIGINT cast rejects negatives in SQL)."""
    reduced = (ids.astype(np.uint64) % SAMPLE_MOD + np.uint64(salt)) % SAMPLE_MOD
    return ((reduced * SAMPLE_MULT) % SAMPLE_MOD).astype(np.int64)


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


def epoch_shuffle(ds, id_col: str, epoch: int = 0):
    """Deterministic epoch shuffle for training-data ordering: every row
    gets ``shuffle_pos = sample_hash(id, salt=epoch)`` (a per-batch
    append, no coordination) and the Dataset is globally sorted by
    ``(shuffle_pos, id)`` — the sort is the ONE all-to-all, and it is
    exactly the exchange a real shuffle needs at any scale. RNG-free, so
    a resumed/retried run reproduces the same permutation, and each
    ``epoch`` value yields a different deterministic order (the
    standard per-epoch reshuffle without materializing an index).
    SQL twin of the position: the ``sample_hash`` expression with the
    epoch added before the multiply."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "shuffle_pos", pa.array(sample_hash(ids, epoch), pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow").sort(["shuffle_pos", id_col])


def hash_split(ds, key_col: str, fractions: dict[str, float], salt: int = 0):
    """Leakage-safe deterministic dataset split: label every row
    ``train``/``val``/``test`` (any labels) by hashing ``key_col`` into
    cumulative fraction bands. All rows sharing a key land in the SAME
    split — split by conversation/user/document id, not by row, so no
    train/test leakage through shared keys. RNG-free and
    order-independent (``sample_hash``), so resumed runs and the SQL
    twin assign identical labels.

    ``fractions``: ordered ``label → fraction`` (must sum to 1 within
    1e-9; the last band absorbs integer-rounding remainder). Output: the
    input columns + ``split``. Pure per-batch append — no shuffle.
    SQL twin: ``CASE WHEN h < c1 THEN l1 WHEN h < c2 THEN l2 ... END``
    over the sample_hash expression.
    """
    import pyarrow as pa

    labels = list(fractions)
    if len(labels) < 2:
        raise ValueError("hash_split: need at least two labels")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"hash_split: fractions must sum to 1, got {total}")
    cuts = []
    acc = 0.0
    for lab in labels[:-1]:
        acc += fractions[lab]
        cuts.append(int(acc * SAMPLE_MOD))
    cuts_arr = np.array(cuts, dtype=np.int64)
    labels_arr = np.array(labels, dtype=object)

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(key_col).to_numpy(zero_copy_only=False)
        band = np.searchsorted(cuts_arr, sample_hash(ids, salt), side="right")
        return t.append_column("split", pa.array(labels_arr[band], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def mix_sources(sources, id_col: str):
    """Deterministic weighted corpus mixing (training-data assembly):
    each source contributes a Bernoulli-by-hash sample at its own rate,
    tagged with its name, unioned into one stream. RNG-free — the mix is
    reproducible across reruns/retries and expressible in SQL (each
    source gets a distinct salt so co-occurring ids are sampled
    independently per source).

    ``sources``: list of ``(name, dataset, rate)``. Every dataset must
    share a schema; output adds a ``source`` string column. Pure
    per-batch filters + union — no shuffle, no driver data.
    """
    import pyarrow as pa

    parts = []
    for salt, (name, ds, rate) in enumerate(sources):
        sampled = deterministic_sample(ds, id_col, rate, salt=salt)

        def tag(t: pa.Table, _name=name) -> pa.Table:
            return t.append_column(
                "source", pa.array([_name] * t.num_rows, pa.string())
            )

        parts.append(sampled.map_batches(tag, batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


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


def hopping_window_agg(
    ds,
    ts_col: str,
    window_us: int,
    hop_us: int,
    keys: list[str] | str | None = None,
    aggs: dict | None = None,
    num_partitions: int | None = None,
    empty_schema=None,
):
    """Hopping (sliding) window aggregate: each event contributes to every
    window ``[w*hop, w*hop + window)`` covering its timestamp — the
    overlapping-window member of the windowed family (tumbling is the
    ``window == hop`` special case, cf. ``events_hourly``).

    ``empty_schema``: forwarded to ``partial_groupby_agg`` — pass the
    output schema (keys + window_start_us + agg cols) when the input can
    legitimately be fully empty (Ray 2.49's all-empty shuffle crash).

    Shape: per-batch window replication (``ceil(window/hop)`` copies per
    row — bounded, the caller picks the ratio) + the two-phase
    ``partial_groupby_agg`` (per-batch combiner first, so the shuffle
    moves one row per (keys, window) per block, not the replicated event
    stream). Output keys: ``keys... , window_start_us`` (int64 epoch µs).

    ``aggs`` is the ``partial_groupby_agg`` spec (out_col → (in_col,
    fn)); default counts rows as ``n_events``. Timestamps must be
    non-negative (epoch µs), so int64 floor-division == truncation in
    both engines and the SQL twin can use plain integer division.
    """
    import pyarrow as pa

    from cartography_ray.ops.agg import partial_groupby_agg

    keys = [] if keys is None else ([keys] if isinstance(keys, str) else list(keys))
    aggs = {"n_events": (None, "count")} if aggs is None else aggs
    window_us, hop_us = int(window_us), int(hop_us)

    def replicate(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.astype("datetime64[us]").astype("int64")
        else:
            ts = ts.astype("int64")
        w_min = (ts - window_us) // hop_us + 1
        w_max = ts // hop_us
        counts = np.clip(w_max - w_min + 1, 0, None)
        idx = np.repeat(np.arange(len(counts)), counts)
        csum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        widx = np.repeat(w_min, counts) + (
            np.arange(int(counts.sum())) - np.repeat(csum, counts)
        )
        out = t.take(pa.array(idx))
        return out.append_column(
            "window_start_us", pa.array(widx * hop_us, pa.int64())
        )

    return partial_groupby_agg(
        ds.map_batches(replicate, batch_format="pyarrow"),
        keys + ["window_start_us"],
        aggs,
        num_partitions=num_partitions,
        empty_schema=empty_schema,
    )


# cell-prefix fan-back side of the chunked running_sum: broadcast below
# (cell-count-sized map via ray.put), reduce-side hash join above — the
# repo's standard size-guarded contract
RUNNING_PREFIX_BROADCAST_LIMIT = 2_000_000


def running_sum(
    ds,
    key: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "run",
    num_buckets: int = 64,
    num_partitions: int | None = None,
    chunk_us: int | None = None,
    ts_col: str | None = None,
    prefix_broadcast_limit: int | None = None,
):
    """Per-key running (cumulative) sum ordered by ``order_cols`` — SQL
    ``SUM(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)``. Output: the input columns + ``out_col``.
    ``order_cols`` must be a total order within each key (pass a unique
    id as the last column) or the cumulative values are ill-defined.

    ``chunk_us=None`` (default): ONE shuffle on ``key``; the
    window-family assumption that one key's rows fit one reducer.

    ``chunk_us=<window>`` is the hot-key fallback (same contract as
    ``sessionize``/``asof_join``): rows shuffle on ``(key, ts //
    chunk_us)`` (``ts_col`` defaults to ``order_cols[0]``; timestamp or
    int64 epoch µs), so a corpus-scale key spreads across reducers.
    Cell totals are computed by the two-phase combiner (cell-sized
    exchange, never the events); a second CELL-sized pass turns totals
    into exclusive per-cell prefixes; the prefix map then fans back —
    broadcast via ``ray.put`` when ≤ ``prefix_broadcast_limit`` rows
    (one event shuffle total), reduce-side ``hash_join`` above. Both
    plans emit identical rows (asserted in tests/test_window.py).
    """
    import pyarrow as pa

    from cartography_ray.runtime import drop_empty_blocks

    order_cols = list(order_cols)

    if chunk_us is None:

        def kernel(group: pd.DataFrame) -> "pd.DataFrame":
            pdf = (
                group.drop(columns="__gb")
                .sort_values([key, *order_cols], kind="mergesort")
                .reset_index(drop=True)
            )
            pdf[out_col] = pdf.groupby(key, sort=False)[value_col].cumsum()
            return _to_clean_arrow(pdf)

        tagged = _bucket_tagged(ds, [key], num_buckets)
        return drop_empty_blocks(
            tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
                kernel, batch_format="pandas"
            )
        )

    import ray

    from cartography_ray.ops.agg import partial_groupby_agg

    tsc = ts_col or order_cols[0]
    limit = (
        RUNNING_PREFIX_BROADCAST_LIMIT
        if prefix_broadcast_limit is None
        else prefix_broadcast_limit
    )

    chunked = ds.map_batches(
        lambda t: _with_chunk_arrow(t, tsc, chunk_us), batch_format="pyarrow"
    )
    # cell totals: per-batch combiner first → the exchange is cell-sized
    cells = partial_groupby_agg(
        chunked,
        [key, "__chunk"],
        {"__cellsum": (value_col, "sum")},
        num_buckets=num_buckets,
        num_partitions=num_partitions,
    )

    def prefix_kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, "__chunk"], kind="mergesort")
            .reset_index(drop=True)
        )
        g = pdf.groupby(key, sort=False)["__cellsum"]
        pdf["__prefix"] = g.cumsum() - pdf["__cellsum"]
        return _to_clean_arrow(pdf[[key, "__chunk", "__prefix"]])

    prefixes = drop_empty_blocks(
        _bucket_tagged(cells, [key], num_buckets)
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(prefix_kernel, batch_format="pandas")
    ).materialize()

    def cell_tag(t):
        return _with_bucket_arrow(
            _with_chunk_arrow(t, tsc, chunk_us), [key, "__chunk"], num_buckets
        )

    tagged = ds.map_batches(cell_tag, batch_format="pyarrow")

    if prefixes.count() <= limit:
        pdf_prefix = prefixes.to_pandas()
        prefix_ref = ray.put(pdf_prefix)

        def cell_kernel(group: pd.DataFrame) -> "pd.DataFrame":
            pmap = ray.get(prefix_ref)
            pdf = (
                group.drop(columns="__gb")
                .sort_values([key, "__chunk", *order_cols], kind="mergesort")
                .reset_index(drop=True)
            )
            local = pdf.groupby([key, "__chunk"], sort=False)[value_col].cumsum()
            merged = pdf[[key, "__chunk"]].merge(pmap, on=[key, "__chunk"], how="left")
            pdf[out_col] = local + merged["__prefix"].fillna(0).to_numpy()
            return _to_clean_arrow(pdf.drop(columns="__chunk"))

        return drop_empty_blocks(
            tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
                cell_kernel, batch_format="pandas"
            )
        )

    from cartography_ray.ops.joins import hash_join

    def local_kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, "__chunk", *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        pdf["__local"] = pdf.groupby([key, "__chunk"], sort=False)[value_col].cumsum()
        return _to_clean_arrow(pdf)

    local = drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            local_kernel, batch_format="pandas"
        )
    )
    joined = hash_join(
        local, prefixes, left_on=[key, "__chunk"], how="left",
        num_buckets=num_buckets, num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        run = pc.add(
            t.column("__local"),
            pc.fill_null(t.column("__prefix"), pa.scalar(0, t.column("__local").type)),
        )
        t = t.append_column(out_col, run)
        return t.drop_columns(["__chunk", "__local", "__prefix"])

    return drop_empty_blocks(joined.map_batches(finish, batch_format="pyarrow"))


def with_ntile(
    ds,
    key: str,
    order_cols: list[str],
    n: int,
    out_col: str = "tile",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY order_cols)``:
    splits each key's ordered rows into ``n`` buckets whose sizes differ
    by at most one, larger buckets first (1-based tile ids) — the
    per-group quantile-bucketing step of stratified pipelines.

    Same shape and partitioning assumption as ``with_lag``: one hash
    shuffle on ``key``, vectorized rank arithmetic per bucket.
    ``order_cols`` should be a total order within each key for a
    deterministic (oracle-stable) tiling.
    """

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        g = pdf.groupby(key, sort=False)
        rank0 = g.cumcount().to_numpy()
        size = g[key].transform("size").to_numpy()
        q, r = size // n, size % n
        cut = r * (q + 1)
        tile = np.where(
            rank0 < cut,
            rank0 // np.maximum(q + 1, 1),
            r + (rank0 - cut) // np.maximum(q, 1),
        )
        pdf[out_col] = (tile + 1).astype("int64")
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def with_rank(
    ds,
    key: str,
    order_cols: list[str],
    rank_col: str | None = "rnk",
    dense_col: str | None = None,
    rownum_col: str | None = None,
    cume_col: str | None = None,
    pctrank_col: str | None = None,
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """SQL ``RANK()`` / ``DENSE_RANK()`` / ``ROW_NUMBER()`` /
    ``CUME_DIST()`` / ``PERCENT_RANK()`` ``OVER (PARTITION BY key ORDER
    BY order_cols)`` — any subset in ONE pass (pass the output column
    name to request a mode, ``None`` to skip). Ties (equal
    ``order_cols`` tuples) share a rank; RANK leaves gaps, DENSE_RANK
    doesn't; ROW_NUMBER breaks ties by shuffle-stable mergesort order,
    so give it a total order for determinism. CUME_DIST = (rows ≤ the
    tie group) / partition size; PERCENT_RANK = (rank − 1) /
    (size − 1), 0 for single-row partitions — both are one int64/int64
    IEEE division of exact integers, so the SQL twins hash-match.

    Same shape and partitioning assumption as ``with_lag``: one hash
    shuffle on ``key``, vectorized change-flag arithmetic per bucket
    (no per-group loop).
    """
    if not (rank_col or dense_col or rownum_col or cume_col or pctrank_col):
        raise ValueError("with_rank: request at least one output column")

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        n = len(pdf)
        kv = pdf[key].to_numpy()
        rn = (pdf.groupby(key, sort=False).cumcount() + 1).to_numpy(dtype="int64")
        if rownum_col:
            pdf[rownum_col] = rn
        if rank_col or dense_col or cume_col or pctrank_col:
            changed = np.ones(n, dtype=bool)  # row 0 and every key start
            if n > 1:
                same_key = kv[1:] == kv[:-1]
                same_vals = np.ones(n - 1, dtype=bool)
                for c in order_cols:
                    a = pdf[c].to_numpy()
                    same_vals &= a[1:] == a[:-1]
                changed[1:] = ~(same_key & same_vals)
            if dense_col:
                pdf[dense_col] = (
                    pd.Series(changed.astype("int64"))
                    .groupby(kv, sort=False)
                    .cumsum()
                    .to_numpy()
                )
            if rank_col or pctrank_col:
                anchored = pd.Series(np.where(changed, rn.astype("float64"), np.nan))
                rank_vals = (
                    anchored.groupby(kv, sort=False).ffill().to_numpy().astype("int64")
                )
                if rank_col:
                    pdf[rank_col] = rank_vals
            if cume_col or pctrank_col:
                size = (
                    pdf.groupby(key, sort=False)[key].transform("size")
                    .to_numpy(dtype="int64")
                )
                if pctrank_col:
                    pdf[pctrank_col] = np.where(
                        size > 1,
                        (rank_vals - 1) / np.maximum(size - 1, 1),
                        0.0,
                    )
                if cume_col:
                    # rows preceding-or-peer = the tie group's max row
                    # number (tie groups delimited by the change flags)
                    grp = np.cumsum(changed)
                    tie_max = (
                        pd.Series(rn).groupby(grp, sort=False)
                        .transform("max")
                        .to_numpy(dtype="int64")
                    )
                    pdf[cume_col] = tie_max / size
        return _to_clean_arrow(pdf)

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def interval_union(
    ds,
    key: str,
    start_col: str,
    end_col: str,
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-key union of (possibly overlapping) intervals — the classic
    gaps-and-islands merge: intervals of one key are coalesced wherever
    the next start is ≤ the running max end (touching intervals merge;
    half-open semantics would use ``<`` — this matches the SQL oracle's
    ``start > MAX(end) OVER preceding`` island flag). Emits one row per
    merged island: ``key, island_start, island_end, n_iv`` (input
    intervals absorbed). The coverage/availability primitive (e.g. total
    time covered by any session, union of validity ranges).

    Same shape and partitioning assumption as ``with_lag``: ONE hash
    shuffle on ``key``, then a fully vectorized kernel (mergesort +
    per-key running cummax + island cumsum — no per-row Python). Island
    membership is order-independent for ties in (start, end), so the
    result is deterministic without a total order.
    """

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, start_col, end_col], kind="mergesort")
            .reset_index(drop=True)
        )
        s = pdf[start_col].to_numpy()
        cm = pdf.groupby(key, sort=False)[end_col].cummax()
        # dtype-preserving shift: a plain .shift() upcasts int64→float64
        # (NaN hole), losing exactness above 2^53; the fill value is
        # arbitrary — first-of-key rows are forced to new_island below
        prev_max_end = cm.shift(fill_value=cm.iloc[0]).to_numpy()
        first_of_key = pdf.groupby(key, sort=False).cumcount().to_numpy() == 0
        new_island = first_of_key | (s > prev_max_end)
        pdf["__isl"] = np.cumsum(new_island)
        g = pdf.groupby([key, "__isl"], sort=False)
        out = pd.DataFrame(
            {
                "island_start": g[start_col].min(),
                "island_end": g[end_col].max(),
                "n_iv": g[start_col].size().astype("int64"),
            }
        ).reset_index()
        return _to_clean_arrow(out.drop(columns="__isl"))

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(ds, [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def sequence_paths(
    ds,
    key: str,
    order_cols: list[str],
    value_col: str,
    max_len: int = 20,
    sep: str = ">",
    out_col: str = "path",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-key ordered event SEQUENCE (behavior path): the first
    ``max_len`` values of ``value_col`` ordered by ``order_cols``,
    joined into one ``sep``-delimited string — the session-path /
    action-sequence extraction step of behavioral training data
    (emits ``key, out_col, n`` with ``n`` = values included).

    Combiner-first: each input batch keeps at most ``max_len`` rows per
    key (the global first-``max_len`` is a subset of the union of
    per-batch first-``max_len``s — the ``grouped_topk`` argument), so
    the shuffle is candidate-sized, then ONE key shuffle and a kernel
    that truncates and joins. ``order_cols`` should be a total order
    for a deterministic (oracle-stable) path; ``sep`` must not occur in
    the values if the output is to be unambiguous.
    """

    def prune(batch: pd.DataFrame) -> "pd.DataFrame":
        s = batch.sort_values([key, *order_cols], kind="mergesort")
        s = s.groupby(key, sort=False).head(max_len)
        return _to_clean_arrow(_with_bucket(s, [key], num_buckets))

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = (
            group.drop(columns="__gb")
            .sort_values([key, *order_cols], kind="mergesort")
            .reset_index(drop=True)
        )
        pdf = pdf[pdf.groupby(key, sort=False).cumcount() < max_len]
        g = pdf.groupby(key, sort=False)[value_col]
        out = pd.DataFrame({out_col: g.agg(sep.join), "n": g.size().astype("int64")})
        return _to_clean_arrow(out.reset_index())

    from cartography_ray.runtime import drop_empty_blocks

    pruned = ds.map_batches(prune, batch_format="pandas")
    return drop_empty_blocks(
        pruned.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def gap_fill(
    ds,
    key: str,
    bucket_col: str,
    value_cols: list[str],
    fill: int = 0,
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Densify a per-(key, bucket) aggregate: emit one row per key for
    EVERY integer bucket between that key's own min and max, filling
    the ``value_cols`` of missing buckets with ``fill`` (time-series
    resampling / zero-fill — SQL's generate_series + LEFT JOIN). The
    only operator family that GENERATES rows the input doesn't have.

    Input contract: already one row per (key, bucket) — the
    partial_groupby_agg output shape — with int64 bucket and value
    columns. Same one-shuffle plan as ``with_lag``; the per-key output
    is bounded by time-range/step (never corpus size), so the
    one-reducer-per-key assumption is safe by construction. The filled
    range is built vectorized (concatenated aranges via repeat/cumsum),
    not a per-key python loop.
    """

    def kernel(group: pd.DataFrame) -> "pd.DataFrame":
        pdf = group.drop(columns="__gb")
        agg = (
            pdf.groupby(key, sort=False)[bucket_col]
            .agg(["min", "max"])
            .reset_index()
        )
        lens = (agg["max"] - agg["min"] + 1).to_numpy(dtype=np.int64)
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        total = int(lens.sum())
        slots = (
            np.arange(total, dtype=np.int64)
            - np.repeat(off, lens)
            + np.repeat(agg["min"].to_numpy(dtype=np.int64), lens)
        )
        full = pd.DataFrame(
            {key: np.repeat(agg[key].to_numpy(), lens), bucket_col: slots}
        )
        out = full.merge(pdf, on=[key, bucket_col], how="left")
        for c in value_cols:
            out[c] = out[c].fillna(fill).astype("int64")
        return _to_clean_arrow(out[[key, bucket_col, *value_cols]])

    from cartography_ray.runtime import drop_empty_blocks

    tagged = _bucket_tagged(drop_empty_blocks(ds), [key], num_buckets)
    return drop_empty_blocks(
        tagged.groupby("__gb", num_partitions=num_partitions).map_groups(
            kernel, batch_format="pandas"
        )
    )


def keyed_rate_sample(
    ds,
    id_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
):
    """Per-stratum Bernoulli sampling: keep a row iff its deterministic
    sampling score falls below ITS KEY'S rate — the class-rebalancing
    sampler (downsample dominant event types / languages, keep rare
    ones whole) next to ``deterministic_sample``'s single global rate
    and ``stratified_sample``'s exactly-k. Same hash contract as
    ``sample_hash`` (RNG-free, resume-identical, SQL CASE twin); keys
    absent from ``rates`` get ``default_rate``. Pure per-batch filter —
    no shuffle, no coordination."""
    import pyarrow as pa

    cuts = {k: int(r * SAMPLE_MOD) for k, r in rates.items()}
    default_cut = int(default_rate * SAMPLE_MOD)

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keys = t.column(key_col).to_pandas()
        cut = keys.map(cuts).fillna(default_cut).to_numpy(dtype="int64")
        return t.filter(pa.array(sample_hash(ids, salt) < cut))

    return ds.map_batches(fn, batch_format="pyarrow")


def ordered_budget_select(
    ds,
    score_col: str,
    size_col: str,
    id_col: str,
    budget: int,
    num_partitions: int | None = None,
):
    """Budget-constrained selection: keep the best-scoring rows whose
    running total of ``size_col`` — ordered by (score desc, id asc) —
    stays within ``budget``. The data-selection step of training-corpus
    curation ("take the highest-quality documents up to N tokens").
    SQL twin: ``SUM(size) OVER (ORDER BY score DESC, id) <= budget``.

    No global sort: ``score_col`` is a bounded-cardinality integer by
    contract (a milli-score 0..1000, the integer-cents convention), so a
    per-score histogram (per-batch combiner → one dimension-sized
    shuffle) finds the boundary score driver-side. Rows STRICTLY better
    than the boundary are kept with a stateless filter (no shuffle);
    only the single boundary bin is sorted (by unique ``id_col``) for
    the exact prefix cut — per-block offsets are folded driver-side
    (block-count-sized), then the cut is a vectorized cumsum filter.
    Degenerate corpora where one score bin dominates pay a sort of that
    bin only; the bin lives in the object store, never on the driver.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from cartography_ray.ops.agg import partial_groupby_agg
    from cartography_ray.runtime import to_pandas_typed

    # fan-out rule: this plan consumes ds up to three times (histogram,
    # keep filter, boundary bin) — a lazy input would re-execute its
    # whole upstream per consumer (actor pools included). One
    # object-store materialization (spillable) buys all three passes.
    ds = ds.materialize()
    if ds.count() == 0:  # metadata-only on a materialized dataset
        return ds
    hist = to_pandas_typed(
        partial_groupby_agg(
            ds, [score_col], {"__tot": (size_col, "sum")},
            num_partitions=num_partitions, elide_small=True,
        )
    )
    if not len(hist):
        return ds  # empty input: nothing to select
    hist = hist.sort_values(score_col, ascending=False).reset_index(drop=True)
    cum = hist["__tot"].cumsum()
    over = cum > budget
    if not over.any():
        return ds  # whole corpus fits the budget
    b_idx = int(over.idxmax())
    theta = int(hist[score_col].iloc[b_idx])
    remaining = int(budget - (cum.iloc[b_idx - 1] if b_idx else 0))

    def keep_better(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column(score_col), pa.scalar(theta)))

    kept = ds.map_batches(keep_better, batch_format="pyarrow")

    def boundary_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column(score_col), pa.scalar(theta)))

    from cartography_ray.ops.joins import (
        LOCAL_MERGE_BYTE_LIMIT,
        LOCAL_MERGE_ROW_LIMIT,
        _ensure_merge_task,
        _nonempty_refs,
    )

    refs, b_rows, b_bytes = _nonempty_refs(
        ds.map_batches(boundary_only, batch_format="pyarrow")
    )
    if not refs:
        return kept
    # the boundary is ONE score bin — usually tiny: sort + cumsum + cut
    # in a single task instead of a distributed sort + per-block offset
    # machinery (4 stages saved); the distributed path below handles the
    # degenerate one-score-dominates corpus
    if b_rows <= LOCAL_MERGE_ROW_LIMIT and b_bytes <= LOCAL_MERGE_BYTE_LIMIT:
        import ray.data as _rd

        def local_cut(t: pa.Table) -> pa.Table:
            order = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
            t = t.take(order)
            run = np.cumsum(
                t.column(size_col).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return t.filter(pa.array(run <= remaining))

        out_ref = _ensure_merge_task().remote(local_cut, "pyarrow", *refs)
        return kept.union(_rd.from_arrow_refs([out_ref]))

    import ray.data as _rd

    boundary = _rd.from_arrow_refs(refs).sort(id_col)
    mat = boundary.materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__first": pa.array(
                    [t.column(id_col)[0].as_py()], pa.int64()
                ),
                "__sz": pa.array(
                    [pc.sum(t.column(size_col)).as_py() or 0], pa.int64()
                ),
            }
        )

    summ = (
        mat.map_batches(block_summary, batch_size=None, batch_format="pyarrow")
        .to_pandas()
        .sort_values("__first")
        .reset_index(drop=True)
    )
    offsets = {
        int(f): int(o)
        for f, o in zip(
            summ["__first"], summ["__sz"].cumsum().shift(fill_value=0)
        )
    }
    off_ref = ray.put(offsets)

    def prefix_cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        off = ray.get(off_ref)[int(t.column(id_col)[0].as_py())]
        run = off + np.cumsum(
            t.column(size_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return t.filter(pa.array(run <= remaining))

    cut = mat.map_batches(prefix_cut, batch_size=None, batch_format="pyarrow")
    return kept.union(cut)
