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
import pyarrow as pa
import pyarrow.compute as pc


_AGG_FINAL = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _to_clean_arrow(df: pd.DataFrame) -> pa.Table:
    """pandas result → metadata-free Arrow block.

    Emitting Arrow directly from a pandas-format UDF (legal in Ray Data)
    keeps the 'pandas' schema-metadata dict out of the block stream —
    pyarrow 16's ``Schema.__hash__`` chokes on it, which knocks every
    downstream shuffle concat off the cheap identical-schema unify path
    (and spams "Failed to hash the schemas" from every aggregator).
    """
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def partial_groupby_agg(
    ds,
    keys: list[str] | str,
    aggs: dict[str, tuple[str, str]],
    num_buckets: int = 64,
    num_partitions: int | None = None,
    empty_schema=None,
    elide_small: bool = False,
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

    ``empty_schema``: a fully-empty input crashes Ray 2.49's hash-shuffle
    finalize (empty blocks skip map UDFs, so nothing carries the __gb
    column). Pass the expected output schema (keys + agg columns) to
    guard degenerate inputs: the COMBINER output (key-rows per block,
    small by construction) is materialized, and a typed empty Dataset is
    returned when nothing survives. The default keeps the barrier-free
    streaming plan for hot paths whose inputs are never fully empty.

    ``elide_small``: opt into the joins' adaptive local-merge elision —
    materialize the post-combiner partials (NOT the input; volume is
    keys×blocks, already collapsed) and, when the measured total sits
    under the joins' guards, run the final fold as ONE task instead of a
    hash shuffle (which costs ~1.5 s pool setup + ~60 ms/partition
    regardless of size). ``empty_schema`` callers already pay the
    partials barrier, so for them the elision is free and always on.
    Output is identical either way (the final fold groups on the REAL
    keys; __gb is placement only). Leave False for hot streaming paths
    whose post-combiner volume scales with the corpus AND whose callers
    never gate on emptiness.
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
        return _to_clean_arrow(out_df)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (_, fn) in aggs.items():
            cols[out] = getattr(g[out], _AGG_FINAL[fn])()
        return _to_clean_arrow(pd.DataFrame(cols).reset_index())

    from cartography_ray.runtime import drop_empty_blocks

    # No barrier before the shuffle (unless empty_schema/elide_small opt
    # in): the hash-shuffle map short-circuits zero-row (even
    # schema-less) blocks before touching key columns. The OUTPUT is
    # cleaned because empty aggregator partitions emit schema-less blocks
    # that poison a later sort (e.g. topk) — that barrier is over the
    # tiny post-aggregation result, not the input.
    partials = ds.map_batches(partial, batch_format="pandas")
    if empty_schema is not None or elide_small:
        import ray.data

        from cartography_ray.ops.joins import _local_or_shuffle, _nonempty_refs

        refs, n_rows, n_bytes = _nonempty_refs(partials)
        if not refs:
            if empty_schema is not None:
                return ray.data.from_arrow(empty_schema.empty_table())
            # elide_small-only caller with a fully-empty input: build the
            # typed empty result directly from the input schema (keys
            # keep their input types; sum/min/max keep the aggregated
            # column's type, count is int64 — matching the non-empty
            # path's pandas dtypes) instead of falling to the legacy
            # plan, which would re-run the partial map and hit Ray
            # 2.49's empty-groupby finalize crash. Round-tripping an
            # empty frame through partial→final instead loses string
            # keys to Arrow type null (empty object column). schema()
            # is metadata-only for source-backed datasets; computed
            # pipelines may re-execute a probe — acceptable on this
            # degenerate path; callers with expensive upstreams should
            # pass empty_schema to skip it entirely.
            in_schema = ds.schema()
            if in_schema is not None:
                in_types = dict(zip(in_schema.names, in_schema.types))
                cols = {k: pa.array([], in_types.get(k, pa.string())) for k in keys}
                for out, (col, fn) in aggs.items():
                    typ = (
                        pa.int64()
                        if fn == "count"
                        else in_types.get(col, pa.int64())
                    )
                    cols[out] = pa.array([], typ)
                return ray.data.from_arrow(pa.table(cols))
            # schema genuinely unknowable (e.g. an empty from_pandas →
            # repartition chain loses it): a null-typed empty beats the
            # legacy plan, which CRASHES on a fully-empty groupby —
            # consumers of this degenerate path check emptiness, and
            # callers needing exact dtypes pass empty_schema
            cols = {k: pa.array([], pa.null()) for k in keys}
            for out, (_, fn) in aggs.items():
                cols[out] = pa.array(
                    [], pa.int64() if fn == "count" else pa.null()
                )
            return ray.data.from_arrow(pa.table(cols))
        else:
            return drop_empty_blocks(
                _local_or_shuffle(
                    refs, n_rows, n_bytes, final, num_partitions,
                    batch_format="pandas", group_key="__gb",
                )
            )
    return drop_empty_blocks(
        partials.groupby("__gb", num_partitions=num_partitions).map_groups(
            final, batch_format="pandas"
        )
    )


def bounded_groupby_agg(
    ds, keys: list[str] | str, aggs: dict[str, tuple[str, str]], fold_every: int = 64
):
    """Two-phase grouped aggregation for PROVABLY BOUNDED key cardinality
    (dimension keys: return flags ×6, nations ×25, languages ×~30).

    Phase 1 is the same per-block partial combine as
    ``partial_groupby_agg``; phase 2 skips the all-to-all shuffle entirely
    and streams the tiny per-block partials (≤K rows each) through a
    driver-side incremental fold. Driver memory is O(K × fold_every) —
    independent of dataset size — so this holds at 100 TB: 1M blocks × 25
    nations streams 25M tiny rows through the driver but never holds more
    than one fold window. Use ``partial_groupby_agg`` when cardinality
    scales with the data (user×hour keys etc.).

    Returns a pyarrow.Table (the result is dimension-sized by contract).
    """
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                cols[out] = g[col if col else keys[0]].size()
            else:
                cols[out] = getattr(g[col], fn)()
        return _to_clean_arrow(pd.DataFrame(cols).reset_index())

    def fold(acc: pd.DataFrame | None, window: list[pd.DataFrame]) -> pd.DataFrame:
        frames = ([acc] if acc is not None else []) + window
        merged = pd.concat(frames, ignore_index=True)
        g = merged.groupby(keys, sort=False, dropna=False)
        cols = {out: getattr(g[out], _AGG_FINAL[fn])() for out, (_, fn) in aggs.items()}
        return pd.DataFrame(cols).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    acc: pd.DataFrame | None = None
    window: list[pd.DataFrame] = []
    for b in partials.iter_batches(batch_format="pandas", batch_size=None):
        if len(b):
            window.append(b)
        if len(window) >= fold_every:
            acc = fold(acc, window)
            window = []
    if window or acc is None:
        acc = fold(acc, window)
    return _to_clean_arrow(acc)


def topk(ds, by: str, k: int, descending: bool = True, tiebreak: list[str] | None = None):
    """Global top-k: per-block prune then a k-sized final sort (no global
    shuffle of the full dataset). ``tiebreak`` columns (ascending) make
    the cut deterministic when ``by`` values collide at the k boundary —
    required for oracle-hashed outputs."""
    cols = [by] + list(tiebreak or [])
    ascending = [not descending] + [True] * (len(cols) - 1)

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(cols, ascending=ascending, kind="mergesort").head(k)

    pruned = ds.map_batches(local, batch_format="pandas")
    return pruned.sort(cols, descending=[not a for a in ascending]).limit(k)


def pivot_groupby_sum(
    ds,
    keys: list[str] | str,
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    suffix: str = "",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """PIVOT as pure composition: widen each batch into one conditional
    column per pivot value (``value if pivot_col == v else 0``), then run
    the existing two-phase partial aggregation — no new shuffle
    machinery, and hot keys still collapse per batch before the exchange.

    ``pivot_values`` must be the closed category list (SQL PIVOT has the
    same requirement); rows with other values contribute zeros.
    Output: keys + one ``{value}{suffix}`` int64/float column per
    category.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    keys = [keys] if isinstance(keys, str) else list(keys)

    def widen(t: pa.Table) -> pa.Table:
        cols = {}
        for k in keys:
            c = t.column(k)
            cols[k] = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        val = t.column(value_col)
        zero = pa.scalar(0, val.type if not isinstance(val, pa.ChunkedArray) else val.type)
        for v in pivot_values:
            mask = pc.equal(t.column(pivot_col), v)
            arr = pc.if_else(mask, val, zero)
            cols[f"{v}{suffix}"] = (
                arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            )
        return pa.table(cols)

    wide = ds.map_batches(widen, batch_format="pyarrow")
    return partial_groupby_agg(
        wide,
        keys,
        {f"{v}{suffix}": (f"{v}{suffix}", "sum") for v in pivot_values},
        num_buckets=num_buckets,
        num_partitions=num_partitions,
    )


def rollup_groupby_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    total_label: str = "ALL",
    num_buckets: int = 64,
    num_partitions: int | None = None,
    empty_schema=None,
):
    """GROUP BY ROLLUP — aggregates at every prefix grouping set of
    ``keys`` ((k1,k2), (k1,), ()) in ONE shuffle, the multi-level
    subtotal step of reporting pipelines.

    Shape: the per-batch combiner collapses to the FINEST grouping first,
    then replicates the (already key-cardinality-sized) partial rows into
    the ``len(keys)+1`` grouping sets with ``total_label`` standing in
    for suppressed keys — so the exchange carries (k+1) × combiner output
    rows, never (k+1) × the input. The final phase is the standard
    two-phase aggregation over the union of grouping sets.

    ``aggs`` is the ``partial_groupby_agg`` spec (sum/count/min/max).
    Key columns must be strings that never equal ``total_label`` (the
    same closed-world requirement SQL's COALESCE-over-ROLLUP idiom has).
    """
    keys = list(keys)

    def combine_replicate(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                cols[out] = g[col if col else keys[0]].size()
            else:
                cols[out] = getattr(g[col], fn)()
        part = pd.DataFrame(cols).reset_index()
        frames = []
        for lvl in range(len(keys), -1, -1):
            f = part.copy()
            for k in keys[lvl:]:
                f[k] = total_label
            frames.append(f)
        return _to_clean_arrow(pd.concat(frames, ignore_index=True))

    # rows are already partials → every agg finalizes with its fold fn
    final_aggs = {out: (out, _AGG_FINAL[fn]) for out, (_, fn) in aggs.items()}
    return partial_groupby_agg(
        ds.map_batches(combine_replicate, batch_format="pandas"),
        keys,
        final_aggs,
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        empty_schema=empty_schema,
    )


def cube_groupby_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    total_label: str = "ALL",
    num_buckets: int = 64,
    num_partitions: int | None = None,
    empty_schema=None,
):
    """GROUP BY CUBE — aggregates at EVERY subset of ``keys`` (2^k
    grouping sets) in one shuffle; same combiner-first replication as
    ``rollup_groupby_agg`` (the exchange is 2^k × combiner output, so
    keep ``keys`` short — the same practical bound SQL CUBE has).
    """
    from itertools import combinations

    keys = list(keys)

    def combine_replicate(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                cols[out] = g[col if col else keys[0]].size()
            else:
                cols[out] = getattr(g[col], fn)()
        part = pd.DataFrame(cols).reset_index()
        frames = []
        for r in range(len(keys) + 1):
            for suppressed in combinations(keys, r):
                f = part.copy()
                for k in suppressed:
                    f[k] = total_label
                frames.append(f)
        return _to_clean_arrow(pd.concat(frames, ignore_index=True))

    final_aggs = {out: (out, _AGG_FINAL[fn]) for out, (_, fn) in aggs.items()}
    return partial_groupby_agg(
        ds.map_batches(combine_replicate, batch_format="pandas"),
        keys,
        final_aggs,
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        empty_schema=empty_schema,
    )


def grouped_mode(
    ds,
    keys: list[str] | str,
    value_col: str,
    out_col: str = "mode_value",
    count_col: str | None = "mode_count",
    num_buckets: int = 64,
    num_partitions: int | None = None,
):
    """Per-group most-frequent value with a DETERMINISTIC tie-break:
    highest count first, then SMALLEST value. SQL engines leave
    ``mode()`` ties unspecified, so the oracle twin must spell out the
    same ``ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, value)`` window.

    Two-phase like ``partial_groupby_agg``, but the shuffle buckets on
    ``keys`` ONLY (all of a key's candidate values must meet in one
    reducer): the per-batch combiner collapses each block to one
    (keys, value, partial-count) row per distinct pair, so a hot key
    costs one row per distinct value per block — never its raw rows —
    and the reducer's work is bounded by the key's value cardinality.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def combine(batch: pd.DataFrame) -> pa.Table:
        part = (
            batch.groupby(keys + [value_col], sort=False, dropna=False)
            .size()
            .rename("__c")
            .reset_index()
        )
        h = pd.util.hash_pandas_object(part[keys], index=False).to_numpy()
        part["__gb"] = (h % num_buckets).astype("int64")
        return _to_clean_arrow(part)

    def pick(group: pd.DataFrame) -> pa.Table:
        summed = (
            group.groupby(keys + [value_col], sort=False, dropna=False)["__c"]
            .sum()
            .reset_index()
        )
        ordered = summed.sort_values(
            keys + ["__c", value_col],
            ascending=[True] * len(keys) + [False, True],
            kind="mergesort",
        )
        top = ordered.groupby(keys, sort=False, dropna=False).head(1)
        out = top.rename(columns={value_col: out_col})
        if count_col:
            out = out.rename(columns={"__c": count_col})
            out[count_col] = out[count_col].astype("int64")
        else:
            out = out.drop(columns="__c")
        return _to_clean_arrow(out.reset_index(drop=True))

    from cartography_ray.runtime import drop_empty_blocks

    partials = ds.map_batches(combine, batch_format="pandas")
    return drop_empty_blocks(
        partials.groupby("__gb", num_partitions=num_partitions).map_groups(
            pick, batch_format="pandas"
        )
    )


def table_profile(ds, columns: list[str], num_buckets: int = 64,
                  num_partitions: int | None = None):
    """ANALYZE-style column profile: one row per profiled column with
    ``n`` (row count), ``n_null`` and exact ``n_distinct`` (nulls
    excluded — SQL ``COUNT(DISTINCT)`` semantics). The planning pass a
    100-TB pipeline runs before choosing shuffle sizes, broadcast sides
    and skew salts.

    ONE pass, ONE shuffle, no hot key: each batch value-counts every
    profiled column (string-cast — bijective per column type, so the
    distinct count equals the native one) into (col_name, v, c) partial
    rows — a hot value collapses to one row per block — bucketed on
    hash(col_name, v) so a high-cardinality column spreads over all
    reducers instead of landing on one. Reducers emit per-(column,
    bucket) partial (n, n_null, n_distinct); the final fold is over a
    ≤ columns × num_buckets row table (dimension-sized by contract,
    same bound as ``bounded_groupby_agg``).
    """
    import numpy as np

    def melt(t: pa.Table) -> pa.Table:
        cs: list[pa.Array] = []
        vs: list[pa.Array] = []
        ns: list[pa.Array] = []
        for c in columns:
            col = t.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_floating(col.type):
                # normalize signed zero: '-0.0' and '0.0' cast to
                # distinct strings but SQL COUNT(DISTINCT) counts one
                col = pc.add(col, pa.scalar(0.0, col.type))
            v = pc.cast(col, pa.string())
            vc = v.drop_null().value_counts()
            vals = vc.field("values")
            cnts = pc.cast(vc.field("counts"), pa.int64())
            # one sentinel row carries the batch's null count (v = null)
            cs.append(pa.array([c] * (len(vals) + 1), pa.string()))
            vs.append(pa.concat_arrays([vals, pa.array([None], pa.string())]))
            ns.append(
                pa.concat_arrays(
                    [cnts, pa.array([col.null_count], pa.int64())]
                )
            )
        out = pa.table(
            {
                "col_name": pa.concat_arrays(cs),
                "v": pa.concat_arrays(vs),
                "c": pa.concat_arrays(ns),
            }
        )
        key = pd.util.hash_pandas_object(
            pd.DataFrame(
                {
                    "col_name": out.column("col_name").to_pandas(),
                    "v": out.column("v").to_pandas().fillna("\x00null"),
                }
            ),
            index=False,
        ).to_numpy()
        return out.append_column(
            "__gb", pa.array((key % num_buckets).astype(np.int64), pa.int64())
        )

    def bucket_partial(group: pd.DataFrame) -> pa.Table:
        isnull = group["v"].isna()
        g = group.groupby("col_name", sort=False)
        out = pd.DataFrame(
            {
                "n": g["c"].sum(),
                "n_null": group[isnull].groupby("col_name", sort=False)["c"]
                .sum()
                .reindex(g.size().index)
                .fillna(0),
                "n_distinct": group[~isnull]
                .groupby("col_name", sort=False)["v"]
                .nunique()
                .reindex(g.size().index)
                .fillna(0),
            }
        ).reset_index()
        for c in ("n", "n_null", "n_distinct"):
            out[c] = out[c].astype("int64")
        return _to_clean_arrow(out)

    from cartography_ray.runtime import drop_empty_blocks

    # The melt output is value_counts-collapsed (bounded-ish per block),
    # so the empty-input guard's materialize barrier is the same price
    # partial_groupby_agg's elide_small callers pay — and a fully-empty
    # groupby input crashes the hash-aggregator finalize otherwise.
    from cartography_ray.ops.joins import _nonempty_or_none

    melted = _nonempty_or_none(ds.map_batches(melt, batch_format="pyarrow"))
    if melted is None:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "col_name": pa.array(sorted(columns), pa.string()),
                    "n": pa.array([0] * len(columns), pa.int64()),
                    "n_null": pa.array([0] * len(columns), pa.int64()),
                    "n_distinct": pa.array([0] * len(columns), pa.int64()),
                }
            )
        )
    partials = drop_empty_blocks(
        melted.groupby("__gb", num_partitions=num_partitions).map_groups(
            bucket_partial, batch_format="pandas"
        )
    )
    # final fold: ≤ columns × num_buckets partial rows — dimension-sized
    pdf = partials.to_pandas()
    out = (
        pdf.groupby("col_name", sort=True)[["n", "n_null", "n_distinct"]]
        .sum()
        .astype("int64")
        .reset_index()
    )
    import ray.data

    return ray.data.from_arrow(_to_clean_arrow(out))
