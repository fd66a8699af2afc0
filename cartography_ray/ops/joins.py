"""Distributed joins for Ray Data — broadcast, reduce-side hash, semi/anti.

The reference's joins are Cypher MATCH clauses executed inside Neo4j
(reference cartography/graph/querybuilder.py:710-745, 864-902); here they
become explicit data-movement strategies (SURVEY §2.5):

- ``broadcast_join``     — small side shipped once via ``ray.put`` and
  merged per batch inside ``map_batches``; NO shuffle of the big side.
  The right strategy for dimension tables / matchlink target tables.
- ``hash_join``          — both sides large: a reduce-side join realized
  as bucket-by-key-hash → one groupby shuffle over the tagged union →
  per-bucket pandas merge. We deliberately do NOT use the experimental
  ``Dataset.join`` (its empty partitions emit schema-less blocks that
  poison downstream operators in Ray 2.49); every block this operator
  emits is an Arrow block with an explicit, constant schema, including
  empty ones.
- ``broadcast_semi_anti``— semi/anti joins as a broadcast key-set filter
  (the cleanup anti-join building block).

Skew note: a reduce-side join buckets by ``hash(key) % num_buckets``; a
hot key lands in one bucket. For joins where the right side is unique per
key (lookup joins — our common case), raise ``num_buckets`` and rely on
the per-batch combiners upstream; for genuinely hot many-to-many joins,
pre-split the hot keys (salt) before calling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# chunked-asof carry-in: per-cell summary tables at or below this row
# count are ray.put-broadcast (zero pass-2 shuffles); above it, the
# cells→carry→fan-back join plan runs. Cell count = distinct (key,
# time-chunk) pairs on the right side — bounded by key-cardinality ×
# active chunks, not by row volume.
ASOF_CARRY_BROADCAST_LIMIT = 200_000


def _bucket_of(series: pd.Series, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(series.to_numpy(), categorize=False)
    return (h % num_buckets).astype(np.int64)


def broadcast_join(
    ds,
    small: pd.DataFrame,
    left_on: list[str] | str,
    right_on: list[str] | str | None = None,
    how: str = "inner",
    suffix: str = "_r",
):
    """Join a Dataset against a small pandas table, no shuffle.

    ``small`` is put in the object store ONCE; every batch task reads the
    same copy (zero re-shipping per batch).
    """
    import ray

    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = left_on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    small_ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pa.Table:
        rhs = ray.get(small_ref)
        # NULL join keys never match (SQL semantics) — pd.merge pairs NaNs
        rhs = rhs.dropna(subset=right_on)
        if how == "inner":
            batch = batch.dropna(subset=left_on)
            out = batch.merge(
                rhs, left_on=left_on, right_on=right_on, how=how, suffixes=("", suffix)
            )
        else:
            nullk = batch[left_on].isna().any(axis=1)
            out = batch[~nullk].merge(
                rhs, left_on=left_on, right_on=right_on, how=how, suffixes=("", suffix)
            )
            if nullk.any():
                out = pd.concat([out, batch[nullk]], ignore_index=True)
        # emit metadata-free Arrow so downstream shuffles keep hashable
        # schemas (pyarrow 16 Schema.__hash__ rejects pandas metadata)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(merge, batch_format="pandas")


def broadcast_semi_anti(ds, keys, on: str, anti: bool = False):
    """Semi (keep matching) / anti (keep non-matching) join via a broadcast
    key set — the cleanup-style anti-join primitive (SURVEY §2.8)."""
    import ray

    key_arr = pa.array(sorted(set(keys)), pa.string())
    keys_ref = ray.put(key_arr)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pc.fill_null(pc.is_in(pc.cast(batch.column(on), pa.string()), ks), False)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def _typed_nulls(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def _nonempty_refs(prepped):
    """Materialize ``prepped`` and return its non-empty block refs plus
    measured totals ``(refs, n_rows, n_bytes)``. Zero-row input blocks
    skip the prep UDF (Ray 2.49) and arrive at the shuffle as schema-less
    blocks, which crash the hash aggregator's finalize sort on
    ``__bucket`` — and a fully empty groupby input crashes finalize even
    with a TYPED empty block. Block data never leaves the object store —
    only metadata is inspected; the measured totals are what the join
    planners use for their adaptive decisions (local-merge elision,
    data-sized partition counts)."""
    mat = prepped.materialize()
    refs, n_rows, n_bytes = [], 0, 0
    for bundle in mat.iter_internal_ref_bundles():
        for blk, meta in zip(bundle.block_refs, bundle.metadata):
            r = meta.num_rows or 0
            if r > 0:
                refs.append(blk)
                n_rows += r
                n_bytes += meta.size_bytes or 0
    return refs, n_rows, n_bytes


def _nonempty_or_none(prepped):
    """Strip empty blocks; return None when nothing is left (see
    ``_nonempty_refs``)."""
    import ray.data

    refs, _, _ = _nonempty_refs(prepped)
    return ray.data.from_arrow_refs(refs) if refs else None


# Adaptive local-merge elision (the AQE move: convert a shuffle join into
# a single-task join when the RUNTIME-MEASURED exchange input is small).
# Every reduce-side join here already pays a materialize barrier to strip
# empty blocks, so the union's true row/byte totals are free at plan
# time; when both land under these guards the whole union fits one
# reducer and the bucket kernel — which joins on the REAL keys, bucketing
# is only placement — runs once as a single Ray task, skipping the hash
# shuffle's fixed cost (~1.5 s pool setup + ~60 ms/partition, BASELINE.md).
# At 100-TB scale the guards never engage and the shuffle plan is
# unchanged. Output is byte-identical either way (asserted in tests).
LOCAL_MERGE_ROW_LIMIT = 750_000
LOCAL_MERGE_BYTE_LIMIT = 64 << 20


def _local_or_shuffle(
    refs,
    n_rows,
    n_bytes,
    kernel,
    num_partitions,
    batch_format: str = "pyarrow",
    group_key: str = "__bucket",
    row_limit: int | None = None,
    byte_limit: int | None = None,
):
    """Run ``kernel`` (a per-bucket merge that is bucket-AGNOSTIC: it
    joins/merges on the real key columns, so feeding it the whole union
    is the one-bucket special case) either as a single task over the
    measured-small union, or via the usual ``groupby(group_key)``
    shuffle. When the caller gave no partition hint, size the exchange
    from the MEASURED totals instead of the session default.

    ``row_limit``/``byte_limit`` override the default guards — tighten
    them when the kernel's cost is SUPERLINEAR in group size (self-join
    verifies), where serializing a large fold in one task loses more
    than the skipped shuffle's fixed cost saves."""
    import ray
    import ray.data

    if row_limit is None:
        row_limit = LOCAL_MERGE_ROW_LIMIT
    if byte_limit is None:
        byte_limit = LOCAL_MERGE_BYTE_LIMIT
    if n_rows <= row_limit and n_bytes <= byte_limit:
        out_ref = _ensure_merge_task().remote(kernel, batch_format, *refs)
        return ray.data.from_arrow_refs([out_ref])
    if num_partitions is None:
        from cartography_ray.runtime import shuffle_partitions

        num_partitions = shuffle_partitions(n_rows=n_rows, n_bytes=n_bytes)
    tagged = ray.data.from_arrow_refs(refs)
    return tagged.groupby(group_key, num_partitions=num_partitions).map_groups(
        kernel, batch_format=batch_format
    )


def _merge_union_remote(kernel, batch_format, *blocks):
    # promote_options="default": pandas-derived partial blocks can carry a
    # null-typed column where every value was NaN (the hash shuffle's
    # builder unifies those the same way); identical schemas concat as-is
    t = (
        blocks[0]
        if len(blocks) == 1
        else pa.concat_tables(list(blocks), promote_options="default")
    )
    if batch_format == "pandas":
        t = t.to_pandas()
    out = kernel(t)
    if isinstance(out, pd.DataFrame):
        out = pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
    return out


_merge_union_task = None  # bound lazily: ray.remote at import time breaks ray-less use


def _ensure_merge_task():
    global _merge_union_task
    if _merge_union_task is None:
        import ray

        _merge_union_task = ray.remote(num_returns=1)(_merge_union_remote)
    return _merge_union_task


def _empty_table_ds(out_schema: pa.Schema):
    import ray.data

    return ray.data.from_arrow(
        pa.Table.from_arrays(
            [pa.array([], f.type) for f in out_schema], schema=out_schema
        )
    )


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset, tolerating pandas-block datasets."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base
    # PandasBlockSchema: names + numpy dtypes
    fields = []
    for name, dtype in zip(base.names, base.types):
        try:
            typ = pa.from_numpy_dtype(dtype)
        except (pa.ArrowNotImplementedError, TypeError):
            typ = pa.string()
        if typ == pa.null() or str(dtype) == "object":
            typ = pa.string()
        fields.append((name, typ))
    return pa.schema(fields)


def _key_strings(batch: pa.Table, keys: list[str]):
    """The join's canonical key representation: \\x1f-joined string casts
    (the same encoding the bucket hash uses, so bloom and shuffle agree)."""
    key = pc.cast(batch.column(keys[0]), pa.string())
    for k in keys[1:]:
        key = pc.binary_join_element_wise(key, pc.cast(batch.column(k), pa.string()), "\x1f")
    return key


def _bloom_positions(h: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Two bit positions per 64-bit key hash (Kirsch–Mitzenmacher double
    hashing: the second probe is a splitmix-style remix of the first)."""
    h = h.astype(np.uint64)
    p1 = h % np.uint64(m)
    g = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    p2 = (g ^ (g >> np.uint64(33))) % np.uint64(m)
    return p1, p2


def build_key_bloom(ds, keys: list[str], bits: int):
    """Fold a dataset's join keys into an m-bit bloom filter (k=2).

    Per-batch map emits the batch's UNIQUE bit positions (tiny); the
    driver ORs them into one packed ``m/8``-byte array — driver memory is
    the constant filter size, never the key count. Returns the packed
    numpy array (ship with ``ray.put``). False-positive rate with n keys:
    ``(1 - exp(-2n/m))²`` — size ``bits ≈ 10×n`` for ~3%.
    """
    m = max(64, (int(bits) + 7) // 8 * 8)

    def positions(batch: pa.Table) -> pa.Table:
        key = _key_strings(batch, keys)
        valid = pc.is_valid(key)
        h = pd.util.hash_array(
            key.filter(valid).to_numpy(zero_copy_only=False), categorize=False
        )
        p1, p2 = _bloom_positions(h, m)
        return pa.table({"pos": pa.array(np.unique(np.concatenate([p1, p2])), pa.uint64())})

    bloom = np.zeros(m // 8, dtype=np.uint8)
    pos_ds = ds.map_batches(positions, batch_format="pyarrow")
    for blk in pos_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        p = blk.column("pos").to_numpy(zero_copy_only=False)
        np.bitwise_or.at(bloom, (p >> 3).astype(np.int64), (1 << (p & 7)).astype(np.uint8))
    return bloom, m


def bloom_probe_mask(batch: pa.Table, keys: list[str], bloom: np.ndarray, m: int) -> np.ndarray:
    """Per-row bool: key MAY be in the bloom (definitely absent → False).
    Null keys return False (inner/semi semantics: they never match)."""
    key = _key_strings(batch, keys)
    valid = pc.is_valid(key).to_numpy(zero_copy_only=False)
    out = np.zeros(batch.num_rows, dtype=bool)
    if valid.any():
        h = pd.util.hash_array(
            key.to_numpy(zero_copy_only=False)[valid], categorize=False
        )
        p1, p2 = _bloom_positions(h, m)
        hit1 = (bloom[(p1 >> 3).astype(np.int64)] >> (p1 & 7).astype(np.uint8)) & 1
        hit2 = (bloom[(p2 >> 3).astype(np.int64)] >> (p2 & 7).astype(np.uint8)) & 1
        out[valid] = (hit1 & hit2).astype(bool)
    return out


def hash_join(
    left,
    right,
    left_on: list[str] | str,
    right_on: list[str] | str | None = None,
    how: str = "inner",
    num_buckets: int = 64,
    right_prefix: str = "",
    num_partitions: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    bloom_prefilter_bits: int | None = None,
    skew_salt: int | None = None,
):
    """Reduce-side hash join of two Datasets (both sides shuffled once).

    Tag each side, align to one constant Arrow schema (typed null columns
    for the other side's fields), bucket by key hash, one
    ``groupby(bucket)`` shuffle, pandas merge inside each bucket, emit
    Arrow with the constant output schema. Right columns colliding with
    left non-key columns are renamed with ``right_prefix``.

    ``how``: inner | left | outer | semi | anti. Semi keeps left rows
    with a match (no right columns in the output); anti keeps left rows
    WITHOUT a match — the distributed cleanup primitive (neither side is
    ever driver-resident, unlike ``broadcast_semi_anti``). Null left keys
    never match: dropped for semi, kept for anti (same semantics as the
    broadcast variant's fill_null(False) mask).

    ``left_schema``/``right_schema``: pass when a side is itself a lazy
    shuffle output (e.g. a chained ``hash_join``) — ``Dataset.schema()``
    on such a plan executes the whole upstream shuffle just to learn the
    column types, and the join would then re-execute it for the data pass
    (measured 43 s → 11 s on the two-join revenue pipeline at sf0.1).

    ``bloom_prefilter_bits``: for SELECTIVE inner/semi joins (most left
    rows have no match), build an m-bit bloom of the right side's keys
    and drop definitely-unmatched left rows BEFORE they enter the
    exchange — the left side's shuffle volume falls to (matches + false
    positives) at the cost of one constant-size broadcast and one extra
    scan of the right side (which is materialized for reuse). Join output
    is IDENTICAL (bloom negatives cannot match; positives are verified by
    the join itself — asserted in tests/test_functions.py). Invalid for
    left/outer/anti, which must keep unmatched left rows.

    ``skew_salt=R``: hot-key fallback for a SKEWED left side (the join
    analogue of the window family's ``chunk_us``). Every left row's
    bucket is drawn from R salted sub-keys, so one corpus-scale key
    spreads over up to R reducers instead of landing a whole key's rows
    in one pandas merge; the right side is replicated R× (each copy to
    one sub-key), which is the classic replication trade — use when
    right is per-key small but left is skewed. Output is IDENTICAL to
    the unsalted plan for inner/left/semi/anti (each left row still
    meets its key's full right set exactly once — equality-tested).
    Invalid for ``outer``: unmatched RIGHT rows would surface once per
    replica.
    """
    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = left_on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    filter_only = how in ("semi", "anti")
    if skew_salt is not None:
        if how == "outer":
            raise ValueError(
                "hash_join: skew_salt is invalid for how='outer' "
                "(unmatched right rows would surface once per replica)"
            )
        if skew_salt < 2:
            skew_salt = None  # R=1 is the unsalted plan
    lschema = left_schema if left_schema is not None else _arrow_schema(left)
    rschema = right_schema if right_schema is not None else _arrow_schema(right)
    if bloom_prefilter_bits:
        if how not in ("inner", "semi"):
            raise ValueError(
                "hash_join: bloom_prefilter_bits requires how='inner' or 'semi' "
                "(other modes keep unmatched left rows)"
            )
        import ray

        right = right.materialize()  # bloom build + join both scan it
        bloom, m = build_key_bloom(right, right_on, bloom_prefilter_bits)
        bloom_ref = ray.put(bloom)
        _lo = list(left_on)

        def _prefilter(batch: pa.Table) -> pa.Table:
            b = ray.get(bloom_ref)
            return batch.filter(pa.array(bloom_probe_mask(batch, _lo, b, m)))

        left = left.map_batches(_prefilter, batch_format="pyarrow")
    lcols = list(lschema.names)
    rcols = list(rschema.names) if not filter_only else list(right_on)
    if filter_only:
        rschema = pa.schema([(c, rschema.field(c).type) for c in rcols])
        right = right.select_columns(rcols)
    # rename right keys to left key names; prefix right value collisions
    r_out = []
    for c in rcols:
        if c in right_on:
            r_out.append(left_on[right_on.index(c)])
        elif c in lcols:
            if not right_prefix:
                raise ValueError(f"hash_join: column collision '{c}'; pass right_prefix")
            r_out.append(right_prefix + c)
        else:
            r_out.append(c)
    r_value = [c for c in r_out if c not in left_on]
    all_cols = lcols + r_value
    types: dict[str, pa.DataType] = {}
    for name, c in zip(lcols, lcols):
        types[name] = lschema.field(c).type
    for name, c in zip(r_out, rcols):
        types.setdefault(name, rschema.field(c).type)
    out_schema = pa.schema([(c, types[c]) for c in all_cols])
    # __salt disambiguates right replicas when two sub-keys of one key
    # collide into the same bucket (the per-bucket merge joins on the
    # ORIGINAL key, so without it a left row would match every colliding
    # replica); the unsalted plan omits the column entirely — no
    # per-row exchange overhead when the fallback isn't engaged
    salt_fields = [("__salt", pa.int64())] if skew_salt is not None else []
    work_schema = pa.schema(
        [("__bucket", pa.int64()), ("__side", pa.int8()), *salt_fields]
        + list(zip(all_cols, [types[c] for c in all_cols]))
    )

    def prep(side: int, in_names: list[str], out_names: list[str]):
        key_out = left_on

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            batch = batch.rename_columns(
                [out_names[in_names.index(c)] if c in in_names else c for c in batch.column_names]
            )
            key = pc.cast(batch.column(key_out[0]), pa.string())
            for k in key_out[1:]:
                key = pc.binary_join_element_wise(key, pc.cast(batch.column(k), pa.string()), "\x1f")
            keys = pd.Series(key.to_numpy(zero_copy_only=False))
            data_cols = []
            for c in all_cols:
                if c in batch.column_names:
                    col = batch.column(c)
                    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    data_cols.append(col.cast(types[c]))
                else:
                    data_cols.append(_typed_nulls(n, types[c]))
            side_col = pa.array(np.full(n, side, dtype=np.int8))

            if skew_salt is None:
                return pa.Table.from_arrays(
                    [
                        pa.array(_bucket_of(keys, num_buckets), pa.int64()),
                        side_col,
                        *data_cols,
                    ],
                    schema=work_schema,
                )

            def tbl(bucket: np.ndarray, salt: np.ndarray) -> pa.Table:
                return pa.Table.from_arrays(
                    [pa.array(bucket, pa.int64()), side_col, pa.array(salt, pa.int64()), *data_cols],
                    schema=work_schema,
                )

            zeros = np.zeros(n, dtype="int64")
            if side == 0:
                # any per-row spread is correct (each left row meets its
                # key's full right set in its sub-bucket); round-robin is
                # the cheapest even one
                salt = (np.arange(n) % skew_salt).astype("int64")
                return tbl(
                    _bucket_of(keys + "\x1e" + pd.Series(salt).astype(str), num_buckets),
                    salt,
                )
            # right side: one replica per sub-key
            return pa.concat_tables(
                [
                    tbl(_bucket_of(keys + f"\x1e{i}", num_buckets), zeros + i)
                    for i in range(skew_salt)
                ]
            )

        return fn

    lp = left.map_batches(prep(0, lcols, lcols), batch_format="pyarrow")
    rp = right.map_batches(prep(1, rcols, r_out), batch_format="pyarrow")

    l_value = [c for c in lcols if c not in left_on]
    pd_how = {"inner": "inner", "left": "left", "outer": "outer",
              "semi": "semi", "anti": "anti"}[how]

    join_on = left_on + (["__salt"] if skew_salt is not None else [])

    def merge_bucket(group: pa.Table) -> pa.Table:
        pdf = group.to_pandas()
        lhs = pdf[pdf["__side"] == 0][join_on + l_value]
        if pd_how in ("semi", "anti"):
            rhs_keys = pdf[pdf["__side"] == 1][join_on].dropna().drop_duplicates()
            nullk = lhs[left_on].isna().any(axis=1)
            flagged = lhs[~nullk].merge(
                rhs_keys, on=join_on, how="left", indicator="__m"
            )
            want = "both" if pd_how == "semi" else "left_only"
            out = flagged[flagged["__m"] == want][all_cols]
            if pd_how == "anti" and nullk.any():
                out = pd.concat([out, lhs[nullk][all_cols]], ignore_index=True)
            return pa.Table.from_pandas(
                out, schema=out_schema, preserve_index=False
            ).replace_schema_metadata(None)
        # NULL join keys never match (SQL semantics) — pd.merge pairs NaNs
        rhs_all = pdf[pdf["__side"] == 1][join_on + r_value]
        rhs_nullk = rhs_all[left_on].isna().any(axis=1)
        rhs = rhs_all[~rhs_nullk]
        if pd_how == "inner":
            lhs = lhs.dropna(subset=left_on)
            out = lhs.merge(rhs, on=join_on, how=pd_how)[all_cols]
        else:
            # left/outer: null-key rows survive unmatched (other side null)
            nullk = lhs[left_on].isna().any(axis=1)
            out = lhs[~nullk].merge(rhs, on=join_on, how=pd_how)
            parts = [out] + [lhs[nullk]] * int(nullk.any())
            if pd_how == "outer" and rhs_nullk.any():
                parts.append(rhs_all[rhs_nullk])
            out = pd.concat(parts, ignore_index=True) if len(parts) > 1 else out
            out = out.reindex(columns=all_cols)
        # replace_schema_metadata: from_pandas attaches a 'pandas' metadata
        # dict that makes the schema unhashable under pyarrow 16 (breaks
        # Ray's cheap identical-schema unify path downstream)
        return pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    # ONE materialize barrier over the union of both prepped sides (the
    # sides execute concurrently inside it) instead of two serialized
    # per-side barriers. One-side-empty BUCKETS are the kernel's normal
    # case (keys hash apart), so a dataset-level empty side needs no
    # special path — only the fully-empty union does (finalize crash;
    # empty-side hazards documented on _nonempty_or_none, found by the
    # join property test).
    refs, n_rows, n_bytes = _nonempty_refs(lp.union(rp))
    if not refs:
        return _empty_table_ds(out_schema)

    # measured-small unions skip the shuffle entirely (local-merge
    # elision); larger ones shuffle with num_partitions from the caller's
    # hint, or sized to the MEASURED union when no hint was given
    return _local_or_shuffle(refs, n_rows, n_bytes, merge_bucket, num_partitions)


def asof_join(
    left,
    right,
    by: str,
    on: str,
    right_prefix: str = "r_",
    how: str = "inner",
    tolerance_us: int | None = None,
    num_buckets: int = 64,
    num_partitions: int | None = None,
    chunk_us: int | None = None,
    carry_broadcast_limit: int | None = None,
    direction: str = "backward",
):
    """Distributed as-of join: each left row picks the LATEST right row of
    the same ``by`` key with ``right.on <= left.on`` (backward direction,
    exact matches allowed) — the time-series attribution primitive the
    custom-operator brief names (no Ray Data analogue).

    Same shape as ``hash_join``: tag both sides, bucket on ``hash(by)``,
    ONE groupby shuffle, then a per-bucket ``pandas.merge_asof`` over the
    ``on``-sorted sides. Partitioning assumption (documented per the
    brief): all rows of one ``by`` key land in one bucket, so a single
    key's row volume must fit one reducer — keys are users/entities with
    bounded activity, not corpus-sized.

    ``chunk_us=<window>`` is the hot-key fallback for keys that are NOT
    activity-bounded (a bot user with corpus-scale events): rows shuffle
    on ``(by, on // chunk_us)`` so no reducer ever holds more than one
    (key, time-chunk) of rows. With ``tolerance_us`` set, right rows are
    replicated into the ≤ ``ceil(tolerance/chunk)`` following chunks they
    can still serve — ONE shuffle, exact. Without a tolerance the
    lookback is unbounded, so a second, cell-bounded pass resolves lefts
    whose match lives in an earlier chunk (see ``_asof_join_chunked``);
    when the per-cell summary table is ≤ ``carry_broadcast_limit`` rows
    (default ``ASOF_CARRY_BROADCAST_LIMIT``; it is (key × chunk)-cell-
    sized, not row-sized) the carry-in resolves via one ``ray.put``
    broadcast + per-batch ``merge_asof`` — zero extra shuffles — and
    falls back to the cells→carry→fan-back join plan above the limit.
    Both paths are asserted equal to the single-shuffle plan in
    tests/test_window.py.

    ``on`` must be a timestamp/numeric column present on BOTH sides with
    the same dtype. Right value columns are renamed ``right_prefix+col``
    (``on`` becomes ``right_prefix+on`` so the caller can compute lags).
    ``how="inner"`` drops left rows with no match; ``"left"`` keeps them
    with nulls. ``tolerance_us`` bounds the lookback window (microseconds,
    for timestamp ``on``).

    ``direction="forward"`` flips the match rule to the EARLIEST right
    row with ``right.on >= left.on`` (next-event attribution). Tie rule
    under duplicate (by, on) right rows: forward picks the first row in
    the full-column sort order, backward the last — both block-layout-
    independent. Forward is unchunked-only: the chunked fallback's
    second pass resolves LOOKBACKS (earlier-chunk carry-in) and does not
    generalize to lookahead — pass a coarser partitioning instead.
    DuckDB oracle recipe: ASOF JOIN is backward-only, so a forward oracle
    negates the ``on`` values on both sides (see SQL_EVENTS_NEXT_PURCHASE).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be inner|left, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be backward|forward, got {direction!r}"
        )
    if chunk_us is not None and direction != "backward":
        raise ValueError(
            "asof_join: direction='forward' is unchunked-only (the chunked "
            "second pass resolves lookbacks, not lookaheads)"
        )
    if chunk_us is not None:
        return _asof_join_chunked(
            left, right, by, on, right_prefix, how, tolerance_us,
            num_buckets, num_partitions, int(chunk_us),
            carry_broadcast_limit,
        )
    lcols = list(_arrow_schema(left).names)
    rschema = _arrow_schema(right)
    rcols = list(rschema.names)
    if by not in lcols or by not in rcols or on not in lcols or on not in rcols:
        raise ValueError(f"asof_join: '{by}'/'{on}' must exist on both sides")
    r_renamed = {c: (c if c == by else right_prefix + c) for c in rcols}
    clash = [r_renamed[c] for c in rcols if r_renamed[c] in lcols and c != by]
    if clash:
        raise ValueError(f"asof_join: renamed right columns collide with left: {clash}")

    # One constant work schema for BOTH sides (typed nulls for the other
    # side's fields) — heterogeneous-schema blocks poison the hash shuffle
    # (same reason hash_join aligns its sides).
    out_on = right_prefix + on
    r_value = [r_renamed[c] for c in rcols if c != by]
    lschema = _arrow_schema(left)
    types: dict[str, pa.DataType] = {c: lschema.field(c).type for c in lcols}
    for c in rcols:
        types.setdefault(r_renamed[c], rschema.field(c).type)
    all_cols = lcols + r_value
    out_schema = pa.schema([(c, types[c]) for c in all_cols])
    work_schema = pa.schema(
        [("__bucket", pa.int64()), ("__side", pa.int8())]
        + [(c, types[c]) for c in all_cols]
    )

    def tag(side: int, rename: dict[str, str] | None):
        def fn(batch: pa.Table) -> pa.Table:
            if rename:
                batch = batch.rename_columns([rename.get(c, c) for c in batch.column_names])
            n = batch.num_rows
            bucket = _bucket_of(
                pd.Series(batch.column(by).to_numpy(zero_copy_only=False)), num_buckets
            )
            cols = [pa.array(bucket, pa.int64()), pa.array(np.full(n, side, dtype=np.int8))]
            for c in all_cols:
                if c in batch.column_names:
                    col = batch.column(c)
                    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    cols.append(col.cast(types[c]))
                else:
                    cols.append(_typed_nulls(n, types[c]))
            return pa.Table.from_arrays(cols, schema=work_schema)

        return fn

    def merge_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        # split + project in Arrow BEFORE to_pandas, so the other side's
        # typed-null fills never float an int column
        lhs = group.filter(pc.equal(side, 0)).select(lcols).to_pandas().sort_values(
            on, kind="mergesort"
        )
        # sort the right side by ALL its columns (on-key primary): when
        # several right rows share (by, on), merge_asof picks the last in
        # sort order — with only the on-key sorted that was block-arrival-
        # dependent (ADVICE r03). Full-column order makes ties resolve to
        # the lexicographically-largest row, independent of block layout.
        # (The DuckDB ASOF JOIN oracle assumes unique (by, on) pairs.)
        rhs = group.filter(pc.equal(side, 1)).select([by] + r_value).to_pandas().sort_values(
            [out_on] + [c for c in r_value if c != out_on], kind="mergesort"
        )
        kwargs = {}
        if tolerance_us is not None:
            kwargs["tolerance"] = (
                pd.Timedelta(tolerance_us, "us")
                if np.issubdtype(lhs[on].dtype, np.datetime64)
                else tolerance_us
            )
        merged = pd.merge_asof(
            lhs, rhs, left_on=on, right_on=out_on, by=by,
            direction=direction, allow_exact_matches=True, **kwargs,
        )
        if how == "inner":
            merged = merged.dropna(subset=[out_on])
        return pa.Table.from_pandas(
            merged[all_cols], schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    from cartography_ray.runtime import drop_empty_blocks

    # single union-level barrier (see hash_join): one-side-empty buckets
    # are merge_asof's normal case; only a fully-empty union needs the
    # short-circuit
    lp = left.map_batches(tag(0, None), batch_format="pyarrow")
    rp = right.map_batches(tag(1, r_renamed), batch_format="pyarrow")
    refs, n_rows, n_bytes = _nonempty_refs(lp.union(rp))
    if not refs:
        return _empty_table_ds(out_schema)
    return drop_empty_blocks(
        _local_or_shuffle(refs, n_rows, n_bytes, merge_bucket, num_partitions)
    )


def _us_np(a: np.ndarray) -> np.ndarray:
    """int64 microseconds view of a timestamp/numeric numpy column."""
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[us]").astype("int64")
    return a.astype("int64")


def _asof_join_chunked(
    left, right, by, on, right_prefix, how, tolerance_us,
    num_buckets, num_partitions, chunk_us,
    carry_broadcast_limit=None,
):
    """Hot-key fallback for ``asof_join`` (VERDICT r03 missing item 1):
    shuffle on ``(by, on // chunk_us)`` so a corpus-scale key spreads
    across reducers instead of OOMing one.

    - ``tolerance_us`` set (bounded lookback): each right row is
      replicated into the following chunks it can still serve (those
      within ``tolerance`` of its own — ≤ ``ceil(tol/chunk)`` copies, and
      only for rows near enough to the boundary). Every left row's full
      candidate window is then inside its own (key, chunk) cell → ONE
      shuffle, exact, no second pass.
    - no tolerance (unbounded lookback): pass 1 joins within cells —
      an in-cell match is globally optimal (any earlier-chunk right row
      is older), so matched lefts are final. Pass 2 resolves the
      unmatched lefts against the per-cell summary table (each nonempty
      right cell's latest right row, full-column tie order). The
      summary table is (key × chunk)-CELL-sized, so when it is ≤
      ``carry_broadcast_limit`` rows it is ``ray.put`` once and every
      unmatched batch resolves locally with ``merge_asof`` — zero
      pass-2 shuffles (the common case; the three pass-2 exchanges
      otherwise cost ~60 ms/partition + pool setup each at bench
      scale). Above the limit: a cell-count-sized as-of of distinct
      unmatched cells against summaries computes each cell's carry-in,
      and a hash join fans it back to the unmatched lefts. Every
      pass-2 stage is bounded by cells or unmatched rows per cell —
      never by a key's corpus-scale row count.
    """
    from cartography_ray.runtime import drop_empty_blocks

    lcols = list(_arrow_schema(left).names)
    rschema = _arrow_schema(right)
    rcols = list(rschema.names)
    if by not in lcols or by not in rcols or on not in lcols or on not in rcols:
        raise ValueError(f"asof_join: '{by}'/'{on}' must exist on both sides")
    r_renamed = {c: (c if c == by else right_prefix + c) for c in rcols}
    clash = [r_renamed[c] for c in rcols if r_renamed[c] in lcols and c != by]
    if clash:
        raise ValueError(f"asof_join: renamed right columns collide with left: {clash}")
    out_on = right_prefix + on
    r_value = [r_renamed[c] for c in rcols if c != by]
    lschema = _arrow_schema(left)
    types: dict[str, pa.DataType] = {c: lschema.field(c).type for c in lcols}
    for c in rcols:
        types.setdefault(r_renamed[c], rschema.field(c).type)
    all_cols = lcols + r_value
    out_schema = pa.schema([(c, types[c]) for c in all_cols])
    work_schema = pa.schema(
        [("__bucket", pa.int64()), ("__side", pa.int8()), ("__chunk", pa.int64())]
        + [(c, types[c]) for c in all_cols]
    )
    n_rep = 0 if tolerance_us is None else -(-int(tolerance_us) // chunk_us)

    def _aligned(sub: pa.Table, side: int, ck: np.ndarray) -> pa.Table:
        n = sub.num_rows
        keyvals = pd.DataFrame(
            {"k": sub.column(by).to_numpy(zero_copy_only=False), "c": ck}
        )
        h = pd.util.hash_pandas_object(keyvals, index=False).to_numpy()
        cols = [
            pa.array((h % num_buckets).astype(np.int64), pa.int64()),
            pa.array(np.full(n, side, dtype=np.int8)),
            pa.array(ck, pa.int64()),
        ]
        for c in all_cols:
            if c in sub.column_names:
                col = sub.column(c)
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                cols.append(col.cast(types[c]))
            else:
                cols.append(_typed_nulls(n, types[c]))
        return pa.Table.from_arrays(cols, schema=work_schema)

    def tag(side: int, rename: dict[str, str] | None):
        def fn(batch: pa.Table) -> pa.Table:
            if rename:
                batch = batch.rename_columns(
                    [rename.get(c, c) for c in batch.column_names]
                )
            on_name = on if side == 0 else out_on
            us = _us_np(batch.column(on_name).to_numpy(zero_copy_only=False))
            chunk0 = us // chunk_us
            parts = [_aligned(batch, side, chunk0)]
            if side == 1:
                for k in range(1, n_rep + 1):
                    # a right row only serves chunk c+k if it is within
                    # tolerance of that chunk's start
                    mask = us + int(tolerance_us) >= (chunk0 + k) * chunk_us
                    if mask.any():
                        parts.append(
                            _aligned(
                                batch.filter(pa.array(mask)), side, chunk0[mask] + k
                            )
                        )
            return pa.concat_tables(parts)

        return fn

    p1_schema = pa.schema(
        [("__role", pa.int8()), ("__chunk", pa.int64())]
        + [(c, types[c]) for c in all_cols]
    )

    def _part(role: int, df: pd.DataFrame) -> pa.Table:
        n = len(df)
        arrs = [
            pa.array(np.full(n, role, dtype=np.int8)),
            pa.array(df["__chunk"].to_numpy().astype("int64"), pa.int64()),
        ]
        for c in all_cols:
            if c in df.columns:
                arrs.append(pa.Array.from_pandas(df[c], type=types[c]))
            else:
                arrs.append(_typed_nulls(n, types[c]))
        return pa.Table.from_arrays(arrs, schema=p1_schema)

    def merge_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        lhs = (
            group.filter(pc.equal(side, 0))
            .select(["__chunk"] + lcols)
            .to_pandas()
            .sort_values(on, kind="mergesort")
        )
        rhs = (
            group.filter(pc.equal(side, 1))
            .select(["__chunk", by] + r_value)
            .to_pandas()
            .sort_values(
                [out_on] + [c for c in r_value if c != out_on], kind="mergesort"
            )
        )
        kwargs = {}
        if tolerance_us is not None:
            kwargs["tolerance"] = (
                pd.Timedelta(tolerance_us, "us")
                if np.issubdtype(lhs[on].dtype, np.datetime64)
                else tolerance_us
            )
        merged = pd.merge_asof(
            lhs, rhs, left_on=on, right_on=out_on, by=[by, "__chunk"],
            direction="backward", allow_exact_matches=True, **kwargs,
        )
        if tolerance_us is not None:
            # replication makes in-cell results final — one-pass output
            if how == "inner":
                merged = merged.dropna(subset=[out_on])
            return pa.Table.from_pandas(
                merged[all_cols], schema=out_schema, preserve_index=False
            ).replace_schema_metadata(None)
        hit = merged[out_on].notna()
        return pa.concat_tables(
            [
                _part(0, merged[hit]),
                _part(1, merged[~hit][["__chunk"] + lcols]),
                _part(2, rhs.groupby([by, "__chunk"], sort=False).tail(1)),
            ]
        )

    lp = left.map_batches(tag(0, None), batch_format="pyarrow")
    rp = right.map_batches(tag(1, r_renamed), batch_format="pyarrow")
    refs, n_rows, n_bytes = _nonempty_refs(lp.union(rp))
    if not refs:
        return _empty_table_ds(out_schema)
    joined = _local_or_shuffle(refs, n_rows, n_bytes, merge_bucket, num_partitions)
    if tolerance_us is not None:
        return drop_empty_blocks(joined)

    # ---- pass 2 (no tolerance): resolve cross-chunk lookbacks -----------
    p1 = drop_empty_blocks(joined).materialize()

    def _proj_out(t: pa.Table) -> pa.Table:
        return t.select(all_cols)

    matched = p1.filter(expr="__role == 0").map_batches(
        _proj_out, batch_format="pyarrow"
    )
    unmatched = p1.filter(expr="__role == 1")
    if unmatched.count() == 0:
        return drop_empty_blocks(matched)
    summaries = p1.filter(expr="__role == 2")
    n_summaries = summaries.count()
    if n_summaries == 0:
        if how == "inner":
            return drop_empty_blocks(matched)
        return drop_empty_blocks(
            matched.union(unmatched.map_batches(_proj_out, batch_format="pyarrow"))
        )

    limit = (
        ASOF_CARRY_BROADCAST_LIMIT
        if carry_broadcast_limit is None
        else carry_broadcast_limit
    )
    if n_summaries <= limit:
        import ray

        sm = (
            summaries.map_batches(
                lambda t: t.select(["__chunk", by] + r_value),
                batch_format="pyarrow",
            )
            .to_pandas()
            .rename(columns={"__chunk": "__sc"})
            .sort_values("__sc", kind="mergesort")
            .reset_index(drop=True)
        )
        sm_ref = ray.put(sm)

        def resolve_local(batch: pa.Table) -> pa.Table:
            import ray as _ray

            smf = _ray.get(sm_ref)
            pdf = batch.select(["__chunk"] + lcols).to_pandas()
            # strictly-earlier chunks only: shift one back, allow exact
            pdf["__cc"] = pdf["__chunk"] - 1
            pdf = pdf.sort_values("__cc", kind="mergesort")
            merged = pd.merge_asof(
                pdf, smf, left_on="__cc", right_on="__sc", by=by,
                direction="backward", allow_exact_matches=True,
            )
            if how == "inner":
                merged = merged.dropna(subset=[out_on])
            return pa.Table.from_pandas(
                merged[all_cols], schema=out_schema, preserve_index=False
            ).replace_schema_metadata(None)

        return drop_empty_blocks(
            matched.union(
                unmatched.map_batches(resolve_local, batch_format="pyarrow")
            )
        )

    from cartography_ray.ops.agg import partial_groupby_agg

    # distinct unmatched (key, chunk) cells, shifted one chunk back so the
    # recursive as-of picks summaries from chunks STRICTLY earlier
    cells = partial_groupby_agg(
        unmatched.map_batches(
            lambda t: t.select([by, "__chunk"]), batch_format="pyarrow"
        ),
        [by, "__chunk"],
        {"__c": (None, "count")},
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {
                by: t.column(by),
                "__chunk": t.column("__chunk"),
                "__cc": pc.subtract(t.column("__chunk"), pa.scalar(1, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )
    summaries_cc = summaries.map_batches(
        lambda t: pa.table(
            {by: t.column(by), "__cc": t.column("__chunk"),
             **{c: t.column(c) for c in r_value}}
        ),
        batch_format="pyarrow",
    )
    carry = asof_join(
        cells, summaries_cc, by=by, on="__cc", right_prefix="__s_", how="left",
        num_buckets=num_buckets, num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.select([by, "__chunk"] + [f"__s_{c}" for c in r_value]),
        batch_format="pyarrow",
    )
    # schema hints: carry is itself a shuffle output — Dataset.schema()
    # would execute the whole carry plan once just to learn column types
    resolved = hash_join(
        unmatched.map_batches(
            lambda t: t.select(["__chunk"] + lcols), batch_format="pyarrow"
        ),
        carry,
        left_on=[by, "__chunk"],
        how="left",
        num_buckets=num_buckets,
        num_partitions=num_partitions,
        left_schema=pa.schema(
            [("__chunk", pa.int64())] + [(c, types[c]) for c in lcols]
        ),
        right_schema=pa.schema(
            [(by, types[by]), ("__chunk", pa.int64())]
            + [(f"__s_{c}", types[c]) for c in r_value]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        if how == "inner":
            t = t.filter(pc.is_valid(t.column(f"__s_{out_on}")))
        return pa.Table.from_arrays(
            [t.column(c).cast(types[c]) for c in lcols]
            + [t.column(f"__s_{c}").cast(types[c]) for c in r_value],
            schema=out_schema,
        )

    return drop_empty_blocks(
        matched.union(resolved.map_batches(finish, batch_format="pyarrow"))
    )


def range_join(
    left,
    right,
    by: str,
    point_col: str,
    lo_col: str,
    hi_col: str,
    right_prefix: str = "r_",
    num_buckets: int = 64,
    num_partitions: int | None = None,
    chunk_us: int | None = None,
    max_chunks_per_interval: int = 4096,
):
    """Distributed range (point-in-interval) join: left rows pair with
    every right interval of the same ``by`` key satisfying
    ``lo <= point <= hi`` — the interval-join member of the custom-
    operator family (as-of join's sibling; Ray Data has no analogue).

    Same machinery as ``asof_join``: both sides aligned to one constant
    Arrow schema, bucketed on ``hash(by)``, ONE groupby shuffle, then a
    vectorized per-bucket equi-merge on ``by`` + interval mask. Inner
    semantics (non-matching left rows drop). Per-key cost is
    |left_k| × |right_k| before the mask — intervals per key are assumed
    bounded (sessions per user, windows per entity); for massively
    overlapping interval sets an interval-tree kernel would replace the
    merge, same shuffle shape.

    ``chunk_us=<window>`` is the hot-key fallback (VERDICT r03 missing
    item 1): points shuffle on ``(by, point // chunk_us)`` and each
    interval is replicated into every chunk it overlaps, so every
    matching pair meets in the point's own (key, chunk) cell — ONE
    shuffle, exact, no reducer holds more than a time-chunk of a hot
    key. Replication is ``interval_length / chunk_us + 1`` copies;
    intervals spanning more than ``max_chunks_per_interval`` chunks
    raise (pick a coarser ``chunk_us``) rather than silently exploding
    the shuffle.
    """
    lcols = list(_arrow_schema(left).names)
    rschema = _arrow_schema(right)
    rcols = list(rschema.names)
    for c in (by, point_col):
        if c not in lcols:
            raise ValueError(f"range_join: left missing '{c}'")
    for c in (by, lo_col, hi_col):
        if c not in rcols:
            raise ValueError(f"range_join: right missing '{c}'")
    r_renamed = {c: (c if c == by else right_prefix + c) for c in rcols}
    clash = [r_renamed[c] for c in rcols if r_renamed[c] in lcols and c != by]
    if clash:
        raise ValueError(f"range_join: renamed right columns collide: {clash}")
    out_lo, out_hi = right_prefix + lo_col, right_prefix + hi_col
    r_value = [r_renamed[c] for c in rcols if c != by]
    lschema = _arrow_schema(left)
    types: dict[str, pa.DataType] = {c: lschema.field(c).type for c in lcols}
    for c in rcols:
        types.setdefault(r_renamed[c], rschema.field(c).type)
    all_cols = lcols + r_value
    out_schema = pa.schema([(c, types[c]) for c in all_cols])
    chunk_field = [("__chunk", pa.int64())] if chunk_us is not None else []
    work_schema = pa.schema(
        [("__bucket", pa.int64()), ("__side", pa.int8())]
        + chunk_field
        + [(c, types[c]) for c in all_cols]
    )
    merge_keys = [by] if chunk_us is None else [by, "__chunk"]

    def _aligned(sub: pa.Table, side: int, ck: np.ndarray | None) -> pa.Table:
        n = sub.num_rows
        if chunk_us is None:
            bucket = _bucket_of(
                pd.Series(sub.column(by).to_numpy(zero_copy_only=False)), num_buckets
            )
            cols = [pa.array(bucket, pa.int64()), pa.array(np.full(n, side, dtype=np.int8))]
        else:
            keyvals = pd.DataFrame(
                {"k": sub.column(by).to_numpy(zero_copy_only=False), "c": ck}
            )
            h = pd.util.hash_pandas_object(keyvals, index=False).to_numpy()
            cols = [
                pa.array((h % num_buckets).astype(np.int64), pa.int64()),
                pa.array(np.full(n, side, dtype=np.int8)),
                pa.array(ck, pa.int64()),
            ]
        for c in all_cols:
            if c in sub.column_names:
                col = sub.column(c)
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                cols.append(col.cast(types[c]))
            else:
                cols.append(_typed_nulls(n, typ=types[c]))
        return pa.Table.from_arrays(cols, schema=work_schema)

    def tag(side: int, rename: dict[str, str] | None):
        def fn(batch: pa.Table) -> pa.Table:
            if rename:
                batch = batch.rename_columns([rename.get(c, c) for c in batch.column_names])
            if chunk_us is None:
                return _aligned(batch, side, None)
            if side == 0:
                us = _us_np(batch.column(point_col).to_numpy(zero_copy_only=False))
                return _aligned(batch, side, us // chunk_us)
            # replicate each interval into every chunk it overlaps
            lo_c = _us_np(batch.column(out_lo).to_numpy(zero_copy_only=False)) // chunk_us
            hi_c = _us_np(batch.column(out_hi).to_numpy(zero_copy_only=False)) // chunk_us
            counts = np.clip(hi_c - lo_c + 1, 0, None)
            if counts.size and counts.max() > max_chunks_per_interval:
                raise ValueError(
                    f"range_join: an interval spans {int(counts.max())} chunks "
                    f"(> {max_chunks_per_interval}); pick a coarser chunk_us"
                )
            idx = np.repeat(np.arange(len(counts)), counts)
            csum = np.concatenate([[0], np.cumsum(counts)[:-1]])
            ck = np.repeat(lo_c, counts) + (
                np.arange(int(counts.sum())) - np.repeat(csum, counts)
            )
            return _aligned(batch.take(pa.array(idx)), side, ck)

        return fn

    def merge_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        lsel = lcols if chunk_us is None else ["__chunk"] + lcols
        rsel = [by] + r_value if chunk_us is None else ["__chunk", by] + r_value
        lhs = group.filter(pc.equal(side, 0)).select(lsel).to_pandas()
        rhs = group.filter(pc.equal(side, 1)).select(rsel).to_pandas()
        merged = lhs.merge(rhs, on=merge_keys)
        mask = (merged[point_col] >= merged[out_lo]) & (merged[point_col] <= merged[out_hi])
        return pa.Table.from_pandas(
            merged[mask][all_cols], schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    from cartography_ray.runtime import drop_empty_blocks

    lp = left.map_batches(tag(0, None), batch_format="pyarrow")
    rp = right.map_batches(tag(1, r_renamed), batch_format="pyarrow")
    refs, n_rows, n_bytes = _nonempty_refs(lp.union(rp))
    if not refs:
        return _empty_table_ds(out_schema)
    return drop_empty_blocks(
        _local_or_shuffle(refs, n_rows, n_bytes, merge_bucket, num_partitions)
    )
