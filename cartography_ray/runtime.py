"""DataContext configuration for this engine.

Centralizes the Ray Data execution knobs every entry point needs:

- progress bars / verbose logging off (bench + test hygiene),
- **hash-based shuffle**: the default sort-based pull shuffle in Ray
  2.49 intermittently deadlocks in ``sample_boundaries`` /
  ``pull_based_shuffle_task_scheduler`` when several pipelines that share
  lineage execute in one session (observed repeatedly in this sandbox).
  The hash-shuffle strategy streams through actor aggregators instead and
  is the scale-path anyway (no global sample/boundary stage),
- aggregator-pool sizing proportional to session CPUs — the default
  (64 aggregators wanting 16 CPUs) starves an 8-CPU session into a stall.

``configure()`` is idempotent; call it from any entry point after
``ray.init`` (it never calls ``ray.init`` itself — the driver owns the
session).
"""

from __future__ import annotations

import os


def _stub_fsspec_http() -> None:
    """fsspec's HTTP filesystem needs aiohttp (absent here); its import
    failure raises plain ImportError under concurrent imports, which
    Ray's path_util only catches as ModuleNotFoundError. Register a
    sentinel module once so concurrent write_parquet calls never race."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except Exception:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel only — never instantiated (no network)
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def patch_pandas_block_metadata() -> None:
    """Make every block schema hashable by stripping pandas metadata.

    pyarrow 16's ``Schema.__hash__`` raises ``unhashable type: 'dict'`` on
    any schema carrying the ``b'pandas'`` metadata blob, so Ray's
    identical-schema early-exit in ``unify_schemas`` never fires for blocks
    that passed through a pandas conversion — every shuffle worker falls
    back to the expensive field-by-field unify and logs "Failed to hash
    the schemas (for deduplication)" per concat. Ray's own pandas→Arrow
    block conversion (``PandasBlockAccessor.to_arrow``) attaches that
    metadata, so strip it at the conversion boundary. Idempotent; applied
    at package import time so shuffle workers that deserialize our UDFs
    (and therefore import this package) are patched too.
    """
    from ray.data._internal.pandas_block import PandasBlockAccessor

    if getattr(PandasBlockAccessor, "_graft_meta_stripped", False):
        return
    orig = PandasBlockAccessor.to_arrow

    def to_arrow(self):
        t = orig(self)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    PandasBlockAccessor.to_arrow = to_arrow
    PandasBlockAccessor._graft_meta_stripped = True


def configure(quiet: bool = True) -> None:
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    _stub_fsspec_http()
    patch_pandas_block_metadata()

    ctx = DataContext.get_current()
    if quiet:
        import logging

        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
        for name in ("ray.data", "ray.air", "ray"):
            logging.getLogger(name).setLevel(logging.ERROR)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    else:
        ncpu = os.cpu_count() or 8
    # the aggregator pool is the reduce side of every shuffle — it MUST
    # scale with the session CPUs or shuffles flatline (observed: a fixed
    # 4-aggregator cap made 8→32 CPUs a no-op for groupby stages)
    ctx.max_hash_shuffle_aggregators = max(2, ncpu // 2)
    # 1×CPUs, not 2×: every shuffle pays ~60 ms/partition of fixed cost
    # (measured, BASELINE.md), so the default parallelism is the per-op
    # tax floor; data-sized call sites pass groupby(num_partitions=...)
    # via runtime.shuffle_partitions instead
    ctx.default_hash_shuffle_parallelism = max(16, ncpu)
    ctx.min_hash_shuffle_aggregator_wait_time_in_s = 60


def shuffle_partitions(
    n_rows: int | None = None,
    n_bytes: int | None = None,
    floor: int = 8,
    rows_per_partition: int = 200_000,
    bytes_per_partition: int = 32 << 20,
) -> int | None:
    """Partition count for a hash shuffle, sized to the DATA, capped by
    the CLUSTER.

    Ray 2.49's hash shuffle pays a fixed per-partition cost (~60 ms/
    partition + ~1.5 s pool setup measured on this box), and the session
    default (2×CPUs) charges a 64-partition tax to every shuffle no
    matter how small — the dominant cost of the whole dedup catalogue at
    bench scale. Callers that KNOW an input-size hint (a materialized
    stage, an input file size) should pass it and forward the result as
    ``groupby(..., num_partitions=...)``; unhinted call sites keep the
    session default, which still scales with cluster size at 100 TB.
    Returns None when no hint is given (caller keeps the default).
    """
    import ray

    if n_rows is None and n_bytes is None:
        return None
    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    else:
        ncpu = os.cpu_count() or 8
    cap = max(16, 2 * ncpu)
    need = [
        -(-n_rows // rows_per_partition) if n_rows is not None else 0,
        -(-n_bytes // bytes_per_partition) if n_bytes is not None else 0,
    ]
    return int(min(cap, max(floor, *need)))


def known_input_bytes(ds) -> int | None:
    """A dataset's size when it is knowable WITHOUT executing anything:
    file-backed (parquet/json footers on disk) or already materialized.
    Returns None otherwise — callers use this to gate adaptive fast
    paths (e.g. the local-merge elision) without ever adding a barrier
    to an unknown-size streaming plan."""
    import os

    # Materialized first: size_bytes() is the EXACT in-memory Arrow
    # footprint. A materialized dataset still reports its original
    # input_files() lineage, whose compressed-parquet size both
    # under-measures (snappy is 3-10× smaller than Arrow) and ignores
    # any filtering between the file and the materialized result.
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            return int(ds.size_bytes())
    except Exception:
        pass
    try:
        files = ds.input_files()
        if files:
            return sum(os.path.getsize(f) for f in files)
    except Exception:
        pass
    return None


def drop_empty_blocks(ds):
    """Strip the schema-less empty blocks Ray 2.49's shuffles emit.

    Hash-shuffle groupby/aggregate ops emit one block per partition, and
    empty partitions come out as zero-column blocks; ``map_batches`` skips
    its UDF on empty blocks and forwards them untouched, so they poison
    any LATER shuffle ("No match for FieldRef ..."). This rebuilds the
    dataset from the non-empty block refs — block data never leaves the
    object store (no driver copy); only metadata is inspected. Call it on
    a shuffle output before feeding another shuffle.
    """
    import ray.data

    mat = ds.materialize()
    bundles = list(mat.iter_internal_ref_bundles())
    refs = [
        blk
        for bundle in bundles
        for blk, meta in zip(bundle.block_refs, bundle.metadata)
        if (meta.num_rows or 0) > 0
    ]
    if not refs:
        return mat
    return ray.data.from_arrow_refs(refs)


def to_pandas_typed(ds):
    """``Dataset.to_pandas`` that keeps the schema when the dataset is
    empty.

    Ray 2.49's ``to_pandas`` concatenates zero record batches for an
    all-empty dataset and hands back a column-less DataFrame even though
    ``ds.schema()`` is fully typed (e.g. a join of two empty epochs).
    Fall back to an empty typed frame built from the dataset schema so
    downstream column access doesn't KeyError on legitimately-empty
    results.
    """
    import pyarrow as pa

    df = ds.to_pandas()
    if df.shape[1] == 0:
        schema = ds.schema(fetch_if_missing=True)
        base = getattr(schema, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base.empty_table().to_pandas()
    return df
