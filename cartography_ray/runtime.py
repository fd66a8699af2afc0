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


def configure(quiet: bool = True) -> None:
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", os.cpu_count() or 8))
    else:
        ncpu = os.cpu_count() or 8
    # keep each shuffle's aggregator pool well under the session CPUs so
    # two concurrent shuffles plus map stages never starve each other
    ctx.max_hash_shuffle_aggregators = max(2, min(8, ncpu // 2))
    ctx.default_hash_shuffle_parallelism = max(16, 2 * ncpu)
    ctx.min_hash_shuffle_aggregator_wait_time_in_s = 60


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
