"""Generic resumable partitioned Parquet sink for query results.

The brief's resumable-output contract, exposed as a first-class utility
(the KG store implements the same idea internally with per-(label,
bucket) manifests — `state/store.py` / `state/spill.py`; this is the
standalone version for ANY Dataset):

- rows hash-partition by a key column into a FIXED directory layout
  ``root/part=<k>/`` (``stable_bucket``: keyed siphash, stable across
  processes and nodes — resume correctness depends on it);
- each partition is written tmp-then-atomic-rename and sealed with a
  ``_SUCCESS`` marker carrying the caller's input fingerprint + row
  count;
- a re-run with the same fingerprint SKIPS sealed partitions before the
  data ever enters the pipeline (the skip is a per-batch filter on the
  partition id — finished partitions' rows are dropped map-side, they
  never shuffle), rewrites unsealed ones, and a changed fingerprint
  invalidates everything;
- never one giant file: output parallelism is the partition count.

Kill-rerun safety: a task that dies mid-write leaves only an orphaned
``.tmp-*`` directory (swept on the next run); ``os.replace``/``rename``
of the partition directory is atomic on POSIX, and the marker is only
written after the rename, so a partition is either absent, stale (no
marker ⇒ rewritten), or complete.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cartography_ray.state.store import stable_bucket

_MARKER = "_SUCCESS"


def _part_dir(root: str, k: int) -> str:
    return os.path.join(root, f"part={k}")


def _marker_ok(root: str, k: int, fingerprint: str) -> bool:
    p = os.path.join(_part_dir(root, k), _MARKER)
    try:
        with open(p) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (OSError, ValueError):
        return False


def write_partitioned(
    ds,
    root: str,
    partition_col: str,
    num_parts: int = 64,
    fingerprint: str = "",
    num_partitions: int | None = None,
) -> dict:
    """Write ``ds`` under ``root/part=<k>/`` (k = stable hash of
    ``partition_col`` mod ``num_parts``), skipping partitions already
    sealed with this ``fingerprint``. Returns ``{"written", "skipped",
    "rows"}``. One hash shuffle (the partition grouping) — each
    partition's rows land in exactly one write task, so output files
    are per-partition and the sink is idempotent under kill-rerun."""
    os.makedirs(root, exist_ok=True)
    # sweep orphaned tmp dirs from a previous crashed run, AND partition
    # dirs sealed under a DIFFERENT fingerprint: a changed input must
    # invalidate every old partition — including ones the new dataset
    # sends zero rows to, which would otherwise survive on disk and leak
    # stale rows into read_partitioned (caught by review repro)
    for name in os.listdir(root):
        p = os.path.join(root, name)
        if name.startswith(".tmp-"):
            shutil.rmtree(p, ignore_errors=True)
        elif name.startswith("part="):
            try:
                k = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if not _marker_ok(root, k, fingerprint):
                shutil.rmtree(p, ignore_errors=True)

    done = frozenset(
        k for k in range(num_parts) if _marker_ok(root, k, fingerprint)
    )
    if len(done) == num_parts:
        return {"written": 0, "skipped": num_parts, "rows": 0}

    def tag_and_prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pk = pc.cast(stable_bucket(t.column(partition_col), num_parts), pa.int64())
        t = t.append_column("__pk", pk)
        if done:
            import numpy as np

            keep = ~np.isin(
                t.column("__pk").to_numpy(zero_copy_only=False),
                np.fromiter(done, dtype="int64"),
            )
            t = t.filter(pa.array(keep))
        return t

    report_schema = pa.schema([("part", pa.int64()), ("rows", pa.int64())])

    def write_part(group: pd.DataFrame) -> pa.Table:
        if not len(group):
            return report_schema.empty_table()
        k = int(group["__pk"].iloc[0])
        body = group.drop(columns="__pk")
        tmp = os.path.join(root, f".tmp-{k}-{uuid.uuid4().hex}")
        os.makedirs(tmp)
        pq.write_table(
            pa.Table.from_pandas(body, preserve_index=False).replace_schema_metadata(
                None
            ),
            os.path.join(tmp, "data.parquet"),
        )
        final = _part_dir(root, k)
        shutil.rmtree(final, ignore_errors=True)  # stale (unsealed) attempt
        os.replace(tmp, final)
        with open(os.path.join(final, _MARKER), "w") as f:
            json.dump({"fingerprint": fingerprint, "rows": len(body)}, f)
        # clean Arrow out of a pandas UDF (CLAUDE.md pyarrow-16 convention)
        return pa.table(
            {"part": pa.array([k], pa.int64()), "rows": pa.array([len(body)], pa.int64())}
        )

    from cartography_ray.runtime import drop_empty_blocks

    tagged = drop_empty_blocks(
        ds.map_batches(tag_and_prune, batch_format="pyarrow")
    ).materialize()  # consumed by the count guard AND the write shuffle
    if tagged.count() == 0:
        # every remaining row belonged to sealed partitions (or the input
        # is empty): seal nothing new
        return {"written": 0, "skipped": len(done), "rows": 0}
    report = (
        tagged.groupby("__pk", num_partitions=num_partitions)
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
    )
    return {
        "written": int(len(report)),
        "skipped": len(done),
        "rows": int(report["rows"].sum()),
    }


def read_partitioned(root: str, **read_kwargs):
    """Companion scan: read every sealed partition (files only — the
    ``_SUCCESS`` markers are filtered out)."""
    import ray.data

    files = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        if name.startswith("part=") and os.path.exists(os.path.join(d, _MARKER)):
            files.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    if not files:
        # nothing sealed yet (fresh root / crashed first run): an empty
        # result, not a read_parquet([]) ValueError
        return ray.data.from_arrow(pa.table({}))
    # partitioning=None: the part=<k> directory names would otherwise be
    # hive-inferred into a spurious 'part' column
    read_kwargs.setdefault("partitioning", None)
    return ray.data.read_parquet(files, **read_kwargs)
