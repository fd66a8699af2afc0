"""Task-parallel spill: checkpoint files → partitioned spill → compaction.

Why raw Ray tasks here (and only here): the materialize phase fans a few
checkpoint-backed streams out into (label, bucket) partition files. Driving
six concurrent ``Dataset.write_parquet`` pipelines from driver threads
serializes on the driver's GIL (measured: the phase sped up only 1.3×
from 8→32 CPUs); the same work as independent ``@ray.remote`` tasks over
checkpoint FILES is embarrassingly parallel and leaves the Dataset API in
place for everything the executor is good at (sort, actor pools, scans).

One task reads a chunk of checkpoint files ONCE and applies every stream
function that consumes that checkpoint (e.g. the sorted-turn files feed
turn nodes, conversation partials, and the per-turn edges in a single
read), then appends its rows to uniquely-named files under
``spill/<kind>/<label>/bucket=<k>/``. Compaction (store.py) then merges
each partition with the previous snapshot under MERGE semantics.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cartography_ray.state.store import stable_bucket


def _write_grouped(
    out: pa.Table,
    kind: str,
    label: str | None,
    spill_root: str,
    num_buckets: int,
    task_id: str,
    file_idx: int,
) -> None:
    """Group a stream-output table by (label, bucket) and append files."""
    if out.num_rows == 0:
        return
    key_col = "id" if kind == "nodes" else "src_id"
    bucket = stable_bucket(out.column(key_col), num_buckets)
    out = out.append_column("__bucket", bucket)
    import pandas as pd

    if kind == "edges" and label is None:
        group_keys = ["rel_label", "__bucket"]
    else:
        group_keys = ["__bucket"]
    idx = pd.DataFrame(
        {k: out.column(k).to_numpy(zero_copy_only=False) for k in group_keys}
    )
    for gkey, sub in idx.groupby(group_keys, sort=False):
        if not isinstance(gkey, tuple):
            gkey = (gkey,)
        if kind == "edges" and label is None:
            glabel, gbucket = str(gkey[0]), int(gkey[1])
        else:
            glabel, gbucket = label, int(gkey[0])
        part_dir = os.path.join(spill_root, kind, glabel, f"bucket={gbucket}")
        os.makedirs(part_dir, exist_ok=True)
        sel = out.take(pa.array(sub.index.to_numpy())).drop_columns(["__bucket"])
        pq.write_table(
            sel, os.path.join(part_dir, f"{task_id}-{file_idx}.parquet")
        )


def _lazy_spill_task():
    import ray

    @ray.remote(num_cpus=1)
    def spill_files(
        files: list[str],
        stream_fns: list,
        spill_root: str,
        num_buckets: int,
        extra=None,
    ) -> int:
        """files: checkpoint parquet files; stream_fns: [(kind, label|None,
        fn)] applied to each file's table. Output is buffered per stream
        across the task's files and written ONCE per partition — file
        count is partitions × tasks, not partitions × tasks × files.

        ``extra``: optional broadcast value passed as a TOP-LEVEL task
        argument (callers pass an ObjectRef; Ray auto-resolves it with
        proper ref-counting — capturing refs inside pickled closures
        triggered raylet refcount crashes under load). Stream fns marked
        ``_wants_extra`` receive it as a second argument."""
        task_id = uuid.uuid4().hex[:12]
        rows = 0
        buffers: dict[int, list[pa.Table]] = {i: [] for i in range(len(stream_fns))}
        for f in files:
            tbl = pq.read_table(f)
            for i, (kind, label, fn) in enumerate(stream_fns):
                out = fn(tbl, extra) if getattr(fn, "_wants_extra", False) else fn(tbl)
                rows += out.num_rows
                if out.num_rows:
                    buffers[i].append(out)
        for i, (kind, label, fn) in enumerate(stream_fns):
            if buffers[i]:
                merged = pa.concat_tables(buffers[i], promote_options="default")
                _write_grouped(merged, kind, label, spill_root, num_buckets, task_id, i)
        return rows

    return spill_files


class _SpillHolder:
    _task = None

    @classmethod
    def get(cls):
        if cls._task is None:
            cls._task = _lazy_spill_task()
        return cls._task


def submit_spill(
    plans: list[tuple[list[str], list]],
    spill_root: str,
    num_buckets: int,
    files_per_task: int | None = None,
    extra=None,
) -> list:
    """Submit spill tasks (non-blocking); returns futures. Lets the caller
    overlap spills with other pipeline phases. ``extra``: optional
    broadcast ObjectRef handed to ``_wants_extra`` stream fns."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    task = _SpillHolder.get()
    futures = []
    for files, fns in plans:
        fpt = files_per_task or max(1, len(files) // (2 * ncpu))
        for i in range(0, len(files), fpt):
            futures.append(
                task.remote(files[i : i + fpt], fns, spill_root, num_buckets, extra)
            )
    return futures


def write_small_tables(
    small_tables: list[tuple[str, str | None, pa.Table]],
    spill_root: str,
    num_buckets: int,
) -> int:
    """Driver-resident tables (e.g. alias edges from the canonical label
    map) written directly into the spill tree."""
    total = 0
    for kind, label, tbl in small_tables:
        total += tbl.num_rows
        _write_grouped(tbl, kind, label, spill_root, num_buckets, "driver", 0)
    return total


def run_spill(
    plans: list[tuple[list[str], list]],
    small_tables: list[tuple[str, str | None, pa.Table]],
    spill_root: str,
    num_buckets: int,
    files_per_task: int | None = None,
) -> int:
    """Blocking convenience wrapper: submit + small tables + wait."""
    import ray

    futures = submit_spill(plans, spill_root, num_buckets, files_per_task)
    total = write_small_tables(small_tables, spill_root, num_buckets)
    total += int(sum(ray.get(futures)))
    return total
