"""GraphStore — partitioned-Parquet node/edge tables with MERGE semantics.

Replaces the reference's Neo4j store. Layout:

    <root>/nodes/<Label>/bucket=<k>/part.parquet
    <root>/nodes/<Label>/bucket=<k>/manifest.json
    <root>/edges/<RelLabel>/bucket=<k>/{part.parquet,manifest.json}

Buckets are ``hash(id) % num_buckets`` (edges: hash(src_id)); a single
``groupby(bucket).map_groups`` shuffle performs BOTH the MERGE-by-id
upsert and the physical clustering, because all rows of one id land in one
bucket. Per-bucket files are written atomically (tmp + rename) and a
manifest records ``update_tag`` + row count, giving:

- **resumability**: a rerun with the same update tag skips buckets whose
  manifest already carries that tag (rows filtered out before the shuffle),
- **lineage/metrics**: manifests are the per-partition triple manifests
  the north rule requires.

MERGE semantics reproduced from the reference (querybuilder.py:1266-1279):
upsert by ``id``; ``firstseen`` is write-once (min across epochs);
every other property is last-writer-wins by ``lastupdated`` (deterministic
lexicographic tie-break within one epoch).

Cleanup reproduces cartography/graph/cleanupbuilder.py:16-120's four cases
as anti-joins over update tags (see ``cleanup_nodes`` / ``cleanup_edges``):
stale = ``lastupdated <> $UPDATE_TAG``; *scoped* cleanup deletes stale rows
only inside sub-resources touched by the current run (``_sub_id`` column),
*unscoped* deletes all stale rows; rel-only cleanup leaves nodes in place.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cartography_ray.core.context import IngestContext

EDGE_KEY = ["src_id", "rel_label", "dst_id"]


def _lazy_cleanup_task():
    import ray

    @ray.remote(num_cpus=1)
    def cleanup_parts(
        parts: list,
        tag: int,
        scoped: bool,
        subs,
        eq_filter: list | None = None,
        restrict=None,
        restrict_cols: list | None = None,
        collect_col: str | None = None,
        subs_dir: str | None = None,
        subs_buckets: int | None = None,
    ):
        # `subs` / `restrict` arrive as resolved broadcast values (Ray
        # auto-resolves ObjectRef arguments): pa.Arrays or None.
        # Chunked: one task handles several bucket files (tiny per-file
        # work makes per-task scheduling the dominant cost otherwise).
        #
        # eq_filter: [(col, value)] equality conjuncts — the matchlink
        # cleanup scope (_sub_resource_label/_sub_resource_id; reference
        # cleanupbuilder.py:603-667).
        # restrict/restrict_cols: row eligible only if ANY restrict_col
        # value is in `restrict` — cascade-delete children / detach edges.
        # collect_col: also return the deleted rows' values of this column.
        #
        # subs_dir/subs_buckets: the SCALE path for scoped membership
        # (VERDICT r03 item 1) — instead of a broadcast pa.Array of every
        # synced sub-resource id (corpus-∝, driver-resident), the run
        # writes membership as a Parquet side table hash-partitioned by
        # stable_bucket(sub_id, subs_buckets); each task streams ONLY the
        # membership buckets its parts' _sub_id values hash to, one bucket
        # at a time. Memory bound = one part + a small bucket cache, never
        # the full membership.
        deleted = 0
        collected: list = []
        member_cache: dict[int, pa.Array] = {}

        def _bucketed_in_scope(sub_col) -> pa.Array:
            vals = pc.fill_null(pc.cast(sub_col, pa.string()), "")
            bk = stable_bucket(vals, subs_buckets).to_numpy()
            np_vals = vals.to_numpy(zero_copy_only=False)
            out = np.zeros(len(bk), dtype=bool)
            for k in np.unique(bk):
                k = int(k)
                members = member_cache.get(k)
                if members is None:
                    files = sorted(
                        glob.glob(os.path.join(subs_dir, f"bucket={k}", "*.parquet"))
                    )
                    members = (
                        pc.unique(
                            pa.concat_tables(
                                [pq.read_table(f, columns=["sub_id"]) for f in files]
                            ).column("sub_id")
                        )
                        if files
                        else pa.array([], pa.string())
                    )
                    if len(member_cache) >= 32:  # bound task memory
                        member_cache.pop(next(iter(member_cache)))
                    member_cache[k] = members
                idx = np.nonzero(bk == k)[0]
                hit = pc.is_in(pa.array(np_vals[idx], pa.string()), members)
                out[idx] = pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
            return pa.array(out)

        for part in parts:
            tbl = pq.read_table(part)
            stale = pc.not_equal(tbl.column("lastupdated"), pa.scalar(tag, pa.int64()))
            if scoped:
                if "_sub_id" not in tbl.column_names or (subs is None and subs_dir is None):
                    continue
                if subs_dir is not None:
                    in_scope = _bucketed_in_scope(tbl.column("_sub_id"))
                else:
                    in_scope = pc.is_in(tbl.column("_sub_id"), subs)
                stale = pc.and_(stale, pc.fill_null(in_scope, False))
            if eq_filter:
                for col, val in eq_filter:
                    if col not in tbl.column_names:
                        stale = None
                        break
                    stale = pc.and_(
                        stale,
                        pc.fill_null(
                            pc.equal(pc.cast(tbl.column(col), pa.string()), pa.scalar(str(val))),
                            False,
                        ),
                    )
                if stale is None:
                    continue
            if restrict is not None and restrict_cols:
                hit = None
                for col in restrict_cols:
                    m = pc.fill_null(
                        pc.is_in(pc.cast(tbl.column(col), pa.string()), restrict), False
                    )
                    hit = m if hit is None else pc.or_(hit, m)
                stale = pc.and_(stale, hit)
            stale = pc.fill_null(stale, False)
            n_stale = pc.sum(pc.cast(stale, pa.int64())).as_py() or 0
            if not n_stale:
                continue
            if collect_col is not None:
                collected.extend(
                    pc.cast(tbl.filter(stale).column(collect_col), pa.string()).to_pylist()
                )
            kept = tbl.filter(pc.invert(stale))
            tmp = part + f".tmp.{os.getpid()}"
            pq.write_table(kept, tmp)
            os.replace(tmp, part)
            deleted += int(n_stale)
        return (deleted, collected)

    return cleanup_parts


def _lazy_detach_task():
    import ray

    @ray.remote(num_cpus=1)
    def detach_parts(parts: list, ids) -> int:
        """DETACH analogue: delete edges whose src OR dst is a deleted
        node id, regardless of staleness (reference DETACH DELETE —
        cleanupbuilder.py:336-342 deletes a node's rels with it)."""
        deleted = 0
        for part in parts:
            tbl = pq.read_table(part)
            hit = pc.or_(
                pc.fill_null(pc.is_in(pc.cast(tbl.column("src_id"), pa.string()), ids), False),
                pc.fill_null(pc.is_in(pc.cast(tbl.column("dst_id"), pa.string()), ids), False),
            )
            n = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
            if not n:
                continue
            kept = tbl.filter(pc.invert(hit))
            tmp = part + f".tmp.{os.getpid()}"
            pq.write_table(kept, tmp)
            os.replace(tmp, part)
            deleted += int(n)
        return deleted

    return detach_parts


class _DetachHolder:
    _task = None

    @classmethod
    def get(cls):
        if cls._task is None:
            cls._task = _lazy_detach_task()
        return cls._task


class _TaskHolder:
    _task = None

    @classmethod
    def get(cls):
        if cls._task is None:
            cls._task = _lazy_cleanup_task()
        return cls._task


def _lazy_compact_many_task():
    import ray

    @ray.remote(num_cpus=1)
    def compact_many(items: list, root: str, tag: int) -> list:
        """Compaction for materialize_many: items are
        (kind, label, bucket, [spill_dirs]) — multiple spill dirs when
        mixed edge streams hit the same (rel, bucket)."""
        out = []
        for kind, label, bucket, sdirs in items:
            bdir = os.path.join(root, kind, label, f"bucket={bucket}")
            os.makedirs(bdir, exist_ok=True)
            part = os.path.join(bdir, "part.parquet")
            mf_path = os.path.join(bdir, "manifest.json")
            if os.path.exists(mf_path):
                try:
                    if json.load(open(mf_path)).get("update_tag") == tag:
                        out.append((kind, label, bucket, 0, tag))
                        continue
                except (json.JSONDecodeError, OSError):
                    pass
            files = sorted(
                f for d in sdirs for f in glob.glob(os.path.join(d, "*.parquet"))
            )
            new = pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="default"
            ).to_pandas()
            if kind == "edges":
                if "rel_label" not in new.columns:
                    # hive-partitioned spills strip the column — restore it
                    new.insert(1, "rel_label", label)
                key_cols = EDGE_KEY
            else:
                key_cols = ["id"]
            if os.path.exists(part):
                prev = pq.read_table(part).to_pandas()
                new = pd.concat([prev, new], ignore_index=True)
            merged = _upsert_pdf(new, key_cols)
            tmp = part + f".tmp.{os.getpid()}"
            pq.write_table(pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None), tmp)
            os.replace(tmp, part)
            manifest = {
                "kind": kind, "label": label, "bucket": bucket,
                "rows": int(len(merged)), "update_tag": tag,
            }
            mtmp = os.path.join(bdir, f"manifest.json.tmp.{os.getpid()}")
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, mf_path)
            out.append((kind, label, bucket, int(len(merged)), tag))
        return out

    return compact_many


class _CompactManyHolder:
    _task = None

    @classmethod
    def get(cls):
        if cls._task is None:
            cls._task = _lazy_compact_many_task()
        return cls._task


def stable_bucket(ids: pa.Array | pa.ChunkedArray, num_buckets: int) -> pa.Array:
    """Deterministic (cross-process) hash bucket of a string id column.

    Vectorized: pandas' keyed siphash (fixed default key ⇒ stable across
    processes and nodes, which resume correctness depends on).
    """
    arr = pc.cast(ids, pa.string()).to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(arr, categorize=False)
    return pa.array((h % num_buckets).astype(np.int32))


# Columns that may legitimately VARY between duplicate-key rows within one
# epoch and must win by max (MERGE-as-aggregate; see make_conv_nodes_fn).
# Everything else is identical across same-(key, lastupdated) rows by
# construction, so it needn't join the sort key (sorting by every column
# was the compaction hot spot at 10M+ rows).
_UPSERT_TIE_COLS = ("n_turns",)


def _upsert_pdf(pdf: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """MERGE reduce inside one bucket: min firstseen, last-writer-wins rest."""
    if pdf.empty:
        return pdf
    order_cols = key_cols + ["lastupdated"]
    tie = [c for c in _UPSERT_TIE_COLS if c in pdf.columns]
    pdf = pdf.sort_values(order_cols + tie, kind="mergesort")
    firstseen = pdf.groupby(key_cols, sort=False)["firstseen"].transform("min")
    pdf = pdf.assign(firstseen=firstseen)
    return pdf.drop_duplicates(key_cols, keep="last")


class GraphStore:
    def __init__(self, root: str, num_buckets: int = 32) -> None:
        self.root = root
        self.num_buckets = num_buckets

    # ------------------------------------------------------------------ paths
    def _dir(self, kind: str, label: str) -> str:
        return os.path.join(self.root, kind, label)

    def _bucket_dir(self, kind: str, label: str, bucket: int) -> str:
        return os.path.join(self._dir(kind, label), f"bucket={bucket}")

    def done_buckets(self, kind: str, label: str, update_tag: int) -> set[int]:
        done = set()
        for mf in glob.glob(os.path.join(self._dir(kind, label), "bucket=*", "manifest.json")):
            try:
                meta = json.load(open(mf))
            except (json.JSONDecodeError, OSError):
                continue
            if meta.get("update_tag") == update_tag:
                done.add(int(meta["bucket"]))
        return done

    def manifests(self, kind: str, label: str) -> list[dict]:
        out = []
        for mf in sorted(glob.glob(os.path.join(self._dir(kind, label), "bucket=*", "manifest.json"))):
            try:
                out.append(json.load(open(mf)))
            except (json.JSONDecodeError, OSError):
                continue
        return out

    # ------------------------------------------------------------ materialize
    def _materialize(self, kind: str, label: str, ds, ctx: IngestContext, key_cols: list[str]):
        """Upsert a Dataset into the label's bucketed table. Returns stats.

        One groupby(bucket) shuffle; each group merges with the previous
        bucket snapshot (epoch N-1) and rewrites its file atomically.
        Buckets already finished for this update tag are skipped (resume).
        """
        from cartography_ray.runtime import drop_empty_blocks

        num_buckets = self.num_buckets
        done = self.done_buckets(kind, label, ctx.update_tag)
        root = self.root
        tag = ctx.update_tag
        bucket_key = key_cols[0]
        # node/edge streams may derive from upstream shuffles; strip the
        # schema-less empty blocks those emit before our own groupby
        ds = drop_empty_blocks(ds)

        def add_bucket(batch: pa.Table) -> pa.Table:
            b = stable_bucket(batch.column(bucket_key), num_buckets)
            out = batch.append_column("bucket", b)
            if done:
                mask = pc.invert(pc.is_in(out.column("bucket"), pa.array(sorted(done), pa.int32())))
                out = out.filter(mask)
            return out

        # 0-row map outputs surface as schema-less blocks (Ray 2.49), so
        # sanitize after the done-bucket filter; short-circuit a fully
        # resumed materialize (every bucket already written for this tag).
        bucketed = drop_empty_blocks(ds.map_batches(add_bucket, batch_format="pyarrow"))
        if bucketed.count() == 0:
            return pd.DataFrame({"bucket": [], "rows": [], "update_tag": []})

        def merge_write(group: pd.DataFrame) -> pd.DataFrame:
            if group.empty:
                return pd.DataFrame({"bucket": [], "rows": [], "update_tag": []})
            bucket = int(group["bucket"].iloc[0])
            bdir = os.path.join(root, kind, label, f"bucket={bucket}")
            os.makedirs(bdir, exist_ok=True)
            part = os.path.join(bdir, "part.parquet")
            new = group.drop(columns=["bucket"])
            if os.path.exists(part):
                prev = pq.read_table(part).to_pandas()
                new = pd.concat([prev, new], ignore_index=True)
            merged = _upsert_pdf(new, key_cols)
            tmp = part + f".tmp.{os.getpid()}"
            pq.write_table(pa.Table.from_pandas(merged, preserve_index=False).replace_schema_metadata(None), tmp)
            os.replace(tmp, part)
            manifest = {
                "kind": kind,
                "label": label,
                "bucket": bucket,
                "rows": int(len(merged)),
                "update_tag": tag,
            }
            mtmp = os.path.join(bdir, f"manifest.json.tmp.{os.getpid()}")
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, os.path.join(bdir, "manifest.json"))
            return pd.DataFrame(
                {"bucket": [bucket], "rows": [len(merged)], "update_tag": [tag]}
            )

        # shuffle partitions = bucket count (≤ session default): groups
        # are exactly the buckets, so extra partitions are pure fixed cost
        stats = (
            bucketed.groupby("bucket", num_partitions=max(1, min(num_buckets, 64)))
            .map_groups(merge_write, batch_format="pandas")
            .to_pandas()
        )
        return stats

    def materialize_nodes(self, label: str, ds, ctx: IngestContext):
        return self._materialize("nodes", label, ds, ctx, ["id"])

    def materialize_edges(self, rel_label: str, ds, ctx: IngestContext):
        return self._materialize("edges", rel_label, ds, ctx, EDGE_KEY)

    def materialize_many(
        self,
        node_streams: dict,
        edge_streams: dict,
        ctx: IngestContext,
        max_spill_threads: int = 6,
    ) -> pd.DataFrame:
        """Materialize ALL node + edge streams of a sync in two phases:

        1. **spill** — every stream gets its own streaming
           ``write_parquet(partition_cols=...)`` pass into a scratch dir
           (nodes partition by ``bucket``; edge streams may be mixed and
           partition by ``(rel_label, bucket)``). The spills run
           CONCURRENTLY from driver threads: they are map-only pipelines,
           so wall time is max(stream) instead of sum(stream) — Ray's
           UnionOperator would serialize them.
        2. **compact** — one wave of Ray tasks merges each (label, bucket)
           partition with the previous snapshot under MERGE semantics and
           stamps its manifest (the resume unit).

        Returns a stats frame (kind, label, bucket, rows, update_tag).
        """
        import shutil
        import uuid
        from concurrent.futures import ThreadPoolExecutor

        import ray

        num_buckets = self.num_buckets
        root = self.root
        tag = ctx.update_tag
        spill_root = os.path.join(root, "_spill", f"sync-{tag}-{uuid.uuid4().hex[:8]}")
        os.makedirs(spill_root, exist_ok=True)

        def spill_nodes(label: str, ds):
            done = sorted(self.done_buckets("nodes", label, tag))

            def add_bucket(batch: pa.Table) -> pa.Table:
                out = batch.append_column("bucket", stable_bucket(batch.column("id"), num_buckets))
                if done:
                    mask = pc.invert(
                        pc.is_in(out.column("bucket"), pa.array(done, pa.int32()))
                    )
                    out = out.filter(mask)
                return out

            ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
                os.path.join(spill_root, "nodes", label), partition_cols=["bucket"]
            )

        def spill_edges(name: str, ds):
            def add_bucket(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "bucket", stable_bucket(batch.column("src_id"), num_buckets)
                )

            ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
                os.path.join(spill_root, "edges", name),
                partition_cols=["rel_label", "bucket"],
            )

        try:
            with ThreadPoolExecutor(max_workers=max_spill_threads) as ex:
                futs = [
                    ex.submit(spill_nodes, label, ds) for label, ds in node_streams.items()
                ] + [ex.submit(spill_edges, name, ds) for name, ds in edge_streams.items()]
                for f in futs:
                    f.result()

            # enumerate (kind, label, bucket) partitions across all spills;
            # mixed edge streams can hit the same (rel, bucket) from
            # different spill dirs — group them into one compaction item
            grouped: dict[tuple, list[str]] = {}
            for d in glob.glob(os.path.join(spill_root, "nodes", "*", "bucket=*")):
                label = os.path.basename(os.path.dirname(d)).split("=", 1)[-1]
                bucket = int(os.path.basename(d).split("=", 1)[1])
                grouped.setdefault(("nodes", label, bucket), []).append(d)
            for d in glob.glob(os.path.join(spill_root, "edges", "*", "rel_label=*", "bucket=*")):
                rel = os.path.basename(os.path.dirname(d)).split("=", 1)[1]
                bucket = int(os.path.basename(d).split("=", 1)[1])
                grouped.setdefault(("edges", rel, bucket), []).append(d)
            items = [(k[0], k[1], k[2], dirs) for k, dirs in sorted(grouped.items())]
            if not items:
                return pd.DataFrame(columns=["kind", "label", "bucket", "rows", "update_tag"])
            task = _CompactManyHolder.get()
            chunk = max(1, (len(items) + 63) // 64)
            futures = [
                task.remote(items[i : i + chunk], root, tag)
                for i in range(0, len(items), chunk)
            ]
            rows: list[tuple] = []
            for res in ray.get(futures):
                rows.extend(res)
            return pd.DataFrame(rows, columns=["kind", "label", "bucket", "rows", "update_tag"])
        finally:
            shutil.rmtree(spill_root, ignore_errors=True)

    def compact_spill(self, spill_root: str, ctx: IngestContext) -> pd.DataFrame:
        """Compaction wave over a task-written spill tree
        (``spill/<kind>/<label>/bucket=<k>/*.parquet`` — see state/spill.py).
        Merges each partition with the previous snapshot under MERGE
        semantics and stamps manifests. Returns per-partition stats."""
        import ray

        grouped: dict[tuple, list[str]] = {}
        for d in glob.glob(os.path.join(spill_root, "*", "*", "bucket=*")):
            bucket = int(os.path.basename(d).split("=", 1)[1])
            label = os.path.basename(os.path.dirname(d))
            kind = os.path.basename(os.path.dirname(os.path.dirname(d)))
            grouped.setdefault((kind, label, bucket), []).append(d)
        items = [(k[0], k[1], k[2], dirs) for k, dirs in sorted(grouped.items())]
        if not items:
            return pd.DataFrame(columns=["kind", "label", "bucket", "rows", "update_tag"])
        task = _CompactManyHolder.get()
        chunk = max(1, (len(items) + 63) // 64)
        futures = [
            task.remote(items[i : i + chunk], self.root, ctx.update_tag)
            for i in range(0, len(items), chunk)
        ]
        rows: list[tuple] = []
        for res in ray.get(futures):
            rows.extend(res)
        return pd.DataFrame(rows, columns=["kind", "label", "bucket", "rows", "update_tag"])

    def merge_module_sync_metadata(
        self, ctx: IngestContext, group_type: str, group_id, synced_type: str
    ) -> pd.DataFrame:
        """ModuleSyncMetadata bookkeeping node per (group, synced_type) —
        the reference's sync-freshness tracking (util.py:362-428): MERGE
        on ``{group_type}_{group_id}_{synced_type}``, extra SyncMetadata
        label, firstseen write-once, lastupdated = this run's tag."""
        import ray.data

        tbl = pa.table(
            {
                "id": [f"{group_type}_{group_id}_{synced_type}"],
                "grouptype": [group_type],
                "groupid": [str(group_id)],
                "syncedtype": [synced_type],
                "_labels": ["ModuleSyncMetadata;SyncMetadata"],
                "lastupdated": pa.array([ctx.update_tag], pa.int64()),
                "firstseen": pa.array([ctx.update_tag], pa.int64()),
            }
        )
        return self.materialize_nodes(
            "ModuleSyncMetadata", ray.data.from_arrow(tbl), ctx
        )

    # ------------------------------------------------------------------- read
    def _read(self, kind: str, label: str) -> pa.Table | None:
        parts = sorted(glob.glob(os.path.join(self._dir(kind, label), "bucket=*", "part.parquet")))
        if not parts:
            return None
        return pa.concat_tables([pq.read_table(p) for p in parts], promote_options="default")

    def read_nodes(self, label: str) -> pa.Table | None:
        return self._read("nodes", label)

    def read_edges(self, rel_label: str) -> pa.Table | None:
        return self._read("edges", rel_label)

    def read_nodes_ds(self, label: str):
        import ray.data

        parts = sorted(glob.glob(os.path.join(self._dir("nodes", label), "bucket=*", "part.parquet")))
        return ray.data.read_parquet(parts) if parts else None

    def node_labels(self) -> list[str]:
        return sorted(os.path.basename(p) for p in glob.glob(os.path.join(self.root, "nodes", "*")))

    def edge_labels(self) -> list[str]:
        return sorted(os.path.basename(p) for p in glob.glob(os.path.join(self.root, "edges", "*")))

    # ---------------------------------------------------------------- cleanup
    def _cleanup(
        self,
        kind: str,
        label: str,
        ctx: IngestContext,
        scoped: bool,
        synced_sub_ids: set | None,
    ) -> int:
        """Delete stale rows (lastupdated <> tag). Returns rows deleted.

        scoped=True: only rows whose ``_sub_id`` is in ``synced_sub_ids``
        (the sub-resources touched by this run) are eligible — the analogue
        of the reference's tenant-scoped cleanup path
        (cleanupbuilder.py:244-383). scoped=False: global stale delete
        (cleanupbuilder.py:386-451).
        """
        import ray

        futures = self._cleanup_futures(kind, label, ctx, scoped, synced_sub_ids)
        return int(sum(n for n, _ in ray.get(futures)))

    def _cleanup_futures(
        self,
        kind: str,
        label: str,
        ctx: IngestContext,
        scoped: bool,
        synced_sub_ids: set | None,
        sub_ref=None,
        sub_dir: str | None = None,
        sub_buckets: int | None = None,
    ) -> list:
        import ray

        if scoped and synced_sub_ids is None and sub_ref is None and sub_dir is None:
            raise ValueError("scoped cleanup requires synced_sub_ids or a membership dir")
        parts = sorted(
            glob.glob(os.path.join(self._dir(kind, label), "bucket=*", "part.parquet"))
        )
        if not parts:
            return []
        if sub_ref is None and sub_dir is None:
            sub_ref = ray.put(
                pa.array(sorted(synced_sub_ids), pa.string()) if scoped else None
            )
        tag = ctx.update_tag
        task = _TaskHolder.get()
        chunk = 16
        return [
            task.remote(
                parts[i : i + chunk],
                tag,
                scoped,
                sub_ref,
                subs_dir=sub_dir if scoped else None,
                subs_buckets=sub_buckets if scoped else None,
            )
            for i in range(0, len(parts), chunk)
        ]

    @staticmethod
    def _mode(value) -> str:
        """Normalize a cleanup-mode value: True → 'scoped', False →
        'unscoped'; strings pass through ('scoped'|'unscoped'|'rels_only').

        The three node modes mirror the reference's cleanup cases
        (cleanupbuilder.py:16-120): scoped = Case 1 (delete stale nodes
        only inside synced sub-resources), unscoped = Case 4 (global
        stale delete), rels_only = Case 3 (nodes shared across
        sub-resources are NEVER deleted; only their stale rels are, via
        the edge-label entries).
        """
        if value is True:
            return "scoped"
        if value is False:
            return "unscoped"
        if value not in ("scoped", "unscoped", "rels_only"):
            raise ValueError(f"unknown cleanup mode: {value!r}")
        return value

    def cleanup_all(
        self,
        ctx: IngestContext,
        node_labels: dict,
        edge_labels: dict,
        synced_sub_ids: set | None = None,
        synced_sub_dir: str | None = None,
        synced_sub_buckets: int | None = None,
    ) -> dict[str, int]:
        """Run the whole cleanup epoch pass with ALL labels' per-bucket
        anti-join tasks in flight concurrently. label → mode
        (True/'scoped', False/'unscoped', 'rels_only' — nodes only).

        Membership can be passed EITHER as ``synced_sub_ids`` (a set,
        broadcast once — only for small/bounded memberships) OR as
        ``synced_sub_dir`` (a hash-bucketed Parquet side table written by
        the run's distributed sweep, bucketed with ``stable_bucket(sub_id,
        synced_sub_buckets)``) — the scale path: nothing corpus-sized ever
        lands on the driver."""
        import ray

        if synced_sub_dir is None and synced_sub_ids is None:
            raise ValueError("cleanup_all needs synced_sub_ids or synced_sub_dir")
        use_dir = synced_sub_dir is not None
        sub_buckets = synced_sub_buckets or self.num_buckets
        sub_ref = (
            None if use_dir else ray.put(pa.array(sorted(synced_sub_ids), pa.string()))
        )
        none_ref = ray.put(None)

        def scoped_futures(kind: str, label: str) -> list:
            if use_dir:
                return self._cleanup_futures(
                    kind, label, ctx, True, None,
                    sub_dir=synced_sub_dir, sub_buckets=sub_buckets,
                )
            return self._cleanup_futures(kind, label, ctx, True, None, sub_ref)

        plan: list[tuple[str, list]] = []
        for label, mode in node_labels.items():
            mode = self._mode(mode)
            if mode == "rels_only":
                plan.append((label, []))
                continue
            if mode == "scoped":
                plan.append((label, scoped_futures("nodes", label)))
            else:
                plan.append((label, self._cleanup_futures("nodes", label, ctx, False, None, none_ref)))
        for label, mode in edge_labels.items():
            if self._mode(mode) == "scoped":
                plan.append((label, scoped_futures("edges", label)))
            else:
                plan.append((label, self._cleanup_futures("edges", label, ctx, False, None, none_ref)))
        out: dict[str, int] = {}
        all_futs = [f for _, futs in plan for f in futs]
        results = ray.get(all_futs)
        i = 0
        for label, futs in plan:
            out[label] = int(sum(n for n, _ in results[i : i + len(futs)]))
            i += len(futs)
        return out

    def cleanup_nodes(
        self, label: str, ctx: IngestContext, scoped: bool = True, synced_sub_ids: set | None = None
    ) -> int:
        return self._cleanup("nodes", label, ctx, scoped, synced_sub_ids)

    def cleanup_edges(
        self, rel_label: str, ctx: IngestContext, scoped: bool = True, synced_sub_ids: set | None = None
    ) -> int:
        return self._cleanup("edges", rel_label, ctx, scoped, synced_sub_ids)

    def cleanup_matchlinks(
        self,
        rel_label: str,
        ctx: IngestContext,
        sub_resource_label: str,
        sub_resource_id: str,
    ) -> int:
        """Expire stale matchlink edges scoped by the
        ``_sub_resource_label`` / ``_sub_resource_id`` rel properties the
        loaders stamp (reference cleanupbuilder.py:603-667: matchlink
        cleanup matches on rel props, not a path; scoping refs validated
        as kwargs-level at 568-600). Only edges belonging to this
        (label, id) sub-resource whose lastupdated <> tag are deleted."""
        import ray

        parts = sorted(
            glob.glob(os.path.join(self._dir("edges", rel_label), "bucket=*", "part.parquet"))
        )
        if not parts:
            return 0
        task = _TaskHolder.get()
        eq = [("_sub_resource_label", sub_resource_label), ("_sub_resource_id", sub_resource_id)]
        chunk = 16
        futures = [
            task.remote(parts[i : i + chunk], ctx.update_tag, False, None, eq)
            for i in range(0, len(parts), chunk)
        ]
        return int(sum(n for n, _ in ray.get(futures)))

    def cleanup_cascade(
        self,
        parent_label: str,
        child_label: str,
        ownership_rel: str,
        ctx: IngestContext,
        *,
        parent_scoped: bool = False,
        synced_sub_ids: set | None = None,
        detach_edge_labels: list[str] | None = None,
    ) -> dict[str, int]:
        """Cascade delete (reference cleanupbuilder.py:309-334): delete
        stale parents, then stale children reachable via the ownership
        rel — guarded by ``child.lastupdated <> tag`` so re-parented
        (freshly-synced) children survive — then DETACH stale edges that
        reference any deleted node.

        Returns {parent, child, detached} row counts.
        """
        import ray

        task = _TaskHolder.get()
        tag = ctx.update_tag

        def parts_of(kind: str, label: str) -> list[str]:
            return sorted(
                glob.glob(os.path.join(self._dir(kind, label), "bucket=*", "part.parquet"))
            )

        sub_ref = ray.put(
            pa.array(sorted(synced_sub_ids), pa.string())
            if parent_scoped and synced_sub_ids
            else None
        )
        p_parts = parts_of("nodes", parent_label)
        chunk = 16
        p_futs = [
            task.remote(p_parts[i : i + chunk], tag, parent_scoped, sub_ref, None, None, None, "id")
            for i in range(0, len(p_parts), chunk)
        ]
        deleted_parents: list[str] = []
        n_parent = 0
        for n, ids in ray.get(p_futs):
            n_parent += n
            deleted_parents.extend(ids)
        n_child = 0
        child_ids: list[str] = []
        if deleted_parents:
            # children owned by a deleted parent (via the ownership edge
            # table — one column scan per bucket, no shuffle)
            parents_ref = ray.put(pa.array(sorted(set(deleted_parents)), pa.string()))
            own_parts = parts_of("edges", ownership_rel)

            @ray.remote(num_cpus=1)
            def owned_children(parts: list, parents) -> list[str]:
                out: list[str] = []
                for part in parts:
                    tbl = pq.read_table(part, columns=["src_id", "dst_id"])
                    hit = pc.fill_null(
                        pc.is_in(pc.cast(tbl.column("src_id"), pa.string()), parents), False
                    )
                    out.extend(
                        pc.cast(tbl.filter(hit).column("dst_id"), pa.string()).to_pylist()
                    )
                return out

            for ids in ray.get(
                [
                    owned_children.remote(own_parts[i : i + chunk], parents_ref)
                    for i in range(0, len(own_parts), chunk)
                ]
            ):
                child_ids.extend(ids)
            if child_ids:
                child_ref = ray.put(pa.array(sorted(set(child_ids)), pa.string()))
                c_parts = parts_of("nodes", child_label)
                c_futs = [
                    task.remote(
                        c_parts[i : i + chunk], tag, False, None, None, child_ref, ["id"], "id"
                    )
                    for i in range(0, len(c_parts), chunk)
                ]
                deleted_children: list[str] = []
                for n, ids in ray.get(c_futs):
                    n_child += n
                    deleted_children.extend(ids)
                child_ids = deleted_children
        detached = 0
        all_deleted = sorted(set(deleted_parents) | set(child_ids))
        if all_deleted and detach_edge_labels:
            detached = self.detach_edges(detach_edge_labels, all_deleted)
        return {"parent": n_parent, "child": n_child, "detached": detached}

    def detach_edges(self, edge_labels: list[str], node_ids: list[str]) -> int:
        """Delete every edge referencing any of ``node_ids`` (either
        endpoint) — the DETACH DELETE analogue preventing dangling rels."""
        import ray

        if not node_ids:
            return 0
        ids_ref = ray.put(pa.array(sorted(set(node_ids)), pa.string()))
        task = _DetachHolder.get()
        futures = []
        chunk = 16
        for label in edge_labels:
            parts = sorted(
                glob.glob(os.path.join(self._dir("edges", label), "bucket=*", "part.parquet"))
            )
            futures += [
                task.remote(parts[i : i + chunk], ids_ref) for i in range(0, len(parts), chunk)
            ]
        return int(sum(ray.get(futures)))
