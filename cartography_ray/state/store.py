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


def stable_bucket(ids: pa.Array | pa.ChunkedArray, num_buckets: int) -> pa.Array:
    """Deterministic (cross-process) hash bucket of a string id column.

    Vectorized: pandas' keyed siphash (fixed default key ⇒ stable across
    processes and nodes, which resume correctness depends on).
    """
    arr = pc.cast(ids, pa.string()).to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(arr, categorize=False)
    return pa.array((h % num_buckets).astype(np.int32))


def _upsert_pdf(pdf: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """MERGE reduce inside one bucket: min firstseen, last-writer-wins rest."""
    if pdf.empty:
        return pdf
    order_cols = key_cols + ["lastupdated"]
    tie = [c for c in pdf.columns if c not in order_cols and c != "firstseen"]
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
            pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
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

        stats = (
            bucketed.groupby("bucket")
            .map_groups(merge_write, batch_format="pandas")
            .to_pandas()
        )
        return stats

    def materialize_nodes(self, label: str, ds, ctx: IngestContext):
        return self._materialize("nodes", label, ds, ctx, ["id"])

    def materialize_edges(self, rel_label: str, ds, ctx: IngestContext):
        return self._materialize("edges", rel_label, ds, ctx, EDGE_KEY)

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
        deleted = 0
        for part in sorted(
            glob.glob(os.path.join(self._dir(kind, label), "bucket=*", "part.parquet"))
        ):
            tbl = pq.read_table(part)
            stale = pc.not_equal(tbl.column("lastupdated"), pa.scalar(ctx.update_tag, pa.int64()))
            if scoped:
                if synced_sub_ids is None:
                    raise ValueError("scoped cleanup requires synced_sub_ids")
                if "_sub_id" not in tbl.column_names:
                    continue
                in_scope = pc.is_in(
                    tbl.column("_sub_id"), pa.array(sorted(synced_sub_ids), pa.string())
                )
                stale = pc.and_(stale, pc.fill_null(in_scope, False))
            stale = pc.fill_null(stale, False)
            n_stale = pc.sum(pc.cast(stale, pa.int64())).as_py() or 0
            if not n_stale:
                continue
            kept = tbl.filter(pc.invert(stale))
            tmp = part + f".tmp.{os.getpid()}"
            pq.write_table(kept, tmp)
            os.replace(tmp, part)
            deleted += n_stale
        return deleted

    def cleanup_nodes(
        self, label: str, ctx: IngestContext, scoped: bool = True, synced_sub_ids: set | None = None
    ) -> int:
        return self._cleanup("nodes", label, ctx, scoped, synced_sub_ids)

    def cleanup_edges(
        self, rel_label: str, ctx: IngestContext, scoped: bool = True, synced_sub_ids: set | None = None
    ) -> int:
        return self._cleanup("edges", rel_label, ctx, scoped, synced_sub_ids)
