"""Multimodal column plumbing (images / audio / video as opaque binary).

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the codec kernels are STUBBED — clearly marked — behind
``fake=True`` deterministic implementations. Everything Ray-side is real
and tested: schemas (binary payload + typed metadata struct), actor-pool
signatures, batch sizing for wide binary rows, output layout.

Pattern: one actor-pool ``map_batches`` stage per transform; SMALL batch
sizes because each row carries a large binary payload (SURVEY §memory
rule: batch_size × concurrency must fit the worker heap).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media corpus (binary payloads) for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "width": pa.array([32] * n, pa.int32()),
            "height": pa.array([32] * n, pa.int32()),
        }
    )


class ImageDecoder:
    """Actor-pool decode stage.

    fake=False → NotImplementedError (no codec libraries in container);
    fake=True  → deterministic pseudo-decode: payload md5 → pixel stats.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "Real image decode requires PIL/opencv (not in this container); "
                "construct ImageDecoder(fake=True) for the deterministic stub."
            )
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        means, stds, digests = [], [], []
        for p in payloads:
            arr = np.frombuffer(p or b"\x00", dtype=np.uint8)
            means.append(float(arr.mean()))
            stds.append(float(arr.std()))
            digests.append(hashlib.md5(p or b"").hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "pixel_mean": pa.array(means, pa.float64()),
                "pixel_std": pa.array(stds, pa.float64()),
                "content_digest": pa.array(digests, pa.string()),
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage (video → every Nth 'frame').

    fake pseudo-frames: payload split into fixed-size chunks.
    """

    def __init__(self, every_n: int = 4, frame_bytes: int = 16, fake: bool = False):
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "Real frame sampling requires ffmpeg (not in this container); "
                "construct FrameSampler(fake=True) for the deterministic stub."
            )
        out_id, out_frame, out_payload = [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()):
            p = p or b""
            frames = [p[i : i + self.frame_bytes] for i in range(0, len(p), self.frame_bytes)]
            for fi in range(0, len(frames), self.every_n):
                out_id.append(mid)
                out_frame.append(fi)
                out_payload.append(frames[fi])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int32()),
                "frame": pa.array(out_payload, pa.binary()),
            }
        )


def decode_pipeline(ds, concurrency: int = 2, batch_size: int = 64, fake: bool = True):
    """media Dataset → decoded-feature Dataset (actor pool, small batches)."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
