"""Multimodal columns (images / audio / video as opaque binary + typed
metadata), with REAL decoders where the format needs no codec library:

- PPM/PGM (``P6``/``P5`` netpbm) images: parsed with numpy alone —
  header scan + ``frombuffer`` reshape. Real pixel features and a real
  nearest-neighbor resize.
- PCM WAV audio: parsed with the stdlib ``wave`` module + numpy — real
  duration / RMS / zero-crossing features.

Compressed codecs (JPEG/PNG/MP3/video containers) would need PIL /
ffmpeg, which are NOT in this container: those paths raise
``NotImplementedError`` unless the deterministic ``fake=True`` stub is
requested (clearly marked; the Ray-side plumbing — schemas, actor-pool
signatures, batch sizing — is identical either way).

Pattern: one actor-pool ``map_batches`` stage per transform; SMALL batch
sizes because each row carries a large binary payload (SURVEY §memory
rule: batch_size × concurrency must fit the worker heap).
"""

from __future__ import annotations

import hashlib
import io

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

PPM_MIME = "image/x-portable-pixmap"
PGM_MIME = "image/x-portable-graymap"
WAV_MIME = "audio/wav"


# --------------------------------------------------------------------------
# netpbm (PPM/PGM) — real, numpy-only
# --------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6; (h, w) uint8 → binary P5."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"encode_ppm: expected (h,w,3) or (h,w), got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6/P5 → uint8 array (h, w, 3) / (h, w). Handles comments
    and arbitrary whitespace in the header, per the netpbm spec."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError(f"decode_ppm: not a binary PPM/PGM (magic {payload[:2]!r})")
    channels = 3 if payload[:2] == b"P6" else 1
    # header = magic + 3 decimal tokens (w, h, maxval); '#' starts a comment
    tokens, pos = [], 2
    while len(tokens) < 3:
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isdigit():
            end = pos
            while payload[end : end + 1].isdigit():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
        else:
            raise ValueError(f"decode_ppm: bad header byte {c!r} at {pos}")
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("decode_ppm: 16-bit netpbm not supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=pos)
    return arr.reshape((h, w, 3) if channels == 3 else (h, w))


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real nearest-neighbor resize via index maps (pure numpy)."""
    h, w = arr.shape[0], arr.shape[1]
    ri = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    ci = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return arr[ri][:, ci]


def synth_media_table(n: int, seed: int = 3, real: bool = False) -> pa.Table:
    """Deterministic media corpus. ``real=True`` → valid binary P6 PPM
    payloads (decodable by ``decode_ppm``); default keeps the legacy
    opaque-bytes corpus (mime ``image/fake``) the stub tests use."""
    rng = np.random.default_rng(seed)
    if real:
        payloads, widths, heights = [], [], []
        for _ in range(n):
            h, w = int(rng.integers(8, 33)), int(rng.integers(8, 33))
            payloads.append(encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)))
            widths.append(w)
            heights.append(h)
        mime = [PPM_MIME] * n
    else:
        payloads = [
            rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes()
            for _ in range(n)
        ]
        widths, heights, mime = [32] * n, [32] * n, ["image/fake"] * n
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mime, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


# --------------------------------------------------------------------------
# WAV (PCM) — real, stdlib wave + numpy
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D float in [-1, 1] or int16 → mono 16-bit PCM WAV bytes."""
    import wave

    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate)."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        sw, nch, sr = f.getsampwidth(), f.getnchannels(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"decode_wav: {8 * sw}-bit PCM not supported")
    return arr.reshape(-1, nch), sr


def synth_audio_table(n: int, seed: int = 5, sample_rate: int = 8000) -> pa.Table:
    """Deterministic corpus of REAL mono PCM WAV clips (sine + noise)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for _ in range(n):
        dur = float(rng.uniform(0.05, 0.3))
        freq = float(rng.uniform(100, 1000))
        amp = float(rng.uniform(0.2, 0.9))
        t = np.arange(int(dur * sample_rate)) / sample_rate
        sig = amp * np.sin(2 * np.pi * freq * t) + rng.normal(0, 0.01, len(t))
        payloads.append(encode_wav(sig, sample_rate))
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([WAV_MIME] * n, pa.string()),
        }
    )


# --------------------------------------------------------------------------
# Actor-pool stages
# --------------------------------------------------------------------------


class ImageDecoder:
    """Actor-pool decode stage: payload → pixel features.

    REAL decode for netpbm mimes (``image/x-portable-pixmap`` /
    ``-graymap``). Other mimes: ``fake=True`` runs the deterministic
    byte-stats stub; ``fake=False`` raises ``NotImplementedError`` (the
    compressed codecs need PIL/opencv, absent here).
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        means, stds, widths, heights, digests = [], [], [], [], []
        for p, mime in zip(payloads, mimes):
            p = p or b"\x00"
            if mime in (PPM_MIME, PGM_MIME):
                img = decode_ppm(p)
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                heights.append(img.shape[0])
                widths.append(img.shape[1])
            elif self.fake:
                arr = np.frombuffer(p, dtype=np.uint8)
                means.append(float(arr.mean()))
                stds.append(float(arr.std()))
                widths.append(-1)
                heights.append(-1)
            else:
                raise NotImplementedError(
                    f"Real decode of {mime!r} requires PIL/opencv (not in this "
                    "container); netpbm payloads decode for real, or construct "
                    "ImageDecoder(fake=True) for the deterministic stub."
                )
            digests.append(hashlib.md5(p).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "pixel_mean": pa.array(means, pa.float64()),
                "pixel_std": pa.array(stds, pa.float64()),
                "decoded_w": pa.array(widths, pa.int32()),
                "decoded_h": pa.array(heights, pa.int32()),
                "content_digest": pa.array(digests, pa.string()),
            }
        )


class ImageResizer:
    """Actor-pool resize stage: netpbm payload → resized netpbm payload
    (REAL nearest-neighbor; non-netpbm mimes raise as in ImageDecoder)."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p, mime in zip(
            batch.column("payload").to_pylist(), batch.column("mime").to_pylist()
        ):
            if mime not in (PPM_MIME, PGM_MIME):
                raise NotImplementedError(f"ImageResizer: unsupported mime {mime!r}")
            out.append(encode_ppm(resize_nearest(decode_ppm(p), self.out_h, self.out_w)))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": pa.array(out, pa.binary()),
                "mime": batch.column("mime"),
                "width": pa.array([self.out_w] * batch.num_rows, pa.int32()),
                "height": pa.array([self.out_h] * batch.num_rows, pa.int32()),
            }
        )


class AudioFeatures:
    """Actor-pool audio feature stage: REAL PCM-WAV decode → duration,
    RMS, zero-crossing rate."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        durs, rates, rms, zcr = [], [], [], []
        for p in batch.column("payload").to_pylist():
            samples, sr = decode_wav(p)
            mono = samples.mean(axis=1)
            durs.append(len(mono) / sr)
            rates.append(sr)
            rms.append(float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0)
            zcr.append(
                float(np.mean(np.abs(np.diff(np.signbit(mono))))) if len(mono) > 1 else 0.0
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "duration_s": pa.array(durs, pa.float64()),
                "sample_rate": pa.array(rates, pa.int32()),
                "rms": pa.array(rms, pa.float64()),
                "zero_cross_rate": pa.array(zcr, pa.float64()),
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage (video → every Nth 'frame').

    Real video demux needs ffmpeg (absent): ``fake=True`` splits the
    payload into fixed-size pseudo-frames so the fan-out plumbing
    (one input row → many frame rows) is exercised for real.
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


def audio_pipeline(ds, concurrency: int = 2, batch_size: int = 64):
    """audio Dataset → feature Dataset (REAL WAV decode, actor pool)."""
    return ds.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
