"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with sidecar metadata
(mime, width/height, sample rate).  The Ray-side plumbing — schema,
actor-pool signatures, small-batch sizing for wide binary rows, output
layout — is real and tested.

Codec status (honest split):

- ``image/x-portable-pixmap`` (binary PPM / Netpbm P6, a public
  uncompressed format) is decoded, resized and feature-extracted FOR
  REAL in pure numpy — header parse, raw RGB buffer reshape,
  nearest-neighbor resize, integer channel sums.  No codec library
  needed; verified against an analytic pixel-formula oracle.
- Compressed formats (PNG/JPEG/video) remain STUBS because the decode
  libraries (PIL/libvips/ffmpeg) are not in this container:
  ``DecodeImage`` raises ``NotImplementedError`` for them unless
  ``fake=True`` (deterministic fake decode for plumbing tests).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def make_fake_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(512, 4096, size=n)]
    return pa.table(
        {
            "media_id": pa.array([f"img-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array(rng.integers(32, 512, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(32, 512, size=n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor-pool decode stage.

    ``__init__`` loads the codec / model once per actor; ``__call__``
    decodes a small batch of binary payloads (batch_size must stay
    small — payload bytes × batch_size × concurrency bounds worker
    heap).  PPM (P6) payloads are decoded FOR REAL (pure numpy; feature
    = [mean_r, mean_g, mean_b, w, h, 0…] as float32); compressed
    formats need PIL/libvips (absent here) and either raise
    ``NotImplementedError`` or, with ``fake=True``, produce a
    deterministic blake2b-digest fake feature for plumbing tests.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            if p and p.startswith(b"P6"):
                px = decode_ppm(p)
                means = px.astype(np.float64).mean(axis=(0, 1)) / 255.0
                feats.append(np.array(
                    [*means, px.shape[1], px.shape[0], 0.0, 0.0, 0.0],
                    dtype=np.float32).tolist())
            elif self.fake:
                d = hashlib.blake2b(p or b"", digest_size=32).digest()
                feats.append(np.frombuffer(d, dtype=np.float32)[:8].tolist())
            else:
                raise NotImplementedError(
                    "compressed-image decode requires PIL/libvips — not available "
                    "in this container; PPM payloads decode natively, or construct "
                    "with fake=True for plumbing tests"
                )
        return batch.drop_columns(["payload"]).append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32()))
        )


def decode_features(ds: Dataset, *, fake: bool = True, concurrency: int = 2,
                    batch_size: int = 16) -> Dataset:
    """Small batches by design: binary payloads are wide, so
    batch_size × concurrency × payload must fit the worker heap."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImage:
    """Actor-pool resize stage (same contract as DecodeImage).

    PPM payloads are resized FOR REAL (nearest-neighbor gather, pure
    numpy) and re-encoded as PPM; compressed formats raise unless
    ``fake=True`` (which only rewrites the metadata dims so downstream
    schema / layout code is exercised end-to-end).
    """

    def __init__(self, target: int = 224, fake: bool = False):
        self.target = target
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        pays = batch["payload"].to_pylist() if "payload" in batch.column_names else [None] * n
        out_pays = []
        for p in pays:
            if p and p.startswith(b"P6"):
                out_pays.append(encode_ppm(
                    resize_nearest(decode_ppm(p), self.target, self.target)))
            elif self.fake:
                out_pays.append(p)
            else:
                raise NotImplementedError(
                    "compressed-image resize requires PIL/libvips — not available "
                    "in this container; PPM payloads resize natively, or construct "
                    "with fake=True for plumbing tests"
                )
        t = pa.array([self.target] * n, type=pa.int32())
        drop = [c for c in ("width", "height", "payload") if c in batch.column_names]
        batch = batch.drop_columns(drop)
        if any(p is not None for p in out_pays):
            batch = batch.append_column("payload", pa.array(out_pays, type=pa.binary()))
        return batch.append_column("width", t).append_column("height", t)


class SampleFrames:
    """Actor-pool video frame-sampling stage (STUB).

    Real deployment: ffmpeg-decode ``payload`` and emit one row per
    sampled frame (a flat_map-shaped expansion).  The fake path emits
    ``n_frames`` deterministic pseudo-frames per input row so the
    1→many output layout, row multiplication, and memory sizing are
    exercised.
    """

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "video decode requires ffmpeg — not available in this "
                "container; construct with fake=True for plumbing tests"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, digests = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            for j in range(self.n_frames):
                ids.append(mid)
                frame_idx.append(j)
                digests.append(
                    hashlib.blake2b((p or b"") + bytes([j]), digest_size=16).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame": pa.array(frame_idx, type=pa.int32()),
                "frame_digest": pa.array(digests, type=pa.string()),
            }
        )


def sample_frames(ds: Dataset, *, n_frames: int = 4, fake: bool = True,
                  concurrency: int = 2, batch_size: int = 8) -> Dataset:
    """1→many frame expansion; batch_size stays tiny because each input
    row multiplies by n_frames on output."""
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# REAL codec path: binary PPM (Netpbm P6) in pure numpy

PPM_MIME = "image/x-portable-pixmap"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm wants (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to an (h, w, 3) uint8 array — header is
    ``P6 <w> <h> <maxval>`` whitespace-separated (comments unsupported:
    our sources never emit them), body is the raw RGB buffer."""
    # the spec mandates EXACTLY ONE whitespace byte after maxval, so the
    # header must be matched positionally — a whitespace split would
    # swallow body pixels that happen to be 0x09/0x0a/0x20
    m = re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload[:64])
    if m is None:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    body_off = m.end()
    buf = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=body_off)
    return buf.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Nearest-neighbor resize (floor mapping ``src = out*in // target``)
    — two integer index vectors + one fancy-index gather, no loops."""
    h, w = pixels.shape[:2]
    ys = (np.arange(target_h, dtype=np.int64) * h) // target_h
    xs = (np.arange(target_w, dtype=np.int64) * w) // target_w
    return pixels[ys[:, None], xs[None, :]]


def make_synthetic_ppm_table(n: int = 48) -> pa.Table:
    """Deterministic REAL-codec media corpus: image ``i`` is
    ``pixel(x, y, c) = (a*x + b*y + i + 11*c) mod 256`` with
    size/coefficients derived from ``i`` — closed-form enough that a SQL
    oracle can regenerate every pixel with generate_series and integer
    arithmetic, while the engine path round-trips formula → PPM bytes →
    real decode."""
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = 16 + (i % 17)
        h = 12 + ((i * 7) % 13)
        a = 1 + (i % 5)
        b = 2 + (i % 7)
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        px = ((a * x + b * y + i + 11 * c) % 256).astype(np.uint8)
        ids.append(f"ppm-{i:06d}")
        payloads.append(encode_ppm(px))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([PPM_MIME] * n),
            "width": pa.array(np.array(ws, dtype=np.int32)),
            "height": pa.array(np.array(hs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class PpmChannelSums:
    """Actor-pool REAL decode stage: parse each PPM payload, emit exact
    int64 per-channel pixel sums (+ decoded dims).  Optional
    ``resize_to=(h, w)`` applies the real nearest-neighbor resize before
    summing.  Small batches by contract — payload bytes × batch_size ×
    concurrency bounds the worker heap; decode state (none needed for
    PPM, a codec context in real deployments) lives in ``__init__``."""

    def __init__(self, resize_to: tuple[int, int] | None = None):
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"].to_pylist()
        sums = np.zeros((len(pays), 3), dtype=np.int64)
        dims = np.zeros((len(pays), 2), dtype=np.int32)
        for i, p in enumerate(pays):
            px = decode_ppm(p)
            if self.resize_to is not None:
                px = resize_nearest(px, *self.resize_to)
            sums[i] = px.astype(np.int64).sum(axis=(0, 1))
            dims[i] = px.shape[1], px.shape[0]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(dims[:, 0]),
                "height": pa.array(dims[:, 1]),
                "sum_r": pa.array(sums[:, 0]),
                "sum_g": pa.array(sums[:, 1]),
                "sum_b": pa.array(sums[:, 2]),
            }
        )


def ppm_channel_sums(ds: Dataset, *, resize_to: tuple[int, int] | None = None,
                     concurrency=(1, 2), batch_size: int = 16) -> Dataset:
    return ds.map_batches(
        PpmChannelSums,
        fn_constructor_kwargs={"resize_to": resize_to},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
