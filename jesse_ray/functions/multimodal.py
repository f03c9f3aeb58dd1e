"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with sidecar metadata
(mime, width/height, sample rate).  The Ray-side plumbing — schema,
actor-pool signatures, small-batch sizing for wide binary rows, output
layout — is real and tested; the actual codec work is STUBBED because
the decode libraries (PIL/ffmpeg/torchaudio) are not in this container:
``DecodeImage`` raises ``NotImplementedError`` unless
``fake=True`` (deterministic fake decode for tests).
"""

from __future__ import annotations

import hashlib

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
    """Actor-pool decode stage (STUB).

    Real deployment: ``__init__`` loads the codec / model once per actor;
    ``__call__`` decodes a small batch of binary payloads (batch_size must
    stay small — payload bytes × batch_size × concurrency bounds worker
    heap).  In this container the decode is either a deterministic fake
    (``fake=True``: feature = blake2b digest bytes as 8 float32s) or
    ``NotImplementedError``.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/libvips — not available in this container; "
                "construct with fake=True for plumbing tests"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            d = hashlib.blake2b(p or b"", digest_size=32).digest()
            feats.append(np.frombuffer(d, dtype=np.float32)[:8].tolist())
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
    """Actor-pool resize stage (STUB — same contract as DecodeImage).

    Real deployment resizes decoded pixel buffers; the fake path scales
    the metadata dimensions deterministically so downstream schema /
    layout code is exercised end-to-end.
    """

    def __init__(self, target: int = 224, fake: bool = False):
        self.target = target
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image resize requires PIL/libvips — not available in this "
                "container; construct with fake=True for plumbing tests"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = pa.array([self.target] * n, type=pa.int32())
        batch = batch.drop_columns([c for c in ("width", "height") if c in batch.column_names])
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
