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
