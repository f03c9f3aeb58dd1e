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
- ``audio/wav`` (RIFF/WAVE PCM16 mono, public uncompressed) is decoded
  FOR REAL — a proper RIFF chunk walk + one ``np.frombuffer`` — with
  exact integer features, same analytic-oracle scheme.
- ``video/x-raw-ppmseq`` (concatenated P6 frames) is frame-sampled FOR
  REAL: exact boundary walk from each frame's own header, stride
  sampling, per-frame decode.
- ``image/png`` (8-bit RGB, the dominant lossless web format) is
  decoded FOR REAL in pure stdlib zlib + numpy — CRC-verified chunk
  walk, inflate, and unfiltering of all five PNG filter types — with
  the same analytic-pixel-oracle verification.
- Remaining compressed formats (JPEG/MP3/H.264…) are STUBS because
  their decode libraries (PIL/libvips/ffmpeg) are not in this
  container: ``DecodeImage`` raises ``NotImplementedError`` for them
  unless ``fake=True`` (deterministic fake decode for plumbing tests).
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
            if p and (p.startswith(b"P6") or p.startswith(_PNG_SIG)):
                px = decode_ppm(p) if p.startswith(b"P6") else decode_png(p)
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
        had_payload = "payload" in batch.column_names
        drop = [c for c in ("width", "height", "payload") if c in batch.column_names]
        batch = batch.drop_columns(drop)
        # always emit the (nullable) payload column when the input had one —
        # an all-null batch must not produce a different schema than its peers
        if had_payload:
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


# ---------------------------------------------------------------------------
# REAL codec path: WAV / RIFF PCM16 mono in pure numpy + struct

WAV_MIME = "audio/wav"


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 mono samples as a canonical 44-byte-header RIFF/WAVE
    PCM file (the public uncompressed format — no codec lib needed)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_pcm16 wants 1-D int16")
    data = samples.tobytes()
    import struct

    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM16 mono: a proper chunk walk (fmt → data,
    skipping unknown chunks per the RIFF spec), then one zero-copy
    ``np.frombuffer`` over the data chunk."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", payload[body:body + 8])
            bits = struct.unpack("<H", payload[body + 14:body + 16])[0]
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAVE format tag {fmt_tag}")
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAVE data chunk before fmt")
            if bits != 16 or channels != 1:
                raise ValueError("only PCM16 mono supported")
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=body)
            return samples, rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def make_synthetic_wav_table(n: int = 32) -> pa.Table:
    """Deterministic REAL-audio corpus: clip ``i`` has
    ``s[t] = ((a*t + c) mod 65536) - 32768`` — SQL-regenerable."""
    ids, payloads, rates, lens = [], [], [], []
    for i in range(n):
        n_samp = 800 + 37 * i
        rate = 8000 + 1000 * (i % 5)
        a = 3 + 2 * (i % 11)
        c = 17 * i
        t = np.arange(n_samp, dtype=np.int64)
        s = (((a * t + c) % 65536) - 32768).astype(np.int16)
        ids.append(f"wav-{i:06d}")
        payloads.append(encode_wav_pcm16(s, rate))
        rates.append(rate)
        lens.append(n_samp)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([WAV_MIME] * n),
            "sample_rate": pa.array(np.array(rates, dtype=np.int32)),
            "n_samples": pa.array(np.array(lens, dtype=np.int64)),
        }
    )


class WavFeatures:
    """Actor-pool REAL audio feature stage: decode each RIFF/PCM16
    payload, emit exact integer features (decoded length, rate, int64
    sample sum, max |sample|) — the audio analogue of PpmChannelSums."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"].to_pylist()
        out = np.zeros((len(pays), 4), dtype=np.int64)
        for i, p in enumerate(pays):
            s, rate = decode_wav_pcm16(p)
            s64 = s.astype(np.int64)
            out[i] = len(s), rate, s64.sum(), np.abs(s64).max() if len(s) else 0
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_samples": pa.array(out[:, 0]),
                "sample_rate": pa.array(out[:, 1]),
                "sample_sum": pa.array(out[:, 2]),
                "max_abs": pa.array(out[:, 3]),
            }
        )


def wav_features(ds: Dataset, *, concurrency=(1, 2), batch_size: int = 16) -> Dataset:
    return ds.map_batches(WavFeatures, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# REAL frame sampling: concatenated-PPM frame sequences (raw "video")

VIDEO_PPM_MIME = "video/x-raw-ppmseq"


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a concatenation of P6 frames into per-frame byte slices:
    each header declares its own body length, so the walk is exact."""
    frames, pos = [], 0
    while pos < len(payload):
        m = re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload[pos:pos + 64])
        if m is None:
            raise ValueError(f"bad PPM frame header at offset {pos}")
        w, h = int(m.group(1)), int(m.group(2))
        end = pos + m.end() + w * h * 3
        frames.append(payload[pos:end])
        pos = end
    return frames


def make_synthetic_ppm_video_table(n: int = 24) -> pa.Table:
    """Deterministic raw-video corpus: video ``i`` has ``3 + (i % 4)``
    PPM frames; frame ``f`` pixel = ``(a*x + b*y + i + 7*f + 11*c) mod
    256`` (same closed form as the image corpus, plus the frame term)."""
    ids, payloads, nframes = [], [], []
    for i in range(n):
        F = 3 + (i % 4)
        w = 12 + (i % 9)
        h = 8 + ((i * 5) % 11)
        a = 1 + (i % 5)
        b = 2 + (i % 7)
        buf = b""
        for f in range(F):
            x = np.arange(w, dtype=np.int64)[None, :, None]
            y = np.arange(h, dtype=np.int64)[:, None, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            px = ((a * x + b * y + i + 7 * f + 11 * c) % 256).astype(np.uint8)
            buf += encode_ppm(px)
        ids.append(f"vid-{i:06d}")
        payloads.append(buf)
        nframes.append(F)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([VIDEO_PPM_MIME] * n),
            "n_frames": pa.array(np.array(nframes, dtype=np.int32)),
        }
    )


class SampleFramesReal:
    """Actor-pool REAL frame sampler over raw PPM sequences: split the
    payload at frame boundaries, keep every ``stride``-th frame, decode
    each kept frame and emit exact channel sums (1→many expansion —
    tiny batch_size by contract, same as the stub's sizing notes)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, sums = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            for j, fb in enumerate(split_ppm_frames(p)):
                if j % self.stride:
                    continue
                px = decode_ppm(fb).astype(np.int64)
                ids.append(mid)
                fidx.append(j)
                sums.append(px.sum(axis=(0, 1)))
        s = np.asarray(sums, dtype=np.int64).reshape(len(ids), 3)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame": pa.array(np.array(fidx, dtype=np.int32)),
                "sum_r": pa.array(s[:, 0]),
                "sum_g": pa.array(s[:, 1]),
                "sum_b": pa.array(s[:, 2]),
            }
        )


def sample_frames_real(ds: Dataset, *, stride: int = 2, concurrency=(1, 2),
                       batch_size: int = 8) -> Dataset:
    return ds.map_batches(SampleFramesReal, fn_constructor_kwargs={"stride": stride},
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# REAL codec path: PNG (8-bit RGB, color type 2) in pure stdlib zlib + numpy
#
# A genuinely COMPRESSED format decoded without any codec library: chunk
# walk with CRC verification, zlib inflate, and per-scanline unfiltering
# of all five PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6).
# The encoder deliberately rotates through every filter type per row so
# the decoder's unfilter paths are all exercised by the analytic oracle.

PNG_MIME = "image/png"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6), vectorized over a pixel row."""
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))


def encode_png(pixels: np.ndarray, *, filter_seed: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real 8-bit-RGB PNG.  Row
    ``y`` uses filter type ``(y + filter_seed) % 5`` so every decoder
    unfilter path is exercised."""
    import struct
    import zlib

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png wants (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = bytearray()
    px = pixels.astype(np.int32)
    zrow = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        row, prev = px[y], (px[y - 1] if y else zrow)
        left = np.vstack([zrow[:1], row[:-1]])
        ft = (y + filter_seed) % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            ul = np.vstack([zrow[:1], prev[:-1]])
            filt = row - _paeth(left, prev, ul)
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode, pure stdlib + numpy: chunk walk (CRC-verified),
    zlib inflate, per-scanline unfilter of all five filter types.
    Supports the profile our encoder emits — 8-bit RGB (color type 2),
    no interlace — and rejects anything else loudly."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG profile depth={depth} color={ctype} interlace={inter}")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + 3 * w
    if len(raw) != stride * h:
        raise ValueError("PNG IDAT length mismatch")
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w, 3), dtype=np.int32)
    zrow = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].reshape(w, 3).astype(np.int32)
        prev = out[y - 1] if y else zrow
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: recon[x] = Σ raw[0..x] mod 256 — one cumsum
            rec = np.cumsum(line, axis=0) % 256
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 3:  # Average — sequential in x by definition
            rec = np.zeros((w, 3), dtype=np.int32)
            left = zrow[0]
            for x in range(w):
                left = (line[x] + (left + prev[x]) // 2) % 256
                rec[x] = left
        elif ft == 4:  # Paeth — sequential in x by definition
            rec = np.zeros((w, 3), dtype=np.int32)
            left = ul = zrow[0]
            for x in range(w):
                left = (line[x] + _paeth(left, prev[x], ul)) % 256
                rec[x] = left
                ul = prev[x]
        else:
            raise ValueError(f"PNG filter type {ft} out of range")
        out[y] = rec
    return out.astype(np.uint8)


def make_synthetic_png_table(n: int = 40) -> pa.Table:
    """Deterministic REAL-PNG corpus: image ``i`` is
    ``pixel(x, y, c) = (a*x + b*y + x*y + 2*i + 13*c) mod 256`` (the
    ``x*y`` term makes rows differ, so filters do real work) — closed
    form so the SQL twin regenerates every pixel; the engine path
    round-trips formula → PNG bytes (zlib-compressed, all 5 filters) →
    real decode."""
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = 9 + (i % 14)
        h = 7 + ((i * 5) % 11)
        a = 2 + (i % 4)
        b = 1 + (i % 6)
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        px = ((a * x + b * y + x * y + 2 * i + 13 * c) % 256).astype(np.uint8)
        ids.append(f"png-{i:06d}")
        payloads.append(encode_png(px, filter_seed=i))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([PNG_MIME] * n),
            "width": pa.array(np.array(ws, dtype=np.int32)),
            "height": pa.array(np.array(hs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class PngChannelSums:
    """Actor-pool REAL PNG decode stage: CRC-checked chunk walk + zlib
    inflate + unfilter per payload, exact int64 per-channel pixel sums.
    Small batches by contract (payload bytes × batch_size × concurrency
    bounds the worker heap)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"].to_pylist()
        sums = np.zeros((len(pays), 3), dtype=np.int64)
        dims = np.zeros((len(pays), 2), dtype=np.int32)
        for i, p in enumerate(pays):
            px = decode_png(p)
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


def png_channel_sums(ds: Dataset, *, concurrency=(1, 2), batch_size: int = 16) -> Dataset:
    return ds.map_batches(PngChannelSums, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency)


# ---------------------------------------------------------------------------
# REAL codec path: BMP (Windows DIB, 24-bit BI_RGB) in pure numpy + struct
#
# A genuinely different container from PPM/PNG: little-endian binary
# headers, BOTTOM-UP row order, BGR channel order and 4-byte row-stride
# padding — the classic decode traps, all really exercised.

BMP_MIME = "image/bmp"


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP from an (H, W, 3) RGB uint8
    array: BITMAPFILEHEADER + BITMAPINFOHEADER, rows bottom-up, BGR,
    each row padded to a 4-byte boundary."""
    import struct

    h, w, _ = pixels.shape
    stride = (3 * w + 3) & ~3
    img_size = stride * h
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    file_size = 14 + 40 + img_size
    head = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return head + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse a 24-bit BI_RGB BMP back to (H, W, 3) RGB uint8 — header
    walk + stride-aware numpy gather, no codec library."""
    import struct

    magic, _file_size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hsize, w, h, _planes, bpp, comp, _isz, _xr, _yr, _nc, _ic) = struct.unpack_from(
        "<IiiHHIIiiII", payload, 14)
    if hsize < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    stride = (3 * w + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return (rgb[::-1] if flip else rgb).copy()


def make_synthetic_bmp_table(n: int = 36) -> pa.Table:
    """Deterministic BMP corpus: image ``i`` is
    ``pixel(x, y, c) = (a*x + b*y + 3*i + 17*c) mod 256`` —
    closed-form for the SQL oracle, REAL container round-trip for the
    engine.  Widths are chosen so roughly 3 of every 4 images need
    row padding (w % 4 != 0), keeping the stride path honest."""
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = 10 + (i % 15)
        h = 8 + ((i * 3) % 9)
        a = 1 + (i % 6)
        b = 2 + (i % 5)
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        px = ((a * x + b * y + 3 * i + 17 * c) % 256).astype(np.uint8)
        ids.append(f"bmp-{i:06d}")
        payloads.append(encode_bmp(px))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([BMP_MIME] * n),
            "width": pa.array(np.array(ws, dtype=np.int32)),
            "height": pa.array(np.array(hs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class BmpChannelSums:
    """Actor-pool REAL BMP decode stage — same contract as
    PpmChannelSums: small batches, exact int64 channel sums."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"].to_pylist()
        sums = np.zeros((len(pays), 3), dtype=np.int64)
        dims = np.zeros((len(pays), 2), dtype=np.int32)
        for i, p in enumerate(pays):
            px = decode_bmp(p)
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


def bmp_channel_sums(ds: Dataset, *, concurrency=(1, 2), batch_size: int = 16) -> Dataset:
    return ds.map_batches(
        BmpChannelSums,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# REAL codec path: GIF87a (256-color palette + LZW) in pure python/numpy
#
# A genuinely different COMPRESSION algorithm from PNG's DEFLATE: GIF's
# variable-width LZW with LSB-first bit packing, clear/EOI codes,
# dictionary growth with code-size widening at 2^size, the KwKwK
# decoder corner case, and 255-byte data sub-block framing — all really
# exercised (images are sized so the 9→10-bit widening fires).

GIF_MIME = "image/gif"


def _gif_palette() -> np.ndarray:
    """Deterministic 256-entry palette: entry v = (v, 7v mod 256,
    13v mod 256) — closed form so a SQL twin can regenerate it."""
    v = np.arange(256, dtype=np.int64)
    return np.stack([v, (7 * v) % 256, (13 * v) % 256], axis=1).astype(np.uint8)


def encode_gif87a(indices: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 palette-index array as a real GIF87a:
    logical screen descriptor, 256-entry global color table
    (_gif_palette), image descriptor, variable-width LZW image data in
    255-byte sub-blocks, trailer."""
    import struct

    if indices.ndim != 2 or indices.dtype != np.uint8:
        raise ValueError("encode_gif87a wants (h, w) uint8 palette indices")
    h, w = indices.shape
    out = bytearray(b"GIF87a")
    # screen descriptor: global color table, 8 bits/pixel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _gif_palette().tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    min_code = 8
    out.append(min_code)

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    codes: list[tuple[int, int]] = []  # (code, bit width at emission)

    def fresh():
        return {(c,): c for c in range(1 << min_code)}

    table = fresh()
    next_code = eoi + 1
    code_size = min_code + 1
    codes.append((clear, code_size))
    wseq: tuple = ()
    for px in indices.ravel().tolist():
        wk = wseq + (px,)
        if wk in table:
            wseq = wk
            continue
        codes.append((table[wseq], code_size))
        table[wk] = next_code
        next_code += 1
        # GIF rule: widen when the NEXT code to assign no longer fits
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code == (1 << 12):
            # table full: spec-correct reset via an explicit clear code
            codes.append((clear, code_size))
            table = fresh()
            next_code = eoi + 1
            code_size = min_code + 1
        wseq = (px,)
    if wseq:
        codes.append((table[wseq], code_size))
    codes.append((eoi, code_size))

    # LSB-first bit packing
    acc = nbits = 0
    data = bytearray()
    for code, size in codes:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    # 255-byte sub-blocks + terminator
    for i in range(0, len(data), 255):
        blk = data[i:i + 255]
        out.append(len(blk))
        out += blk
    out.append(0)
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif87a(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """REAL GIF87a decode, pure python/numpy: header + screen
    descriptor parse, global color table, image descriptor, sub-block
    reassembly, variable-width LZW with clear/EOI, dictionary growth
    with code widening at 2^size and the KwKwK case.  Returns
    (indices (h, w) uint8, palette (256, 3) uint8).  Supports the
    profile our encoder emits; rejects anything else loudly."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    if not flags & 0x80:
        raise ValueError("unsupported GIF: no global color table")
    gct_n = 2 << (flags & 0x07)
    pos = 13
    palette = np.frombuffer(payload[pos:pos + 3 * gct_n], dtype=np.uint8).reshape(-1, 3)
    pos += 3 * gct_n
    if payload[pos] != 0x2C:
        raise ValueError(f"unsupported GIF block 0x{payload[pos]:02x} (want image descriptor)")
    _l, _t, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos + 1:pos + 10])
    if iflags & 0xC0:
        raise ValueError("unsupported GIF: local color table / interlace")
    pos += 10
    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while True:
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        data += payload[pos:pos + ln]
        pos += ln

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [(c,) for c in range(1 << min_code)]
    table: list[tuple] = []
    code_size = min_code + 1
    next_code = eoi + 1
    acc = nbits = 0
    di = 0
    out: list[int] = []
    prev: tuple | None = None
    while True:
        while nbits < code_size:
            if di >= len(data):
                raise ValueError("GIF LZW stream truncated before EOI")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = []
            code_size = min_code + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = base[code]
        elif code - eoi - 1 < len(table):
            entry = table[code - eoi - 1]
        elif prev is not None and code == next_code:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            next_code += 1
            # the decoder's dictionary lags the encoder's by ONE entry
            # (it reconstructs add_k only while processing code k+1), so
            # it must widen one count EARLY — the classic GIF LZW
            # off-by-one every real decoder implements
            if next_code == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        prev = entry
    idx = np.array(out, dtype=np.uint8)
    if len(idx) != iw * ih:
        raise ValueError(f"GIF pixel count {len(idx)} != {iw}x{ih}")
    return idx.reshape(ih, iw), palette


def make_synthetic_gif_table(n: int = 40) -> pa.Table:
    """Deterministic REAL-GIF corpus: image ``i`` is the palette-index
    field ``v(x, y) = (a*x + b*y + x*y + 2*i) mod 256`` with
    ``w = 24 + (i % 17)``, ``h = 20 + ((i * 5) % 13)`` — ≥480 px per
    image so the LZW dictionary passes 512 entries and the 9→10-bit
    code widening really fires; the SQL twin regenerates every pixel
    and the palette from the closed forms."""
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = 24 + (i % 17)
        h = 20 + ((i * 5) % 13)
        a = 2 + (i % 4)
        b = 1 + (i % 6)
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        v = ((a * x + b * y + x * y + 2 * i) % 256).astype(np.uint8)
        ids.append(f"gif-{i:06d}")
        payloads.append(encode_gif87a(v))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array([GIF_MIME] * n),
            "width": pa.array(np.array(ws, dtype=np.int32)),
            "height": pa.array(np.array(hs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class GifChannelSums:
    """Actor-pool REAL GIF decode stage: LZW inflate + palette lookup
    per payload, exact int64 per-channel sums of the palette-mapped
    RGB image."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"].to_pylist()
        sums = np.zeros((len(pays), 3), dtype=np.int64)
        dims = np.zeros((len(pays), 2), dtype=np.int32)
        for i, p in enumerate(pays):
            idx, pal = decode_gif87a(p)
            rgb = pal[idx.ravel()].astype(np.int64)
            sums[i] = rgb.sum(axis=0)
            dims[i] = idx.shape[1], idx.shape[0]
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


def gif_channel_sums(ds: Dataset, *, concurrency=(1, 2), batch_size: int = 16) -> Dataset:
    return ds.map_batches(GifChannelSums, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency)
