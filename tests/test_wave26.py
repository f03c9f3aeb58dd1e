"""Wave-26 unit tests: the GIF87a LZW codec's edge cases."""

import numpy as np
import pytest

from jesse_ray.functions.multimodal import (
    _gif_palette,
    decode_gif87a,
    encode_gif87a,
)


def test_gif_roundtrip_random():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (3, 5), (20, 24), (64, 80)]:
        v = rng.integers(0, 256, shape).astype(np.uint8)
        idx, pal = decode_gif87a(encode_gif87a(v))
        assert np.array_equal(idx, v)
        assert np.array_equal(pal, _gif_palette())


def test_gif_kwkwk_runs():
    """Long constant runs hit the KwKwK decoder case (code == next)."""
    v = np.tile(np.array([[7]], dtype=np.uint8), (50, 60))
    assert np.array_equal(decode_gif87a(encode_gif87a(v))[0], v)


def test_gif_code_widening_fires():
    """An image with >510 distinct-add steps forces 9->10-bit codes —
    incompressible random data guarantees ~1 add per pixel."""
    rng = np.random.default_rng(1)
    v = rng.integers(0, 256, (24, 30)).astype(np.uint8)  # 720 px
    assert np.array_equal(decode_gif87a(encode_gif87a(v))[0], v)


def test_gif_table_full_reset():
    """>4096 dictionary adds trigger the spec's clear-code reset."""
    rng = np.random.default_rng(2)
    v = rng.integers(0, 256, (120, 140)).astype(np.uint8)  # 16.8k px
    assert np.array_equal(decode_gif87a(encode_gif87a(v))[0], v)


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_gif87a(b"NOTAGIF" + b"\x00" * 20)


def test_gif_truncated_stream_raises():
    v = np.zeros((8, 8), dtype=np.uint8)
    b = encode_gif87a(v)
    with pytest.raises(ValueError):
        decode_gif87a(b[: len(b) // 2] + b"\x00\x3b")
