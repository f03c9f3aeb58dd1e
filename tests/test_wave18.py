"""Wave-18: zlib compressibility curation signal."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray


@pytest.mark.usefixtures("ray_session")
def test_compression_ratio_separates_boilerplate_from_noise():
    from jesse_ray.functions.text import add_compression_ratio

    rng = np.random.default_rng(0)
    noise = "".join(chr(rng.integers(33, 127)) for _ in range(4000))
    boiler = "the same line repeated forever\n" * 120
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array([boiler, noise, "", None])}))
    out = add_compression_ratio(ds).to_pandas()
    assert out["zratio"].iloc[0] < 0.1      # repetitive → tiny ratio
    assert out["zratio"].iloc[1] > 0.7      # near-random → high ratio
    assert out["zratio"].iloc[2] == 1.0 and out["zratio"].iloc[3] == 1.0
