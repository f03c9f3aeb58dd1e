"""Wave-39 unit tests: dHash bit algebra and per-user cap."""

import numpy as np


def test_dhash_flat_image_is_zero():
    from jesse_ray.functions.multimodal import encode_ppm, decode_ppm, resize_nearest

    px = np.full((12, 16, 3), 77, dtype=np.uint8)
    small = resize_nearest(decode_ppm(encode_ppm(px)), 8, 9).astype(np.int64)
    bright = small.sum(axis=2)
    bits = (bright[:, 1:] > bright[:, :-1])
    assert not bits.any()


def test_dhash_distinct_for_distinct_gradients():
    from jesse_ray.pipelines.queries39 import q_media_ppm_dhash  # noqa: F401
    # increasing-gradient rows set every horizontal bit
    g = np.tile(np.arange(0, 160, 10, dtype=np.uint8)[None, :, None], (8, 1, 3))
    from jesse_ray.functions.multimodal import resize_nearest

    small = resize_nearest(g, 8, 9).astype(np.int64)
    bright = small.sum(axis=2)
    assert (bright[:, 1:] > bright[:, :-1]).all()


def test_per_user_cap_conserves(ray_session):
    import pyarrow.parquet as pq_

    from jesse_ray.pipelines.queries39 import CAP_N, q_events_per_user_cap

    out = q_events_per_user_cap("/root/testdata/sf0.001")
    ev = pq_.read_table("/root/testdata/sf0.001/events.parquet",
                        columns=["user_id"]).to_pandas()
    total = len(ev)
    per_user = ev.groupby("user_id").size()
    want_kept = int(np.minimum(per_user, CAP_N).sum())
    assert int(out["kept"].sum()) == want_kept
    assert int(out["dropped_total"].iloc[0]) == total - want_kept
