"""Wave-33 unit tests: WOE identity and LOO exclusivity conservation."""

import numpy as np


def test_woe_sums_to_zero_when_balanced():
    # WOE identity: sum_b pos_b = POS and sum_b neg_b = NEG by construction
    pos = np.array([10, 20, 30], dtype=float)
    neg = np.array([5, 40, 15], dtype=float)
    woe = np.log((pos / pos.sum()) / (neg / neg.sum()))
    # information value is non-negative
    iv = ((pos / pos.sum()) - (neg / neg.sum())) * woe
    assert (iv >= -1e-12).all()


def test_loo_conserves_vocab(ray_session):
    from jesse_ray.pipelines.queries33 import q_seq_loo_vocab_value

    out = q_seq_loo_vocab_value("/root/testdata/sf0.001")
    # every vocabulary type is either exclusive to one source or shared
    assert "*shared*" in set(out["source"])
    assert (out["exclusive_types"] > 0).all()


def test_woe_bands_partition_quantities(ray_session):
    from jesse_ray.pipelines.queries33 import WOE_BANDS, q_lineitem_woe_quantity

    out = q_lineitem_woe_quantity("/root/testdata/sf0.001")
    assert len(out) == len(WOE_BANDS)
    assert int((out["n_pos"] + out["n_neg"]).sum()) > 0
