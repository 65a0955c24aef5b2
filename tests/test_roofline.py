"""Analytic roofline accounting sanity (utils/roofline.py)."""

import numpy as np

from controllable_xgating_tpu.utils import roofline
from controllable_xgating_tpu.utils.config import ModelConfig


REF = ModelConfig(vocab_size=10000, pos_vocab_size=35)


def test_decode_step_logits_dominate_flops():
    # at reference dims the vocab projection is the largest single matmul
    c_all = roofline.decode_step_cost(REF, rows=1280)
    no_v = ModelConfig(vocab_size=1, pos_vocab_size=35)
    c_nov = roofline.decode_step_cost(no_v, rows=1280)
    assert c_all.flops > 1.3 * c_nov.flops
    assert c_all.flops > 0 and c_all.hbm_bytes > 0


def test_costs_scale_linearly_in_rows_minus_weights():
    c1 = roofline.decode_step_cost(REF, rows=100)
    c2 = roofline.decode_step_cost(REF, rows=200)
    assert np.isclose(c2.flops, 2 * c1.flops)
    # bytes: weights are row-independent, activations double
    w = 2 * c1.hbm_bytes - c2.hbm_bytes  # = weights bytes
    assert w > 0


def test_beam_workload_composition():
    total = roofline.beam_workload_cost(REF, batch=256, beam=5,
                                        dec_steps=28, pos_steps=28)
    dec = roofline.decode_step_cost(REF, rows=1280).scaled(28)
    assert total.flops > dec.flops  # encoder/pos/context add on top
    assert total.hbm_bytes > dec.hbm_bytes


def test_xe_backward_multiplier_and_remat():
    base = roofline.xe_step_cost(REF, batch=256, k=5, length=28, pos_len=28)
    remat = roofline.xe_step_cost(REF, batch=256, k=5, length=28, pos_len=28,
                                  remat=True)
    assert remat.flops > base.flops  # remat recomputes the decoder forward


def test_utilization_fields_and_bounds():
    cost = roofline.Cost(flops=197e12 * 0.5, hbm_bytes=819e9 * 0.1)
    u = roofline.utilization(cost, seconds=1.0, device_kind="TPU v5 lite")
    assert u["mfu"] == 0.5
    assert u["hbm_bw_util"] == 0.1
    assert u["bound"] == "compute"
    assert u["peaks_device"] == "v5e"
    assert u["headroom_x"] == 2.0

    u2 = roofline.utilization(roofline.Cost(1e9, 819e9), 1.0, "weird chip")
    assert u2["bound"] == "bandwidth"
    assert "assumed" in u2["peaks_device"]
