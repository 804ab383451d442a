"""FLOPs estimator tests (reference parity surface).

The analytic model is the reference's exact per-tile formula
(``flash_attention.cu:2090-2113``) summed over live tiles; the 6 public
estimator functions mirror the reference's estimator ops
(``flash_attention.py:499-562``).
"""

import numpy as np
import pytest

from tf_flash_attention_tpu import flops as F
from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule, LocalRule


def dense_full_flops(q, k, d, v_d, batch, bq, bk):
    # all tiles live; edge-clamped Br/Bc
    def sizes(n, b):
        out = [b] * (n // b)
        if n % b:
            out.append(n % b)
        return out

    total = 0.0
    for br in sizes(q, bq):
        for bc in sizes(k, bk):
            total += (br * bc * (2 * d - 1) + 2 * br * (bc - 1) + 2 * br * bc
                      + 7 * br + br * (bc + v_d) + br * v_d * (2 * bc - 1))
    return total * batch


def test_full_matches_closed_form():
    got = F.estimate_forward_flops(FullRule(), "none_front", (300,), (500,),
                                   32, 16, 4, block_q=128, block_kv=128)
    want = dense_full_flops(300, 500, 32, 16, 4, 128, 128)
    assert got == pytest.approx(want)


def test_causal_less_than_full():
    args = ("none_front", (1024,), (1024,), 64, 64, 2)
    full = F.estimate_forward_flops(FullRule(), *args)
    causal = F.estimate_forward_flops(CausalRule(), *args)
    local = F.estimate_forward_flops(LocalRule(window_size=32), *args)
    assert local < causal < full
    # causal roughly half of full at fine tiles
    ratio = causal / full
    assert 0.45 < ratio < 0.65


def test_public_estimators_channel_first_shapes():
    # reference estimator signature: TF shapes of Q, K, V (channel-first)
    got = F.estimate_causal_attention_forward1d_flops(
        (1, 8, 32, 1024), (1, 8, 32, 2048), (1, 8, 16, 2048))
    assert got > 0
    got2d = F.estimate_local_attention_forward2d_flops(
        (1, 2, 16, 16, 16), (1, 2, 16, 16, 16), (1, 2, 8, 16, 16),
        sync_mode="scale_front", window_size=4, log2_stride_size=1,
        is_causal=True)
    assert got2d > 0
    # full 2d >= local 2d on same shapes
    full2d = F.estimate_full_attention_forward2d_flops(
        (1, 2, 16, 16, 16), (1, 2, 16, 16, 16), (1, 2, 8, 16, 16))
    assert full2d >= got2d


def test_matmul_flops_counts_live_tiles_only():
    full = F.matmul_flops_forward(FullRule(), "none_front", (512,), (512,),
                                  64, 64, 1, 128, 128)
    causal = F.matmul_flops_forward(CausalRule(), "none_front", (512,), (512,),
                                    64, 64, 1, 128, 128)
    # 16 tiles full, 10 live causal (lower triangle of 4x4)
    assert full == pytest.approx(2 * 128 * 128 * 128 * 16)
    assert causal == pytest.approx(2 * 128 * 128 * 128 * 10)
