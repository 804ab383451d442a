"""On-chip check that the solver default tracks the measured frontier.

VERDICT round-2 item 5: the block-size solver must provably pick a config
in the same performance class as the measured best for the benchmark
shape — closing the loop the reference's smem solver closes analytically
(``flash_attention.cu:1977-2067``).  Skipped off-TPU (wall-time
assertions are meaningless in interpret mode); run with
``FA_TEST_TPU=1 python -m pytest tests/test_tuning_chip.py -m slow``.

Round-4 methodology: the chip is bimodal and the tunnel adds multi-ms
jitter (docs/TUNING.md), so default and champion are sampled in
*interleaved pairs* and compared by the MEDIAN of per-pair ratios —
chip-state drift cancels within a pair, which is what lets the margin
sit at the originally-asked 5% without flaking (round 3 had loosened a
sequential-comparison margin to 12%).
"""

import statistics

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_flash_attention_tpu.block_sizes import (
    BlockConfig, LANE, choose_block_config, pad_to)
from tf_flash_attention_tpu.mask_rules import CausalRule
from tf_flash_attention_tpu.ops.backward import flash_backward
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.sync_modes import make_sync_pack
from tf_flash_attention_tpu.utils.profiling import ChainTimer

S, B, D = 4096, 8, 128
# Measured winners at the bench shape (docs/TUNING.md; round 5: banded
# fused backward frontier (1024, 512) for the ungrouped dkv blocks).
BEST_FWD = (1024, 1024)
BEST_BWD = (1024, 512, 1024, 512)
# Median of interleaved-pair ratios; pairing cancels chip-state drift.
MARGIN = 1.05
PAIRS = 6


def _paired_ratio(fn_default, fn_best, args, n=15):
    # persistent timers: the chains are jitted once and auto-scaled to the
    # jitter floor (ChainTimer docstring); pairs then cost two dispatches
    timer_d = ChainTimer(fn_default, args, n=n)
    timer_b = ChainTimer(fn_best, args, n=n)
    ratios = []
    for _ in range(PAIRS):
        t_d = timer_d.sample(reps=3)
        t_b = timer_b.sample(reps=3)
        ratios.append(min(t_d) / min(t_b))
    return statistics.median(ratios)


@pytest.fixture(scope="module")
def chip_data():
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU chip")
    rng = np.random.default_rng(0)
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
    return t((B, S, D)), t((B, S, D)), t((B, S, D))


@pytest.mark.slow
def test_default_forward_config_near_measured_best(chip_data):
    q, k, v = chip_data
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule()
    default = choose_block_config(S, S, pad_to(D, LANE), pad_to(D, LANE),
                                  jnp.bfloat16)
    assert (default.block_q, default.block_kv) == BEST_FWD
    best_cfg = BlockConfig(*BEST_FWD, *BEST_FWD, *BEST_FWD)
    fn = lambda cfg: (lambda q, k, v: flash_forward(
        q, k, v, pack=pack, rule=rule, config=cfg)[0])
    ratio = _paired_ratio(fn(default), fn(best_cfg), (q, k, v))
    assert ratio <= MARGIN, ratio


@pytest.mark.slow
def test_default_backward_config_near_measured_best(chip_data):
    q, k, v = chip_data
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule()
    default = choose_block_config(S, S, pad_to(D, LANE), pad_to(D, LANE),
                                  jnp.bfloat16)
    assert (default.block_q_dq, default.block_kv_dq,
            default.block_q_dkv, default.block_kv_dkv) == BEST_BWD
    o, l, m = jax.block_until_ready(jax.jit(
        lambda q, k, v: flash_forward(q, k, v, pack=pack, rule=rule,
                                      config=default))(q, k, v))
    best_cfg = BlockConfig(default.block_q, default.block_kv, *BEST_BWD)
    fn = lambda cfg: (lambda q, k, v, o, l, m, do: flash_backward(
        q, k, v, o, l, m, do, pack=pack, rule=rule, config=cfg))
    args = (q, k, v, o, l, m, k)
    ratio = _paired_ratio(fn(default), fn(best_cfg), args, n=10)
    assert ratio <= MARGIN, ratio
