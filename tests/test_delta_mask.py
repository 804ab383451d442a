"""Delta-mask (precomputed deduped tile masks) unit + parity tests.

Round-5 kernel optimisation (docs/TUNING.md): mask patterns of partial
tiles repeat across translation-structured schedules, so the forward
kernels select precomputed resident mask tiles instead of rebuilding the
mask arithmetically per tile.  These tests pin

* the trace-time dedup itself (pattern counts, slot coverage, bounds
  baking, the non-repeating fallback), and
* bit-parity of the delta-mask kernels against the arithmetic-mask path
  in interpret mode (the on-chip twin ran bit-exact, TUNING.md round 5).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tf_flash_attention_tpu.block_sizes import BlockConfig
from tf_flash_attention_tpu.mask_rules import CausalRule, LocalRule
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.schedule import build_schedule, delta_mask_table
from tf_flash_attention_tpu.sync_modes import make_sync_pack


def test_causal_diagonal_is_one_pattern():
    pack = make_sync_pack("none_front", (1024,), (1024,))
    out = delta_mask_table(pack, CausalRule(), 256, 256, 1024, 1024,
                           1024, 1024)
    assert out is not None
    slots, masks = out
    assert masks.shape == (1, 256, 256)
    # lower-triangular incl. diagonal
    np.testing.assert_array_equal(
        masks[0] != 0, np.tril(np.ones((256, 256), bool)))
    # exactly the diagonal tiles consult it
    assert [(i, i) for i in range(4)] == sorted(zip(*np.nonzero(slots >= 0)))


def test_local_2d_patterns_repeat():
    rule = LocalRule(window_size=8, log2_stride_size=0, is_causal=True)
    pack = make_sync_pack("none_front", (64, 64), (64, 64))
    out = delta_mask_table(pack, rule, 1024, 1024, 4096, 4096, 4096, 4096)
    assert out is not None
    slots, masks = out
    assert masks.shape[0] == 2  # band delta 0 and delta 1
    sched = build_schedule(pack, rule, 1024, 1024)
    # every live partial tile has a slot; nothing else does
    np.testing.assert_array_equal(slots >= 0, sched.live & sched.partial)


def test_padding_bounds_are_baked():
    # q_len 300 on 256-blocks: the trailing tile's rows past q_len must be
    # masked in the precomputed pattern itself
    pack = make_sync_pack("none_front", (300,), (300,))
    out = delta_mask_table(pack, CausalRule(), 256, 256, 300, 300, 512, 512)
    assert out is not None
    slots, masks = out
    tail = masks[slots[1, 1]]
    assert not tail[300 - 256:, :].any()
    assert not tail[:, 300 - 256:].any()


def test_non_repeating_patterns_fall_back():
    # shift_front sync offsets break block-translation structure for 2d
    # strided rules at these sizes; a tiny max_masks forces the fallback
    rule = LocalRule(window_size=3, log2_stride_size=1, is_causal=True)
    pack = make_sync_pack("none_front", (64, 64), (64, 64))
    out = delta_mask_table(pack, rule, 128, 128, 4096, 4096, 4096, 4096,
                           max_masks=1)
    assert out is None


@pytest.mark.parametrize("rule,shape,cfg", [
    (LocalRule(window_size=8, is_causal=True), (64, 64), (512, 1024)),
    (LocalRule(window_size=6, log2_stride_size=1), (64, 64), (256, 256)),
    (CausalRule(), (1024,), (256, 256)),
], ids=["local2d", "strided2d", "causal1d"])
def test_kernel_parity_delta_vs_arithmetic(monkeypatch, rule, shape, cfg):
    rng = np.random.default_rng(0)
    L = int(np.prod(shape))
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.float32)
    q, k, v = t((2, L, 64)), t((2, L, 64)), t((2, L, 64))
    pack = make_sync_pack("none_front", shape, shape)
    blocks = BlockConfig(*cfg, *cfg, *cfg)
    outs = {}
    for dm in ("1", "0"):
        monkeypatch.setenv("FA_DELTA_MASK", dm)
        outs[dm] = flash_forward(q, k, v, pack=pack, rule=rule,
                                 config=blocks, interpret=True)
    for a, b, w in zip(outs["1"], outs["0"], "olm"):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=w)
