"""Single-window kernel (round 5): eligibility, routing and parity.

The window path (``schedule.window_band_table`` +
``ops/forward_banded.window_forward``) replaces the per-kv-step online
merge with one closed-form softmax over a dynamic-start contiguous band
per q sub-block.  These tests pin:

* eligibility — narrow-band rules engage, wide-variance bands (1d
  causal) and full rules (measured negative, docs/TUNING.md round 5)
  refuse;
* parity — the routed path matches the table/banded kernels across
  rules, sync modes, GQA, q != k lengths, odd (padded) lengths, and
  dtypes, in interpret mode;
* structure — dead rows produce zero output / -inf m, sub-blocks under
  a larger grid block agree with sub == grid.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tf_flash_attention_tpu.block_sizes import BlockConfig, choose_block_config
from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule, LocalRule
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.schedule import window_band_table
from tf_flash_attention_tpu.sync_modes import make_sync_pack

W8 = LocalRule(window_size=8, log2_stride_size=0, is_causal=True)


def _pads(L, bq, bk):
    return -(-L // bq) * bq, -(-L // bk) * bk


class TestEligibility:
    def test_local_2d_engages(self):
        pk = make_sync_pack("none_front", (64, 64), (64, 64))
        wt = window_band_table(pk, W8, 256, 4096, 4096, 4096, 4096)
        assert wt is not None
        starts, W, slots, masks = wt
        assert W % 128 == 0 and W <= 1024
        assert starts.shape == (16,) and masks is not None
        # all starts lane-aligned and in range
        assert (starts % 128 == 0).all()
        assert (starts >= 0).all() and (starts + W <= 4096).all()

    def test_causal_1d_refuses(self):
        # band width varies 0..k_len: the fixed window would schedule
        # ~2x the 128-priced work, above the max_waste bound
        pk = make_sync_pack("none_front", (4096,), (4096,))
        assert window_band_table(pk, CausalRule(), 256,
                                 4096, 4096, 4096, 4096) is None

    def test_full_refuses(self):
        # measured slower than the banded kernel (no waste to save)
        pk = make_sync_pack("none_front", (4096,), (4096,))
        assert window_band_table(pk, FullRule(), 256,
                                 4096, 4096, 4096, 4096) is None

    def test_strided_local_engages_when_contiguous_at_lane(self):
        pk = make_sync_pack("none_front", (64, 64), (64, 64))
        rule = LocalRule(window_size=8, log2_stride_size=1, is_causal=True)
        assert window_band_table(pk, rule, 256, 4096, 4096,
                                 4096, 4096) is not None

    def test_solver_picks_large_grid_block(self):
        pk = make_sync_pack("none_front", (64, 64), (64, 64))
        cfg = choose_block_config(4096, 4096, 128, 128, jnp.bfloat16,
                                  pack=pk, rule=W8)
        assert cfg.block_q == 1024

    def test_mask_dedup_is_small(self):
        pk = make_sync_pack("none_front", (64, 64), (64, 64))
        _, _, slots, masks = window_band_table(pk, W8, 256,
                                               4096, 4096, 4096, 4096)
        assert len(masks) <= 8
        assert slots.max() < len(masks)


def _run_both(rule, mode, qshp, kshp, dtype, gqa=1, bq=512, bk=256,
              d=32, v_d=48, seed=0):
    Lq, Lk = int(np.prod(qshp)), int(np.prod(kshp))
    pk = make_sync_pack(mode, qshp, kshp)
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-1, 1, (2 * gqa, Lq, d)), dtype)
    k = jnp.asarray(rng.uniform(-1, 1, (2, Lk, d)), dtype)
    v = jnp.asarray(rng.uniform(-1, 1, (2, Lk, v_d)), dtype)
    cfg = BlockConfig(bq, bk, 128, 128, 128, 128)
    q_pad, k_pad = _pads(Lq, bq, bk)[0], _pads(Lk, bq, bk)[1]
    engaged = any(
        window_band_table(pk, rule, sq, Lq, Lk, q_pad, k_pad) is not None
        for sq in (128, 256, 512) if sq <= min(bq, q_pad))
    os.environ["FA_WINDOW"] = "1"
    try:
        got = flash_forward(q, k, v, pack=pk, rule=rule, config=cfg,
                            interpret=True)
    finally:
        os.environ["FA_WINDOW"] = "0"
    try:
        want = flash_forward(q, k, v, pack=pk, rule=rule, config=cfg,
                             interpret=True)
    finally:
        os.environ.pop("FA_WINDOW", None)
    return engaged, got, want


def _assert_close(got, want, dtype):
    o1, l1, m1 = got
    o2, l2, m2 = want
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(o2, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=tol, atol=tol)
    # m: compare only where finite (dead rows carry the -inf sentinel)
    f1, f2 = np.asarray(m1), np.asarray(m2)
    assert ((f1 <= -1e30) == (f2 <= -1e30)).all()
    sel = f2 > -1e30
    np.testing.assert_allclose(f1[sel], f2[sel], rtol=tol, atol=tol)


class TestParity:
    @pytest.mark.parametrize("mode", ["none_front", "scale_front",
                                      "scale_end"])
    def test_local_2d_sync_modes(self, mode):
        engaged, got, want = _run_both(W8, mode, (16, 16), (16, 16),
                                       jnp.float32)
        assert engaged
        _assert_close(got, want, jnp.float32)

    def test_local_2d_bf16_gqa(self):
        engaged, got, want = _run_both(W8, "none_front", (16, 16), (16, 16),
                                       jnp.bfloat16, gqa=4)
        assert engaged
        _assert_close(got, want, jnp.bfloat16)

    def test_strided_2d(self):
        rule = LocalRule(window_size=4, log2_stride_size=1, is_causal=False)
        engaged, got, want = _run_both(rule, "none_front", (16, 16),
                                       (16, 16), jnp.float32)
        assert engaged
        _assert_close(got, want, jnp.float32)

    def test_local_1d_q_neq_k_odd_lengths(self):
        rule = LocalRule(window_size=64, log2_stride_size=0, is_causal=True)
        engaged, got, want = _run_both(rule, "none_front", (777,), (513,),
                                       jnp.float32, gqa=2)
        assert engaged
        _assert_close(got, want, jnp.float32)

    def test_dead_rows_zero(self):
        # q extends far past k: the tail q rows see no kv under the
        # causal local window -> dead-row repair (o = 0, m = -inf)
        rule = LocalRule(window_size=2, log2_stride_size=0, is_causal=True)
        engaged, got, want = _run_both(rule, "none_front", (640,), (130,),
                                       jnp.float32, bq=128, bk=128)
        assert engaged
        _assert_close(got, want, jnp.float32)
        o1, _, m1 = got
        assert np.asarray(m1)[:, -1].min() <= -1e30
        assert np.abs(np.asarray(o1)[:, -1]).max() == 0.0

    def test_sub_block_matches_whole_block(self):
        # same case at (grid 512, sub from routing) vs grid 128 == sub
        rule = W8
        _, got_big, _ = _run_both(rule, "none_front", (16, 16), (16, 16),
                                  jnp.float32, bq=512)
        _, got_small, want = _run_both(rule, "none_front", (16, 16),
                                       (16, 16), jnp.float32, bq=128)
        _assert_close(got_big, want, jnp.float32)
        _assert_close(got_small, want, jnp.float32)


def test_explicit_compute_subtiling_routes_to_table_kernel():
    """A q_compute/kv_compute request selects the table kernel (the only
    one implementing sub-chained compute) and stays correct — the
    (2048,2048)+qc512 degraded-state frontier config relies on this
    (docs/TUNING.md round 5)."""
    rng = np.random.default_rng(5)
    L = 700
    pk = make_sync_pack("none_front", (L,), (L,))
    q = jnp.asarray(rng.uniform(-1, 1, (2, L, 32)), jnp.float32)
    k = jnp.asarray(rng.uniform(-1, 1, (2, L, 32)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, (2, L, 48)), jnp.float32)
    sub = BlockConfig(256, 256, 128, 128, 128, 128, None, 128)
    base = BlockConfig(256, 256, 128, 128, 128, 128)
    got = flash_forward(q, k, v, pack=pk, rule=CausalRule(), config=sub,
                        interpret=True)
    want = flash_forward(q, k, v, pack=pk, rule=CausalRule(), config=base,
                         interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


from tf_flash_attention_tpu.schedule import window_band_table_t  # noqa: E402


class TestWindowBackward:
    """The fused single-window backward (ops/backward._fused_window_kernel)."""

    def _grads_both(self, rule, mode, qshp, kshp, dtype, gqa=1,
                    dkv=(256, 256), seed=0):
        from tf_flash_attention_tpu.ops.backward import flash_backward
        from tf_flash_attention_tpu.ops.forward import flash_forward

        Lq, Lk = int(np.prod(qshp)), int(np.prod(kshp))
        pk = make_sync_pack(mode, qshp, kshp)
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.uniform(-1, 1, (2 * gqa, Lq, 32)), dtype)
        k = jnp.asarray(rng.uniform(-1, 1, (2, Lk, 32)), dtype)
        v = jnp.asarray(rng.uniform(-1, 1, (2, Lk, 48)), dtype)
        do = jnp.asarray(rng.uniform(-1, 1, (2 * gqa, Lq, 48)), dtype)
        cfg = BlockConfig(128, 128, 128, 128, dkv[0], dkv[1])
        os.environ["FA_WINDOW"] = "0"
        try:
            o, l, m = flash_forward(q, k, v, pack=pk, rule=rule, config=cfg,
                                    interpret=True)
            os.environ["FA_WINDOW_BWD"] = "1"
            got = flash_backward(q, k, v, o, l, m, do, pack=pk, rule=rule,
                                 config=cfg, fused=True, interpret=True)
            os.environ["FA_WINDOW_BWD"] = "0"
            want = flash_backward(q, k, v, o, l, m, do, pack=pk, rule=rule,
                                  config=cfg, fused=True, interpret=True)
        finally:
            os.environ.pop("FA_WINDOW_BWD", None)
            os.environ.pop("FA_WINDOW", None)
        return got, want

    def _close(self, got, want, dtype):
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
        for name, a, b in zip("QKV", got, want):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=tol, atol=tol, err_msg=f"d{name}")

    def test_eligibility_transposed(self):
        pk = make_sync_pack("none_front", (64, 64), (64, 64))
        wt = window_band_table_t(pk, W8, 256, 4096, 4096, 4096, 4096)
        assert wt is not None
        starts, W, slots, masks = wt
        assert starts.shape == (16,) and W % 128 == 0
        assert masks is not None and masks.shape[1:] == (W, 256)
        # causal 1d refuses (wide-variance q bands)
        pk1 = make_sync_pack("none_front", (4096,), (4096,))
        assert window_band_table_t(pk1, CausalRule(), 256,
                                   4096, 4096, 4096, 4096) is None

    @pytest.mark.parametrize("mode", ["none_front", "scale_end"])
    def test_local_2d(self, mode):
        got, want = self._grads_both(W8, mode, (16, 16), (16, 16),
                                     jnp.float32)
        self._close(got, want, jnp.float32)

    def test_gqa_and_strided(self):
        rule = LocalRule(window_size=4, log2_stride_size=1, is_causal=True)
        got, want = self._grads_both(rule, "none_front", (16, 16), (16, 16),
                                     jnp.bfloat16, gqa=2)
        self._close(got, want, jnp.bfloat16)

    def test_1d_odd_lengths(self):
        rule = LocalRule(window_size=64, log2_stride_size=0, is_causal=True)
        got, want = self._grads_both(rule, "none_front", (777,), (513,),
                                     jnp.float32)
        self._close(got, want, jnp.float32)
