"""fast_softmax error characterization (VERDICT round-2 item 7).

The forward kernel's bf16 exp2 chain (and, since round 3, the backward
P-recompute's) auto-enables for 16-bit inputs.  These tests pin the
numeric claim in ``ops/forward.py`` with measurements against an fp64
dense oracle across rules and shapes:

* exact-f32 chain on bf16 inputs:  max-relative O error ~2^-8.5 class
  (bf16 input quantization floor);
* fast bf16 chain:                 max-relative O error ~2^-7 class —
  roughly 2-2.5x the exact chain, still ~40x inside the reference's half
  tolerance model at the smallest k used here (1e-3·k, reference
  ``test_base.py:205-226``).

Also covers the escape hatches: ``fast_softmax=False`` per call and
``FA_FAST_SOFTMAX=0`` globally, and the ADVICE-round-2 ask that the
on-vs-off forward deviation is pinned by an assertion.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_flash_attention_tpu.block_sizes import BlockConfig
from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule, LocalRule
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.ops.reference import reference_attention
from tf_flash_attention_tpu.sync_modes import make_sync_pack

CFG = BlockConfig(128, 128, 128, 128, 128, 128)

CASES = [
    ("causal", CausalRule(), 220, 310),
    ("full", FullRule(), 128, 1024),
    ("local_stride", LocalRule(window_size=9, log2_stride_size=1), 256, 512),
]


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _run(rule, q_len, k_len, fast):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-2, 2, (2, q_len, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.uniform(-2, 2, (2, k_len, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.uniform(-2, 2, (2, k_len, 24)), jnp.bfloat16)
    pack = make_sync_pack("none_front", (q_len,), (k_len,))
    interpret = jax.default_backend() != "tpu"
    o, _, _ = flash_forward(q, k, v, pack=pack, rule=rule, config=CFG,
                            interpret=interpret, fast_softmax=fast)
    return q, k, v, o


def _oracle64(q, k, v, rule):
    mv = lambda x: jnp.moveaxis(x.astype(jnp.float64), -1, 1)
    o64 = reference_attention(mv(q), mv(k), mv(v), rule=rule,
                              sync_mode="none_front", seq_dims=1)
    return jnp.moveaxis(o64, 1, -1)


@pytest.mark.parametrize("name,rule,q_len,k_len", CASES,
                         ids=[c[0] for c in CASES])
def test_fast_softmax_error_vs_fp64(name, rule, q_len, k_len, x64):
    q, k, v, o_fast = _run(rule, q_len, k_len, fast=True)
    _, _, _, o_exact = _run(rule, q_len, k_len, fast=False)
    o64 = _oracle64(q, k, v, rule)
    scale = float(jnp.max(jnp.abs(o64)))
    err_fast = float(jnp.max(jnp.abs(o_fast.astype(jnp.float64) - o64))) / scale
    err_exact = float(jnp.max(jnp.abs(o_exact.astype(jnp.float64) - o64))) / scale
    dev = float(jnp.max(jnp.abs(
        o_fast.astype(jnp.float64) - o_exact.astype(jnp.float64)))) / scale
    # Measured (CPU interpret, seed 0): err_fast 0.004-0.009,
    # err_exact 0.003-0.006 (grows with k), dev 0.004-0.008.
    # Bounds at ~1.5x margin.
    assert err_exact <= 0.009, (name, err_exact)
    assert err_fast <= 0.014, (name, err_fast)
    assert dev <= 0.014, (name, dev)
    # fast may not degrade the oracle error by more than ~3x
    assert err_fast <= 3.0 * err_exact + 1e-3, (name, err_fast, err_exact)
    # and everything sits far inside the reference half tolerance (1e-3*k)
    assert err_fast * scale <= 1e-3 * k_len


def test_fast_softmax_env_escape_hatch(monkeypatch):
    """FA_FAST_SOFTMAX=0 must force the exact chain for the auto policy."""
    rule = CausalRule()
    _, _, _, o_auto_off_env = (None, None, None, None)
    monkeypatch.setenv("FA_FAST_SOFTMAX", "0")
    q, k, v, o_env = _run(rule, 64, 96, fast=None)
    monkeypatch.delenv("FA_FAST_SOFTMAX")
    _, _, _, o_exact = _run(rule, 64, 96, fast=False)
    _, _, _, o_auto = _run(rule, 64, 96, fast=None)
    np.testing.assert_array_equal(np.asarray(o_env, np.float32),
                                  np.asarray(o_exact, np.float32))
    # auto (16-bit) uses the fast chain -> generally differs from exact
    assert o_auto.dtype == o_exact.dtype
