"""Kernel parity tests — Pallas flash kernels vs the dense oracle.

Mirrors the reference's verification strategy (``tests/test_base.py:180-226``):
a case matrix of {sync modes} × {full, causal, local, local+stride,
local+causal, local+stride+causal}, forward outputs and all three input
gradients compared against a dense ("vanilla") attention oracle, with
tolerances scaled by the reduction lengths (``1e-6·K_entries`` for fp32,
``1e-3·K_entries`` for half dtypes — the reference's exact model).

Q sequence shapes differ from K/V so q≠k paths and all sync-mode scalings
are exercised (``test_base.py:156-160``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tf_flash_attention_tpu as fa
from tf_flash_attention_tpu.block_sizes import BlockConfig
from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule, LocalRule
from tf_flash_attention_tpu.ops.reference import reference_attention

# Small blocks so modest test shapes still exercise multi-block schedules.
SMALL_BLOCKS = BlockConfig(
    block_q=128, block_kv=128,
    block_q_dq=128, block_kv_dq=128,
    block_q_dkv=128, block_kv_dkv=128,
)

ATTENTION_CASES = {
    "full": FullRule(),
    "causal": CausalRule(),
    "local": LocalRule(window_size=7),
    "local_stride": LocalRule(window_size=5, log2_stride_size=2),
    "local_causal": LocalRule(window_size=7, is_causal=True),
    "local_stride_causal": LocalRule(window_size=5, log2_stride_size=1, is_causal=True),
}

# Reference case matrix (test_base.py:364-385): full runs only with
# none_front (sync mode cannot affect unmasked attention,
# flash_attention.py:93-95); every other family runs under all 3 modes.
CASE_MATRIX = [("full", "none_front")] + [
    (case, mode)
    for case in list(ATTENTION_CASES)[1:]
    for mode in ("none_front", "scale_front", "scale_end")
]

SHAPES_1D = {"q_seq": (220,), "k_seq": (310,), "d": 24, "v_d": 12}
SHAPES_2D = {"q_seq": (10, 22), "k_seq": (20, 11), "d": 24, "v_d": 12}


def make_data(seq_dims, dtype, shapes, seed=0):
    rng = np.random.default_rng(seed)
    batch = (2,)
    q_seq, k_seq, d, v_d = shapes["q_seq"], shapes["k_seq"], shapes["d"], shapes["v_d"]

    def t(shape):
        return jnp.asarray(rng.uniform(-2.0, 2.0, shape), dtype)

    Q = t(batch + (d,) + q_seq)
    K = t(batch + (d,) + k_seq)
    V = t(batch + (v_d,) + k_seq)
    dO = t(batch + (v_d,) + q_seq)
    return Q, K, V, dO


def tolerances(dtype, n_entries):
    base = 1e-3 if jnp.dtype(dtype).itemsize == 2 else 1e-6
    tol = base * n_entries
    return dict(rtol=tol, atol=tol)


def assert_close(a, b, dtype, n_entries, msg):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        err_msg=msg, **tolerances(dtype, n_entries),
    )


def run_case(case, sync_mode, seq_dims, dtype, check_backward=True):
    rule = ATTENTION_CASES[case]
    shapes = SHAPES_1D if seq_dims == 1 else SHAPES_2D
    Q, K, V, dO = make_data(seq_dims, dtype, shapes)
    n_k = int(np.prod(shapes["k_seq"]))
    n_q = int(np.prod(shapes["q_seq"]))

    def flash(Q, K, V):
        return fa.flash_attention(
            Q, K, V, rule=rule, sync_mode=sync_mode, seq_dims=seq_dims,
            returning_l_m=True, block_config=SMALL_BLOCKS,
        )

    def oracle(Q, K, V):
        return reference_attention(
            Q, K, V, rule=rule, sync_mode=sync_mode, seq_dims=seq_dims,
            returning_l_m=True,
        )

    (o1, l1, m1), flash_vjp = jax.vjp(flash, Q, K, V)
    (o2, l2, m2), oracle_vjp = jax.vjp(oracle, Q, K, V)

    label = f"{case}/{sync_mode}/{seq_dims}d/{dtype}"
    assert_close(o1, o2, dtype, n_k, f"{label}: O")
    assert_close(l1, l2, dtype, n_k, f"{label}: l")
    assert_close(m1, m2, dtype, n_k, f"{label}: m")
    assert o1.shape == o2.shape and l1.shape == l2.shape and m1.shape == m2.shape
    assert l1.dtype == l2.dtype and m1.dtype == m2.dtype

    if check_backward:
        zeros_lm = (jnp.zeros_like(l1), jnp.zeros_like(m1))
        g1 = flash_vjp((dO,) + zeros_lm)
        g2 = oracle_vjp((dO,) + zeros_lm)
        for name, a, b, scale_n in zip("QKV", g1, g2, (n_k, n_q, n_q)):
            assert_close(a, b, dtype, scale_n, f"{label}: d{name}")


@pytest.mark.parametrize("case,sync_mode", CASE_MATRIX,
                         ids=[f"{c}-{m}" for c, m in CASE_MATRIX])
def test_1d_fp32(case, sync_mode):
    run_case(case, sync_mode, seq_dims=1, dtype=jnp.float32)


@pytest.mark.parametrize("case,sync_mode", CASE_MATRIX,
                         ids=[f"{c}-{m}" for c, m in CASE_MATRIX])
def test_2d_fp32(case, sync_mode):
    run_case(case, sync_mode, seq_dims=2, dtype=jnp.float32)


@pytest.mark.parametrize("case,sync_mode",
                         [("causal", "scale_front"), ("local_stride_causal", "scale_end")])
def test_1d_bf16(case, sync_mode):
    run_case(case, sync_mode, seq_dims=1, dtype=jnp.bfloat16)


@pytest.mark.parametrize("case,sync_mode", [("causal", "none_front")])
def test_2d_bf16(case, sync_mode):
    run_case(case, sync_mode, seq_dims=2, dtype=jnp.bfloat16)


@pytest.mark.parametrize("case,sync_mode", [("causal", "none_front")])
def test_1d_fp16(case, sync_mode):
    """fp16 — the reference's headline half dtype (its *Float16 op family).
    On real TPUs the kernels compute fp16 in bf16 (Mosaic has no f16 MXU
    path); interpret mode runs it natively.  Both sit inside the
    reference's half tolerance model (1e-3·K_entries)."""
    run_case(case, sync_mode, seq_dims=1, dtype=jnp.float16)


def test_fully_masked_rows():
    """Queries ahead of every key (scale_end causal) must yield O=0, l=0,
    m=neg_inf_approx — the reference's fully-masked-row contract
    (flash_attention.cu:1008-1016)."""
    rng = np.random.default_rng(3)
    # q longer than k with causal: with none_front, trailing q rows see
    # nothing? No — causal sees backwards; instead make K entries all
    # *ahead* of early queries via scale_end offsets.
    Q = jnp.asarray(rng.uniform(-1, 1, (1, 8, 33)), jnp.float32)
    K = jnp.asarray(rng.uniform(-1, 1, (1, 8, 4)), jnp.float32)
    V = jnp.asarray(rng.uniform(-1, 1, (1, 6, 4)), jnp.float32)
    # scale_end: K orders = {7, 15, 23, 31}; Q orders = 0..32.  Query 0
    # (order 0) precedes every key -> fully masked.
    O, l, m = fa.causal_1d(Q, K, V, sync_mode="scale_end", returning_l_m=True,
                           block_config=SMALL_BLOCKS)
    from tf_flash_attention_tpu.utils.dtypes import neg_inf_approx
    np.testing.assert_array_equal(np.asarray(O[..., 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(l[..., 0]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(m[..., 0]), np.float32(neg_inf_approx(jnp.float32))
    )
    # and the same rows produce zero gradients
    g = jax.grad(lambda q: jnp.sum(fa.causal_1d(q, K, V, sync_mode="scale_end",
                                                block_config=SMALL_BLOCKS)))(Q)
    np.testing.assert_array_equal(np.asarray(g[..., 0]), 0.0)


@pytest.mark.parametrize("g", [1, 4])
def test_fused_backward_matches_split(g):
    """The fused single-pass backward (5 scheduled GEMMs, whole-sequence
    VMEM dQ accumulator, group-blocked GQA streaming) must agree with the
    two-kernel split, which is the behavioural spec (both implement the
    reference gradient math, flash_attention.cu:1079-1967)."""
    from tf_flash_attention_tpu.ops.backward import flash_backward
    from tf_flash_attention_tpu.ops.forward import flash_forward
    from tf_flash_attention_tpu.sync_modes import make_sync_pack

    rng = np.random.default_rng(11)
    cfg = BlockConfig(128, 128, 128, 128, 128, 128)
    for rule, qlen, klen, sync in [
        (CausalRule(), 300, 520, "scale_front"),
        (LocalRule(window_size=3, log2_stride_size=1, is_causal=True),
         384, 384, "none_front"),
    ]:
        pack = make_sync_pack(sync, (qlen,), (klen,))
        B_kv = 2
        q = jnp.asarray(rng.uniform(-2, 2, (B_kv * g, qlen, 32)), jnp.float32)
        k = jnp.asarray(rng.uniform(-2, 2, (B_kv, klen, 32)), jnp.float32)
        v = jnp.asarray(rng.uniform(-2, 2, (B_kv, klen, 24)), jnp.float32)
        do = jnp.asarray(rng.uniform(-2, 2, (B_kv * g, qlen, 24)), jnp.float32)
        o, l, m = flash_forward(q, k, v, pack=pack, rule=rule, config=cfg,
                                interpret=True)
        fus = flash_backward(q, k, v, o, l, m, do, pack=pack, rule=rule,
                             config=cfg, interpret=True, fused=True)
        spl = flash_backward(q, k, v, o, l, m, do, pack=pack, rule=rule,
                             config=cfg, interpret=True, fused=False)
        for name, x, y in zip(("dQ", "dK", "dV"), fus, spl):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-4,
                err_msg=f"{name} {rule} {qlen}x{klen} {sync} g={g}")
