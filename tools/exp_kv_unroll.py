"""Forward-kernel VPU/MXU overlap experiment (real chip).

The training forward kernel sits at ~137 TFLOP/s (~70% of raw bf16 peak)
because each grid step's softmax VPU chain serialises with its matmuls.
Hypothesis: unrolling TWO kv blocks per grid step — both QK^T matmuls
issued before either block's softmax — gives Mosaic's scheduler
independent MXU work to overlap with block 1's VPU chain.

Variants (full attention, bf16, S=4096, d=128, B=8 flattened):
  base      — one kv block per step (the production kernel's shape)
  unroll2   — two kv blocks per step, matmuls hoisted, sequential merges
  unroll2f  — two kv blocks, single fused merge (concat scores)

MEASURED (v5e, this simplified harness at BQ=BK=512):
  base 66 TFLOP/s, unroll2 76, unroll2f 101, unroll4 96.
Conclusion: hoisting matmuls buys ~15%; the big win is FEWER MERGES PER
BYTE (unroll2f), which in the production kernel is simply a larger
block_kv — already swept by its block-config candidates (the production
kernel reaches ~137 TFLOP/s on these shapes).  No new lever beyond the
existing block-size tuning; kept as the record of the attempt.
"""
import functools
import sys
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_flash_attention_tpu.block_sizes import LANE, VMEM_LIMIT
from tf_flash_attention_tpu.ops.kernel_common import LOG2E, NEG_INF_F32
from tf_flash_attention_tpu.utils.profiling import V5E, device_time

B, S, D = 8, 4096, 128
BQ, BK = 512, 512
SCALE = 1.0 / np.sqrt(D)


def kern(q_ref, k_ref, v_ref, o_ref, acc, m_s, l_s, *, nkv, n_kv_steps):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_INF_F32)
        l_s[...] = jnp.zeros_like(l_s)
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0]
    # hoist all matmuls before any VPU chain
    ss = []
    for j in range(nkv):
        k = k_ref[0, j]
        ss.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * jnp.float32(SCALE * LOG2E))
    for j in range(nkv):
        v = v_ref[0, j]
        s = ss[j]
        m_prev = m_s[:, :1]
        l_prev = l_s[:, :1]
        m_next = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_next)
        pw = jnp.exp2(s - m_next)
        l_s[...] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(pw, axis=1, keepdims=True), l_s.shape)
        m_s[...] = jnp.broadcast_to(m_next, m_s.shape)
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            pw.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kv == n_kv_steps - 1)
    def _f():
        o_ref[0] = (acc[...] / l_s[:, :1]).astype(o_ref.dtype)


def kern_fused(q_ref, k_ref, v_ref, o_ref, acc, m_s, l_s, *, nkv, n_kv_steps):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_INF_F32)
        l_s[...] = jnp.zeros_like(l_s)
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0]
    ss = [jax.lax.dot_general(q, k_ref[0, j], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
          * jnp.float32(SCALE * LOG2E) for j in range(nkv)]
    s = jnp.concatenate(ss, axis=1) if nkv > 1 else ss[0]
    m_prev = m_s[:, :1]
    l_prev = l_s[:, :1]
    m_next = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_next)
    pw = jnp.exp2(s - m_next)
    l_s[...] = jnp.broadcast_to(
        alpha * l_prev + jnp.sum(pw, axis=1, keepdims=True), l_s.shape)
    m_s[...] = jnp.broadcast_to(m_next, m_s.shape)
    pv = None
    for j in range(nkv):
        c = jax.lax.dot_general(
            pw[:, j * BK:(j + 1) * BK].astype(jnp.bfloat16), v_ref[0, j],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        pv = c if pv is None else pv + c
    acc[...] = acc[...] * alpha + pv

    @pl.when(kv == n_kv_steps - 1)
    def _f():
        o_ref[0] = (acc[...] / l_s[:, :1]).astype(o_ref.dtype)


def build(nkv, fused=False):
    n_kv_steps = S // (BK * nkv)
    f = pl.pallas_call(
        functools.partial(kern_fused if fused else kern,
                          nkv=nkv, n_kv_steps=n_kv_steps),
        grid=(B, S // BQ, n_kv_steps),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, nkv, BK, D), lambda b, i, j: (b, j, 0, 0)),
            pl.BlockSpec((1, nkv, BK, D), lambda b, i, j: (b, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BQ, D), jnp.float32),
            pltpu.VMEM((BQ, LANE), jnp.float32),
            pltpu.VMEM((BQ, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )
    return f


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, (B, S, D)), jnp.bfloat16)
    kkv = jnp.asarray(rng.uniform(-1, 1, (B, S // BK, BK, D)), jnp.bfloat16)
    flops = 4 * B * S * S * D

    ref = None
    for name, nkv, fused in (("base", 1, False), ("unroll2", 2, False),
                             ("unroll2f", 2, True), ("unroll4", 4, False)):
        try:
            f = build(nkv, fused)
            o = f(q, kkv, kkv)
            if ref is None:
                ref = np.asarray(o, np.float32)
                err = 0.0
            else:
                err = np.abs(np.asarray(o, np.float32) - ref).max()
            t = device_time(f, (q, kkv, kkv), n=10, reps=4)
            print(f"{name:9s}: {t*1e3:.3f} ms, {flops/t/1e12:.1f} TFLOP/s, "
                  f"err={err:.2e}")
        except Exception as e:
            print(f"{name:9s}: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
