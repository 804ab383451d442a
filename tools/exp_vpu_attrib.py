"""Forward-kernel cost attribution on the real chip (round 2).

VERDICT.md item 1 asks either for >=167 TFLOP/s or a rigorous
microbenchmark establishing the hardware ceiling.  This tool measures a
ladder of kernel variants at the SAME grid/tiles/schedule as the production
causal forward (bf16, S=4096, d=128, B=8, 2048x2048 blocks), each removing
one piece of the online-softmax chain:

  prod     full production math (max, exp2, sum, merge, rescale)
  nomax    running max dropped (p = exp2(s - const))
  noexp    exp2 dropped (p = s - m)
  nosum    l-update dropped
  bf16exp  exp2 computed in bf16 instead of fp32
  mm       pure MXU: p = s.astype(bf16), no softmax at all

The 'mm' line is the hardware floor for this schedule (two matmuls + the
unavoidable f32->bf16 cast); prod - mm is the total VPU serial exposure.
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
from tf_flash_attention_tpu.utils.profiling import device_time

B, S, D = 8, 4096, 128
BQ, BK = 2048, 2048
SCALE = 1.0 / np.sqrt(D)


def kern(q_ref, k_ref, v_ref, o_ref, acc, m_s, l_s, *, variant, n_steps):
    step = pl.program_id(2)

    @pl.when(step == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_INF_F32)
        l_s[...] = jnp.zeros_like(l_s)
        acc[...] = jnp.zeros_like(acc)

    qi = pl.program_id(1)
    # causal schedule at BQ == BK: q block qi visits kv blocks 0..qi
    in_bounds = step <= qi

    @pl.when(in_bounds)
    def _upd():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant == "mm":
            p = s.astype(jnp.bfloat16)
            alpha = jnp.float32(1.0)
        else:
            if variant == "nomax":
                m_next = jnp.full_like(m_s[:, :1], 8.0)
            else:
                m_next = jnp.maximum(m_s[:, :1], jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_s[:, :1] - m_next)
            if variant == "noexp":
                p32 = s - m_next
            elif variant == "bf16exp":
                p32 = None
                p = jnp.exp2((s - m_next).astype(jnp.bfloat16))
            else:
                p32 = jnp.exp2(s - m_next)
            if p32 is not None:
                p = p32.astype(jnp.bfloat16)
            if variant != "nosum":
                l_s[...] = jnp.broadcast_to(
                    alpha * l_s[:, :1]
                    + jnp.sum(p if p32 is None else p32, axis=1,
                              keepdims=True, dtype=jnp.float32),
                    l_s.shape)
            m_s[...] = jnp.broadcast_to(m_next, m_s.shape)
        pv = jax.lax.dot_general(
            p, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[...] = acc[...] * alpha + pv

    @pl.when(step == n_steps - 1)
    def _f():
        l = l_s[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc[...] / l).astype(o_ref.dtype)


def build(variant):
    n_steps = S // BK
    return pl.pallas_call(
        functools.partial(kern, variant=variant, n_steps=n_steps),
        grid=(B, S // BQ, n_steps),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, BK, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, BK, D), lambda b, i, j: (b, j, 0)),
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


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.uniform(-1, 1, (B, S, D)), jnp.bfloat16)
    q, k, v = (mk() * jnp.bfloat16(SCALE * LOG2E), mk(), mk())
    # live causal tiles at BQ == BK == 2048, S = 4096: 3 of 4
    n_live = sum(i + 1 for i in range(S // BQ))
    flops = 4 * B * BQ * BK * D * n_live
    for variant in ("prod", "nomax", "noexp", "nosum", "bf16exp", "mm"):
        try:
            f = build(variant)
            dt = device_time(f, (q, k, v), n=10, reps=4)
            print(f"{variant:8s}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"{variant:8s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
