#!/usr/bin/env python
"""Prototype: resident-KV forward kernel (round-4 perf experiment).

Structure: grid (B, n_q_blocks); K and V BlockSpecs are whole-sequence
windows with a block index constant in the q axis, so Pallas fetches them
ONCE per batch row and they stay resident in VMEM.  The kv loop is an
in-kernel ``lax.fori_loop`` whose trip count is the per-q-block live
bound from the skip schedule — grid-step overheads (scratch init
branches, table lookups, window bookkeeping) vanish, and the causal
diagonal is tiled at the fine loop granularity without `pl.when`
branches (the round-4 bitmask experiment showed those cost 2-3x).

Compares against the production kernel on the bench shape.
"""

import functools
import os
import statistics
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resident_forward(q, k, v, *, block_q, block_kv, scale=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tf_flash_attention_tpu.block_sizes import VMEM_LIMIT
    from tf_flash_attention_tpu.ops.kernel_common import LOG2E, NEG_INF_F32

    B, S, D = q.shape
    assert S % block_q == 0 and S % block_kv == 0
    n_q = S // block_q
    if scale is None:
        scale = 1.0 / np.sqrt(D)
    q = (q.astype(jnp.float32) * jnp.float32(scale * LOG2E)).astype(q.dtype)

    # causal: q block qi covers rows [qi*bq, (qi+1)*bq); live kv sub-tiles
    # j*bkv < (qi+1)*bq  ->  count = ceil((qi+1)*bq / bkv)
    counts = np.array([-(-((qi + 1) * block_q) // block_kv)
                       for qi in range(n_q)], np.int32)

    def kernel(counts_ref, q_ref, k_ref, v_ref, o_ref,
               acc_ref, m_ref, l_ref):
        qi = pl.program_id(1)
        count = counts_ref[qi]

        m0 = jnp.full((block_q, 128), NEG_INF_F32, jnp.float32)
        l0 = jnp.zeros((block_q, 128), jnp.float32)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = m0
        l_ref[...] = l0

        def body(j, carry, masked):
            col = j * block_kv
            kk = k_ref[0, pl.ds(col, block_kv), :]
            s = jax.lax.dot_general(
                q_ref[0], kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if masked:
                q_pos = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0)
                k_pos = col + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_kv), 1)
                s = jnp.where(q_pos >= k_pos, s, NEG_INF_F32)
            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2((s - m_next).astype(jnp.bfloat16))
            l_next = alpha * l_prev + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32)
            m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, pl.ds(col, block_kv), :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + pv
            return carry

        # interior sub-tiles: maskless; the last one is the diagonal.
        jax.lax.fori_loop(0, count - 1, functools.partial(body, masked=False),
                          0, unroll=True)
        body(count - 1, 0, masked=True)

        l_col = l_ref[:, :1]
        l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)

    grid = (B, n_q)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, qi, c: (b, qi, 0)),
                pl.BlockSpec((1, S, D), lambda b, qi, c: (b, 0, 0)),
                pl.BlockSpec((1, S, D), lambda b, qi, c: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, c: (b, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
    )(jnp.asarray(counts), q, k, v)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from tf_flash_attention_tpu.block_sizes import BlockConfig
    from tf_flash_attention_tpu.flops import matmul_flops_forward
    from tf_flash_attention_tpu.mask_rules import CausalRule
    from tf_flash_attention_tpu.ops.forward import flash_forward
    from tf_flash_attention_tpu.sync_modes import make_sync_pack
    from tf_flash_attention_tpu.utils.profiling import device_time

    S, B, D = 4096, 8, 128
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
    q, k, v = t((B, S, D)), t((B, S, D)), t((B, S, D))
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule()
    flops_128 = matmul_flops_forward(rule, "none_front", (S,), (S,), D, D, B)

    a = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    b2 = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    mxu_ref = 2 * 4096**3 / min(
        device_time(mm, (a, b2), n=20) for _ in range(3)) / 1e12
    print(f"mxu_ref = {mxu_ref:.1f} TFLOP/s", flush=True)

    # reference output from the production kernel
    cfg = BlockConfig(1024, 1024, 1024, 1024, 1024, 1024)
    base_fn = lambda q, k, v: flash_forward(
        q, k, v, pack=pack, rule=rule, config=cfg)[0]
    o_ref = jax.block_until_ready(jax.jit(base_fn)(q, k, v))

    variants = [("prod 1024x1024", base_fn)]
    for bq, bkv in [(1024, 1024), (1024, 512), (512, 512),
                    (256, 256), (512, 256), (1024, 256), (2048, 512)]:
        variants.append((
            f"resident {bq}x{bkv}",
            functools.partial(resident_forward, block_q=bq, block_kv=bkv)))

    for name, fn in variants:
        try:
            o = jax.block_until_ready(jax.jit(fn)(q, k, v))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)
            continue
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                    - o_ref.astype(jnp.float32))))
        if err > 1e-2:
            print(f"{name}: PARITY FAIL {err}", flush=True)
            continue
        samples = [device_time(fn, (q, k, v), n=30) for _ in range(6)]
        med = statistics.median(samples)
        mn = min(samples)
        print(f"{name}: min {mn*1e3:.4f} / median {med*1e3:.4f} ms  "
              f"{flops_128/med/1e12:.1f} TFLOP/s useful (median)", flush=True)


if __name__ == "__main__":
    main()
