#!/usr/bin/env python
"""Quantify the bf16-compute deviation for fp16 callers (PARITY record).

The reference's ``*Float16`` op family computes in true half precision
(``hexp``/``hrsqrt`` intrinsics, ``kernel/type_util.h:47-153``); TPU has
no fp16 MXU path, so this repo computes fp16 inputs in bf16
(``ops/forward.py``).  bf16 keeps fp16's range but has 8 mantissa bits to
fp16's 11, so fp16 callers see coarser rounding than the reference.
This tool measures that gap against an fp64 oracle on the SAME fp16
inputs:

* ``tpu bf16 kernel``  — this repo's fp16 path (interpret mode);
* ``fp16-chain sim``   — the reference's chain simulated by rounding
  every intermediate (logits, softmax numerators, probabilities, output)
  to float16, matmuls accumulated in fp32 (CUDA's ``cute::gemm`` on half
  fragments accumulates per-fragment; fp32 accumulation makes this a
  *lower bound* on the reference's error — the format-rounding floor);
* ``fp32 chain``       — context.

Output: max-relative-error table vs fp64, plus each error as a fraction
of the reference's own fp16 tolerance (1e-3 x k_len,
``tests/test_base.py:205-226``).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fp16_chain(q, k, v, scale):
    """Dense attention with every intermediate rounded to float16."""
    f16 = lambda x: x.astype(np.float16).astype(np.float64)
    s = f16(np.einsum("bqd,bkd->bqk", f16(q), f16(k)) * scale)
    m = s.max(-1, keepdims=True)
    p = f16(np.exp(f16(s - m)))
    l = f16(p.sum(-1, keepdims=True))
    return f16(np.einsum("bqk,bkd->bqd", p / l, f16(v)))


def fp64_oracle(q, k, v, scale):
    s = np.einsum("bqd,bkd->bqk", q, k) * scale
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    return np.einsum("bqk,bkd->bqd", p / p.sum(-1, keepdims=True), v)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tf_flash_attention_tpu.block_sizes import BlockConfig
    from tf_flash_attention_tpu.mask_rules import FullRule
    from tf_flash_attention_tpu.ops.forward import flash_forward
    from tf_flash_attention_tpu.sync_modes import make_sync_pack

    rng = np.random.default_rng(0)
    B, S, D = 2, 512, 64
    scale = 1.0 / np.sqrt(D)
    q64 = rng.uniform(-2, 2, (B, S, D))
    k64 = rng.uniform(-2, 2, (B, S, D))
    v64 = rng.uniform(-2, 2, (B, S, D))
    # inputs AS THE CALLER SUPPLIES THEM: fp16
    q16 = q64.astype(np.float16)
    k16 = k64.astype(np.float16)
    v16 = v64.astype(np.float16)
    oracle = fp64_oracle(q16.astype(np.float64), k16.astype(np.float64),
                         v16.astype(np.float64), scale)
    denom = np.abs(oracle).max()

    pack = make_sync_pack("none_front", (S,), (S,))
    cfg = BlockConfig(128, 128, 128, 128, 128, 128)
    o_tpu = np.asarray(flash_forward(
        jnp.asarray(q16), jnp.asarray(k16), jnp.asarray(v16),
        pack=pack, rule=FullRule(), config=cfg, interpret=True)[0],
        np.float64)
    # interpret mode computes f16 natively; emulate the real TPU path by
    # casting to bf16 first (the on-chip route, forward.py:219-228).
    b16 = lambda x: jnp.asarray(x).astype(jnp.bfloat16)
    o_bf = np.asarray(flash_forward(
        b16(q16), b16(k16), b16(v16),
        pack=pack, rule=FullRule(), config=cfg, interpret=True,
        fast_softmax=True)[0].astype(jnp.float32), np.float64)
    o_sim = fp16_chain(q16.astype(np.float64), k16.astype(np.float64),
                       v16.astype(np.float64), scale)
    o_f32 = fp64_oracle(q16.astype(np.float32), k16.astype(np.float32),
                        v16.astype(np.float32), scale).astype(np.float64)

    tol = 1e-3 * S  # the reference's fp16 unit-test tolerance model
    print(f"shape B={B} S={S} d={D}; reference fp16 tolerance = {tol:.3g}")
    print(f"{'chain':34s} {'max-rel err':>12s} {'of fp16 tol':>12s}")
    for name, o in [
        ("tpu fp16 path (bf16 compute+cast)", o_bf),
        ("tpu interpret (true fp16 in)", o_tpu),
        ("reference fp16-chain floor (sim)", o_sim),
        ("fp32 chain", o_f32),
    ]:
        err = np.abs(o - oracle).max() / denom
        print(f"{name:34s} {err:12.3e} {err / tol:12.5f}")


if __name__ == "__main__":
    main()
