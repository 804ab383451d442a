#!/usr/bin/env python
"""On-chip benchmark: fused 5-GEMM backward vs the two-kernel split.

Useful-TFLOP/s pricing throughout (canonical 5-GEMM gradient count,
`flops.matmul_flops_backward`, no recompute credit).  Also measures the
GQA group-blocked streaming variant against the round-3 schedule replay.

Usage: python tools/exp_fused_bwd.py [quick]
"""

import os
import statistics
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tf_flash_attention_tpu.block_sizes import BlockConfig
    from tf_flash_attention_tpu.flops import matmul_flops_backward
    from tf_flash_attention_tpu.mask_rules import CausalRule
    from tf_flash_attention_tpu.ops.backward import flash_backward
    from tf_flash_attention_tpu.ops.forward import flash_forward
    from tf_flash_attention_tpu.sync_modes import make_sync_pack
    from tf_flash_attention_tpu.utils.profiling import device_time

    S, B, D = 4096, 8, 128
    quick = "quick" in sys.argv
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
    q, k, v = t((B, S, D)), t((B, S, D)), t((B, S, D))
    do = t((B, S, D))
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule()
    bwd_flops = matmul_flops_backward(rule, "none_front", (S,), (S,), D, D, B)

    a = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    b2 = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    mxu_ref = 2 * 4096**3 / min(
        device_time(mm, (a, b2), n=20) for _ in range(3)) / 1e12
    print(f"mxu_ref = {mxu_ref:.1f} TFLOP/s", flush=True)

    fcfg = BlockConfig(1024, 1024, 1024, 1024, 1024, 1024)
    o, l, m = jax.block_until_ready(jax.jit(
        lambda q, k, v: flash_forward(q, k, v, pack=pack, rule=rule,
                                      config=fcfg))(q, k, v))

    cases = [
        ("split dq1024x512 dkv512x1024", False, (1024, 512, 512, 1024)),
        ("fused 512x1024", True, (1024, 512, 512, 1024)),
        ("fused 1024x1024", True, (1024, 512, 1024, 1024)),
        ("fused 512x512", True, (1024, 512, 512, 512)),
        ("fused 256x1024", True, (1024, 512, 256, 1024)),
        ("fused 1024x512", True, (1024, 512, 1024, 512)),
        ("fused 512x2048", True, (1024, 512, 512, 2048)),
    ]
    if quick:
        cases = cases[:3]
    n_samples = 4 if quick else 8

    ref = None
    for name, fused, (bq1, bk1, bq2, bk2) in cases:
        cfg = BlockConfig(1024, 1024, bq1, bk1, bq2, bk2)
        fn = lambda q, k, v, o, l, m, do: flash_backward(
            q, k, v, o, l, m, do, pack=pack, rule=rule, config=cfg,
            fused=fused)
        args = (q, k, v, o, l, m, do)
        try:
            out = jax.block_until_ready(jax.jit(fn)(*args))
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)
            continue
        if ref is None:
            ref = out
        else:
            errs = [float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                          - y.astype(jnp.float32))))
                    for x, y in zip(out, ref)]
            if max(errs) > 5e-2:
                print(f"{name}: PARITY FAIL {errs}", flush=True)
                continue
        floor_s = bwd_flops / (mxu_ref * 1e12)  # useful flops can't beat probe
        samples = []
        for _ in range(n_samples):
            dt = device_time(fn, args, n=15)
            if dt >= 0.95 * floor_s:
                samples.append(dt)
        if not samples:
            print(f"{name}: all samples implausible", flush=True)
            continue
        med, mn = statistics.median(samples), min(samples)
        print(f"{name}: min {mn*1e3:.4f} / median {med*1e3:.4f} ms  "
              f"{bwd_flops/med/1e12:.1f} useful TFLOP/s (median)", flush=True)

    # GQA (VERDICT r3 item 7): native grouped K/V (no materialisation)
    # must not lose to repeat-materialised K/V on fwd+bwd.  Grouped now
    # streams group-blocked (g, block_q) q/do windows in the split
    # kernels; materialised pays g x the KV HBM footprint and g x the
    # KV DMA but runs at g=1 (fused-eligible).
    print("\nGQA fwd+bwd (B_kv=2, g=8):", flush=True)
    qg = t((16, S, D)); kg = t((2, S, D)); vg = t((2, S, D)); dog = t((16, S, D))
    cfg = BlockConfig(1024, 1024, 1024, 512, 512, 1024)

    def grouped(q, k, v, do):
        o, l, m = flash_forward(q, k, v, pack=pack, rule=rule, config=cfg)
        return flash_backward(q, k, v, o, l, m, do, pack=pack, rule=rule,
                              config=cfg)

    def materialized(q, k, v, do):
        kr = jnp.repeat(k, 8, axis=0)
        vr = jnp.repeat(v, 8, axis=0)
        o, l, m = flash_forward(q, kr, vr, pack=pack, rule=rule, config=cfg)
        dq, dk, dv = flash_backward(q, kr, vr, o, l, m, do, pack=pack,
                                    rule=rule, config=cfg)
        return dq, dk.reshape(2, 8, S, D).sum(1), dv.reshape(2, 8, S, D).sum(1)

    for name, fn in [("grouped(native)", grouped),
                     ("materialized(repeat)", materialized)]:
        args = (qg, kg, vg, dog)
        try:
            jax.block_until_ready(jax.jit(fn)(*args))
        except Exception as e:
            print(f"  {name}: FAILED {str(e)[:200]}", flush=True)
            continue
        samples = [device_time(fn, args, n=8) for _ in range(4)]
        med = statistics.median(samples)
        print(f"  {name}: median {med*1e3:.4f} ms (fwd+bwd)", flush=True)


if __name__ == "__main__":
    main()
