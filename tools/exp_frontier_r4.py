#!/usr/bin/env python
"""Round-4 frontier adjudication bundle (one chip window, ~8 min).

Measures, with the hardened paired-difference sampling and median
selection (docs/TUNING.md round-4 methodology):

  1. chip state (mxu_ref + causal 1024^2 median);
  2. forward frontier: banded vs table kernel at the bench shape;
  3. fused-backward frontier: (block_q_dkv, block_kv_dkv) candidates;
  4. JAX's production pallas flash kernel on identical shapes and
     pricing (the README like-for-like row);
  5. the waste-aware solver's local_2d pick vs the old 1024^2 default;
  6. long-seq causal (S=16384).

Writes a human log to stdout; run under `python -u`.
"""

import functools
import os
import statistics
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med(samples):
    return statistics.median(samples)


def main():
    import jax
    import jax.numpy as jnp

    from tf_flash_attention_tpu.block_sizes import (
        BlockConfig, choose_block_config)
    from tf_flash_attention_tpu.flops import (
        matmul_flops_backward, matmul_flops_forward)
    from tf_flash_attention_tpu.mask_rules import CausalRule, LocalRule
    from tf_flash_attention_tpu.ops.backward import flash_backward
    from tf_flash_attention_tpu.ops.forward import flash_forward
    from tf_flash_attention_tpu.sync_modes import make_sync_pack
    from tf_flash_attention_tpu.utils.profiling import (
        device_time, device_time_samples)

    S, B, D = 4096, 8, 128
    rng = np.random.default_rng(0)
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
    q, k, v = t((B, S, D)), t((B, S, D)), t((B, S, D))
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule()
    f128 = matmul_flops_forward(rule, "none_front", (S,), (S,), D, D, B)

    # 1. state
    a = t((4096, 4096)); b2 = t((4096, 4096))
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    mxu = 2 * 4096**3 / min(
        device_time(mm, (a, b2), n=20) for _ in range(2)) / 1e12
    print(f"[state] mxu_ref={mxu:.1f} TFLOP/s", flush=True)

    def fwd_fn(cfg, banded):
        def f(q, k, v):
            os.environ["FA_BANDED"] = "1" if banded else "0"
            return flash_forward(q, k, v, pack=pack, rule=rule, config=cfg)[0]
        return f

    # 2. forward frontier
    for name, bq, bk, banded, narrow in [
        ("table  1024x1024", 1024, 1024, False, False),
        ("banded 1024x1024", 1024, 1024, True, False),
        ("banded 1024x1024 narrow-stats", 1024, 1024, True, True),
        ("banded 2048x1024", 2048, 1024, True, False),
        ("banded 2048x2048", 2048, 2048, True, False),
    ]:
        cfg = BlockConfig(bq, bk, bq, bk, bq, bk)
        os.environ["FA_BANDED"] = "1" if banded else "0"
        if narrow:
            os.environ["FA_NARROW_STATS"] = "1"
        else:
            os.environ.pop("FA_NARROW_STATS", None)
        fn = lambda q, k, v, cfg=cfg: flash_forward(
            q, k, v, pack=pack, rule=rule, config=cfg)[0]
        try:
            jax.block_until_ready(jax.jit(fn)(q, k, v))
        except Exception as e:
            print(f"[fwd] {name}: FAIL {str(e)[:120]}", flush=True)
            continue
        s = device_time_samples(fn, (q, k, v), n=25, reps=8)
        print(f"[fwd] {name}: median {med(s)*1e3:.4f} ms / min "
              f"{min(s)*1e3:.4f}  -> {f128/med(s)/1e12:.1f} TFLOP/s "
              f"128-priced", flush=True)
    os.environ.pop("FA_BANDED", None)
    os.environ.pop("FA_NARROW_STATS", None)

    # 3. fused backward frontier
    fcfg = BlockConfig(1024, 1024, 1024, 1024, 1024, 1024)
    o, l, m = jax.block_until_ready(jax.jit(
        lambda q, k, v: flash_forward(q, k, v, pack=pack, rule=rule,
                                      config=fcfg))(q, k, v))
    bflops = matmul_flops_backward(rule, "none_front", (S,), (S,), D, D, B)
    for bq2, bk2 in [(1024, 1024), (512, 1024), (512, 512), (1024, 512)]:
        cfg = BlockConfig(1024, 1024, 1024, 512, bq2, bk2)
        fn = lambda *args, cfg=cfg: flash_backward(
            *args, pack=pack, rule=rule, config=cfg, fused="kv")
        args = (q, k, v, o, l, m, k)
        try:
            jax.block_until_ready(jax.jit(fn)(*args))
        except Exception as e:
            print(f"[bwd] fused {bq2}x{bk2}: FAIL {str(e)[:120]}", flush=True)
            continue
        s = device_time_samples(fn, args, n=12, reps=6)
        print(f"[bwd] fused {bq2}x{bk2}: median {med(s)*1e3:.4f} ms "
              f"-> {bflops/med(s)/1e12:.1f} useful TFLOP/s", flush=True)

    # 4. JAX production pallas flash kernel, same shape + pricing
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)

        qj = q[:, None]  # (batch, heads, seq, d) layout: B batch, 1 head
        kj, vj = k[:, None], v[:, None]
        bs = BlockSizes(block_q=1024, block_k_major=1024, block_k=1024,
                        block_b=1)
        fj = functools.partial(flash_attention, causal=True,
                               sm_scale=1.0 / np.sqrt(D), block_sizes=bs)
        jax.block_until_ready(jax.jit(fj)(qj, kj, vj))
        s = device_time_samples(fj, (qj, kj, vj), n=25, reps=8)
        print(f"[jax-prod] causal 1024-blocks: median {med(s)*1e3:.4f} ms "
              f"-> {f128/med(s)/1e12:.1f} TFLOP/s 128-priced", flush=True)
    except Exception as e:
        print(f"[jax-prod] FAIL {str(e)[:200]}", flush=True)

    # 5. local_2d waste-aware solver validation
    shp = (64, 64)
    pk = make_sync_pack("none_front", shp, shp)
    rl = LocalRule(window_size=8, log2_stride_size=0, is_causal=True)
    L = shp[0] * shp[1]
    f2 = matmul_flops_forward(rl, "none_front", shp, shp, D, D, B)
    for name, cfg in [
        ("old 1024x1024", BlockConfig(1024, 1024, 1024, 1024, 1024, 1024)),
        ("solver pick", choose_block_config(L, L, D, D, jnp.bfloat16,
                                            pack=pk, rule=rl)),
        ("256x512", BlockConfig(256, 512, 256, 512, 512, 256)),
    ]:
        fn = lambda q, k, v, cfg=cfg: flash_forward(
            q, k, v, pack=pk, rule=rl, config=cfg)[0]
        try:
            jax.block_until_ready(jax.jit(fn)(q, k, v))
        except Exception as e:
            print(f"[2d-local] {name}: FAIL {str(e)[:120]}", flush=True)
            continue
        s = device_time_samples(fn, (q, k, v), n=20, reps=5)
        print(f"[2d-local] {name} ({cfg.block_q}x{cfg.block_kv}): median "
              f"{med(s)*1e3:.4f} ms -> {f2/med(s)/1e12:.1f} TFLOP/s "
              f"128-priced", flush=True)

    # 6. long-seq causal
    S2, B2 = 16384, 2
    q2, k2, v2 = t((B2, S2, D)), t((B2, S2, D)), t((B2, S2, D))
    pack2 = make_sync_pack("none_front", (S2,), (S2,))
    f128_2 = matmul_flops_forward(rule, "none_front", (S2,), (S2,), D, D, B2)
    cfg = BlockConfig(1024, 1024, 1024, 1024, 1024, 1024)
    fn2 = lambda q, k, v: flash_forward(q, k, v, pack=pack2, rule=rule,
                                        config=cfg)[0]
    jax.block_until_ready(jax.jit(fn2)(q2, k2, v2))
    s = device_time_samples(fn2, (q2, k2, v2), n=12, reps=6)
    print(f"[long] causal S=16384 B=2: median {med(s)*1e3:.4f} ms -> "
          f"{f128_2/med(s)/1e12:.1f} TFLOP/s 128-priced", flush=True)


if __name__ == "__main__":
    main()
