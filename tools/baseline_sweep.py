#!/usr/bin/env python
"""Measure every BASELINE.json config family on the attached TPU.

The §6 metric loop: for each family, wall time + TFLOP/s (analytic
skip-aware FLOPs over the same block-skip schedule the kernel runs) and
max-abs error vs the dense XLA oracle, checked against the reference's
tolerance model (1e-6·k_len fp32, 1e-3·k_len half,
``tests/test_base.py:205-226``).

Families (BASELINE.json "configs"):
  1. full_1d fp32, README shapes Q=[8,32,1024] K=[8,32,2048] V=[8,16,2048]
  2. causal_1d bf16 + fp16 with the LSE (l, m)-recompute backward
  3. local_1d window=32, log2_stride sweep, is_causal, all 3 sync modes
  4. 2d full/causal/local with scale_front/scale_end cross-resolution sync
  5. decode serving — covered by ``FA_BENCH_MODE=decode python bench.py``

Usage: python tools/baseline_sweep.py  (needs the TPU; ~5-10 min of
compiles on first run)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import tf_flash_attention_tpu as fa
    from tf_flash_attention_tpu.block_sizes import (
        BlockConfig, LANE, choose_block_config, pad_to)
    from tf_flash_attention_tpu.flops import matmul_flops_forward
    from tf_flash_attention_tpu.mask_rules import make_rule
    from tf_flash_attention_tpu.utils.profiling import device_time

    assert jax.default_backend() == "tpu", "sweep needs the TPU"
    rng = np.random.default_rng(0)

    def data(shape, dtype):
        return jnp.asarray(rng.uniform(-2, 2, shape), dtype)

    rows = []

    def run(name, api, Qs, Ks, Vs, dtype, *, backward=False, seq_dims=1,
            rule_kind="full", rule_kwargs=None, check=True, **api_kwargs):
        rule_kwargs = rule_kwargs or {}
        Q, K, V = data(Qs, dtype), data(Ks, dtype), data(Vs, dtype)
        fwd = lambda Q, K, V: api(Q, K, V, **api_kwargs)

        o = fwd(Q, K, V)
        k_len = int(np.prod(Ks[-seq_dims:]))
        if check:
            # parity vs the dense oracle at fp32 (the oracle materialises
            # the dense q_len x k_len mask, so long-seq entries skip it)
            o_ref = api(Q.astype(jnp.float32), K.astype(jnp.float32),
                        V.astype(jnp.float32), implementation="xla", **api_kwargs)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref)))
            base = 1e-3 if jnp.dtype(dtype).itemsize == 2 else 1e-6
            tol = base * k_len
            ok = "OK " if err <= tol else "FAIL"
        else:
            err, tol, ok = float("nan"), float("nan"), "-- "

        # analytic MXU FLOPs over the kernel's own schedule/blocks
        q_seq, k_seq = Qs[-seq_dims:], Ks[-seq_dims:]
        d, v_d = Qs[-seq_dims - 1], Vs[-seq_dims - 1]
        B = int(np.prod(Qs[: -seq_dims - 1]))
        cfg = choose_block_config(int(np.prod(q_seq)), k_len,
                                  pad_to(d, LANE), pad_to(v_d, LANE), dtype)
        rule = make_rule(rule_kind, **rule_kwargs)
        sync = api_kwargs.get("sync_mode", "none_front")
        flops = matmul_flops_forward(rule, sync, q_seq, k_seq, d, v_d, B,
                                     cfg.block_q, cfg.block_kv)
        if backward:
            do = data(o.shape, dtype)
            def f(Q, K, V):
                out, vjp = jax.vjp(fwd, Q, K, V)
                dq, dk, dv = vjp(do)
                # depend on all three so no backward kernel is DCE'd
                return dq + dk + dv
            # exact per-kernel MXU accounting over each kernel's own
            # schedule: dQ kernel = S-recompute(d) + dP(v_d) + dS·K(d);
            # dK/dV kernel = S-recompute(d) + dV(v_d) + dP(v_d) + dSᵀ·Q(d)
            from tf_flash_attention_tpu.schedule import build_schedule
            from tf_flash_attention_tpu.sync_modes import make_sync_pack
            pk = make_sync_pack(sync, q_seq, k_seq)
            live_dq = int(build_schedule(pk, rule, cfg.block_q_dq,
                                         cfg.block_kv_dq).live.sum())
            live_dkv = int(build_schedule(pk, rule, cfg.block_q_dkv,
                                          cfg.block_kv_dkv).live.sum())
            flops += 2.0 * cfg.block_q_dq * cfg.block_kv_dq * (2 * d + v_d) * live_dq * B
            flops += 2.0 * cfg.block_q_dkv * cfg.block_kv_dkv * (2 * d + 2 * v_d) * live_dkv * B
        else:
            f = fwd
        # reject physically-impossible samples (tunnel timing glitches):
        # scheduled MXU flops cannot exceed the raw 197 TFLOP/s bf16 peak
        # (fp32 runs the 6-pass decomposition at ~1/6 of that)
        peak = 197e12 if jnp.dtype(dtype).itemsize == 2 else 197e12 / 6
        floor = flops / peak
        samples = [device_time(f, (Q, K, V), n=10) for _ in range(4)]
        valid = [s for s in samples if s >= floor]
        dt = min(valid) if valid else max(samples)
        rows.append((name, dt * 1e3, flops / dt / 1e12, err, tol, ok))
        print(f"{name:58s} {dt*1e3:8.3f} ms {flops/dt/1e12:7.1f} TFLOP/s "
              f"err {err:9.2e} tol {tol:8.1e} {ok}", flush=True)

    # 1. full_1d fp32 README shapes
    run("full_1d fp32 Q=[8,32,1024] K=[8,32,2048] (README)", fa.full_1d,
        (8, 32, 1024), (8, 32, 2048), (8, 16, 2048), jnp.float32)

    # 2. causal_1d half dtypes with LSE backward
    for dt_ in (jnp.bfloat16, jnp.float16):
        nm = jnp.dtype(dt_).name
        run(f"causal_1d {nm} S=4096 d=128 B=8 fwd", fa.causal_1d,
            (8, 128, 4096), (8, 128, 4096), (8, 128, 4096), dt_,
            rule_kind="causal", sync_mode="none_front")
        run(f"causal_1d {nm} S=4096 d=128 B=8 fwd+bwd (LSE)", fa.causal_1d,
            (8, 128, 4096), (8, 128, 4096), (8, 128, 4096), dt_,
            rule_kind="causal", sync_mode="none_front", backward=True)

    # 3. local_1d window=32, stride sweep, all sync modes (q != k so the
    #    scale modes actually rescale)
    for s, mode in ((0, "none_front"), (1, "scale_front"), (2, "scale_end")):
        run(f"local_1d bf16 w=32 log2_stride={s} causal {mode}", fa.local_1d,
            (8, 128, 2048), (8, 128, 4096), (8, 128, 4096), jnp.bfloat16,
            rule_kind="local",
            rule_kwargs=dict(window_size=32, log2_stride_size=s, is_causal=True),
            window_size=32, log2_stride_size=s, is_causal=True, sync_mode=mode)

    # 4. 2d with cross-resolution sync
    run("full_2d bf16 Q=(32,64) K=(64,64) scale_front", fa.full_2d,
        (4, 64, 32, 64), (4, 64, 64, 64), (4, 64, 64, 64), jnp.bfloat16,
        seq_dims=2, sync_mode="scale_front")
    run("causal_2d bf16 Q=(32,64) K=(64,64) scale_end", fa.causal_2d,
        (4, 64, 32, 64), (4, 64, 64, 64), (4, 64, 64, 64), jnp.bfloat16,
        seq_dims=2, rule_kind="causal", sync_mode="scale_end")
    run("local_2d bf16 w=8 s=1 causal Q=(32,64) K=(64,64) scale_front",
        fa.local_2d,
        (4, 64, 32, 64), (4, 64, 64, 64), (4, 64, 64, 64), jnp.bfloat16,
        seq_dims=2, rule_kind="local",
        rule_kwargs=dict(window_size=8, log2_stride_size=1, is_causal=True),
        window_size=8, log2_stride_size=1, is_causal=True,
        sync_mode="scale_front")

    # north star: seq 1k-64k.  Batch shrinks with S to bound wall time;
    # per-chip TFLOP/s is batch-insensitive at these sizes.
    for S, B in ((1024, 8), (4096, 8), (16384, 2), (65536, 1)):
        run(f"causal_1d bf16 seq sweep S={S} B={B}", fa.causal_1d,
            (B, 128, S), (B, 128, S), (B, 128, S), jnp.bfloat16,
            rule_kind="causal", sync_mode="none_front", check=(S <= 4096))
    run("local_1d bf16 w=512 S=65536 (block-skip payoff)", fa.local_1d,
        (1, 128, 65536), (1, 128, 65536), (1, 128, 65536), jnp.bfloat16,
        rule_kind="local",
        rule_kwargs=dict(window_size=512, log2_stride_size=0, is_causal=True),
        window_size=512, log2_stride_size=0, is_causal=True,
        sync_mode="none_front", check=False)

    print("\n5. decode serving: run  FA_BENCH_MODE=decode python bench.py")
    bad = [r for r in rows if r[5] == "FAIL"]
    print(f"\n{len(rows)} configs, {len(rows) - len(bad)} within tolerance"
          + (f", {len(bad)} FAILED" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
