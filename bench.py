#!/usr/bin/env python
"""Headline benchmark for the driver.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...detail...}

Headline: causal 1d flash-attention forward throughput, bf16, seq 4096,
d = v_d = 128, flattened batch 8 (the BASELINE.json causal_1d config at a
production head dim), measured as pure device time on the attached TPU.

Measurement policy (auditable by construction):

* the winning config is chosen by WALL TIME, never by TFLOP/s;
* every config's min + median wall time goes into the JSON (``configs``
  field) alongside both throughput pricings;
* two pricings are always reported: ``tflops`` = scheduled MXU work at the
  config's own live-tile granularity (what the kernel genuinely executes,
  the reference's tile-granular costing convention,
  ``flash_attention.cu:2090-2113``) and ``tflops_128`` = the
  config-independent live-tile count at fixed 128x128 granularity
  (problem-normalized; configs cannot inflate it by scheduling waste);
* backward is timed too (``bwd`` block in the JSON), priced in USEFUL
  gradient FLOPs — the canonical 5-GEMM count, NOT the two-kernel
  recompute's scheduled 7 GEMMs (``flops.matmul_flops_backward``);
* a dense bf16 4096^3 matmul is timed first and reported as
  ``mxu_ref_tflops`` — an independent probe of the chip/tunnel state at
  measurement time (observed bimodal across rounds; see docs/TUNING.md),
  so a throttled-chip run is auditable against its own measured peak.

``vs_baseline`` is the headline scheduled-MXU TFLOP/s divided by the
north-star target of 0.85 x raw bf16 MXU peak (BASELINE.md).

Per-config progress lines go to stderr.  Environment knobs: FA_BENCH_SEQ,
FA_BENCH_BATCH, FA_BENCH_FAST=1 (single config), FA_BENCH_MODE=decode.
"""

import json
import os
import statistics
import sys

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_decode():
    """Decode tokens/s vs the HBM roofline (FA_BENCH_MODE=decode)."""
    import jax
    import jax.numpy as jnp

    from tf_flash_attention_tpu.serving.decode import paged_decode_attention
    from tf_flash_attention_tpu.serving.kv_cache import (
        KVCacheConfig, PageAllocator, PagedKVCache, write_prompt)
    from tf_flash_attention_tpu.utils.profiling import V5E, device_time

    max_seqs = int(os.environ.get("FA_BENCH_SEQS", 16))
    seq_len = int(os.environ.get("FA_BENCH_CTX", 8192))
    kvq = os.environ.get("FA_BENCH_KVQ", "int8")   # int8 | int4 | fp8
    qdtype = {"int8": jnp.int8, "int4": "int4",
              "fp8": jnp.float8_e4m3fn}[kvq]
    n_kv, n_q, d = 8, 8, 128
    # int4's nibble unpack amortises over bigger pages (decode.py header)
    page = int(os.environ.get("FA_BENCH_PAGE", 1024 if kvq == "int4" else 512))
    pages_per_seq = seq_len // page
    cfg = KVCacheConfig(n_kv_heads=n_kv, head_dim=d, page_size=page,
                        n_pages=max_seqs * pages_per_seq + 1,
                        max_seqs=max_seqs, max_pages_per_seq=pages_per_seq,
                        quantized=True, quant_dtype=qdtype)
    cache = PagedKVCache.create(cfg)
    alloc = PageAllocator(cfg.n_pages - 1)
    rng = np.random.default_rng(0)
    for slot in range(max_seqs):
        k = jnp.asarray(rng.uniform(-1, 1, (n_kv, seq_len, d)), jnp.bfloat16)
        v = jnp.asarray(rng.uniform(-1, 1, (n_kv, seq_len, d)), jnp.bfloat16)
        cache = write_prompt(cache, cfg, slot,
                             np.array(alloc.alloc(slot, pages_per_seq)), k, v)
    q = jnp.asarray(rng.uniform(-1, 1, (max_seqs, n_q, d)), jnp.bfloat16)

    fn = lambda q, cache: paged_decode_attention(q, cache, cfg)
    dt = device_time(fn, (q, cache), n=10)
    toks_per_s = max_seqs / dt
    # HBM bytes per step: K+V payloads + f32 scales for every live page
    payload = 0.5 if kvq == "int4" else 1
    bytes_step = int(max_seqs * seq_len * n_kv * (2 * d * payload + 2 * 4))
    t_hbm = bytes_step / V5E.hbm_bytes
    log(f"decode: {dt*1e3:.3f} ms/step, {toks_per_s:,.0f} tok/s, "
        f"HBM roofline {max_seqs/t_hbm:,.0f} tok/s "
        f"({t_hbm/dt:.0%} of bandwidth bound)")
    print(json.dumps({
        "metric": "paged %s decode tokens/s (B=%d, ctx=%d, 8 KV heads, d=128)"
                  % (kvq.upper(), max_seqs, seq_len),
        "value": round(toks_per_s),
        "unit": "tokens/s",
        "vs_baseline": round(dt and (t_hbm / dt), 3),
    }), flush=True)


def _mxu_reference(device_time):
    """Measured raw bf16 matmul throughput (TFLOP/s) at benchmark time.

    The attached chip's achievable MXU rate varies with host/tunnel state
    (observed bimodal across rounds: the identical compiled kernel measures
    0.25 ms in one state and 0.41 ms in another).  A dense 4096^3 matmul is
    the cleanest independent probe of that state, reported alongside the
    kernel numbers so any throttled-chip round is auditable: compare
    ``value`` against ``mxu_ref_tflops``, not just the nominal 197 peak.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    f = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    try:
        dt = min(device_time(f, (a, b), n=20) for _ in range(3))
    except Exception as e:  # pragma: no cover
        log(f"mxu reference probe FAILED {str(e)[:120]}")
        return None
    return round(2 * 4096**3 / dt / 1e12, 1)


def _time_samples(device_time, fn, args, reps=3, n=20):
    """Per-call wall times (seconds), one per rep.  Noise (tunnel
    scheduling, contention) only ever adds time, so min is the physical
    estimate; median is reported for auditability."""
    samples = []
    for _ in range(reps):
        try:
            samples.append(device_time(fn, args, n=n))
        except Exception as e:  # pragma: no cover
            log(f"  sample FAILED {str(e)[:120]}")
            return []
    return samples


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("FA_BENCH_MODE") == "decode":
        bench_decode()
        return

    import tf_flash_attention_tpu  # noqa: F401  (package import check)
    from tf_flash_attention_tpu.block_sizes import BlockConfig
    from tf_flash_attention_tpu.flops import (
        matmul_flops_backward, matmul_flops_forward)
    from tf_flash_attention_tpu.mask_rules import CausalRule
    from tf_flash_attention_tpu.ops.backward import flash_backward
    from tf_flash_attention_tpu.ops.forward import flash_forward
    from tf_flash_attention_tpu.schedule import build_schedule
    from tf_flash_attention_tpu.sync_modes import make_sync_pack
    from tf_flash_attention_tpu.utils.profiling import V5E, device_time

    S = int(os.environ.get("FA_BENCH_SEQ", 4096))
    B = int(os.environ.get("FA_BENCH_BATCH", 8))
    D = 128
    fast = bool(os.environ.get("FA_BENCH_FAST"))
    dtype = jnp.bfloat16

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    mxu_ref = _mxu_reference(device_time)
    log(f"mxu reference (dense bf16 4096^3 matmul): {mxu_ref} TFLOP/s "
        f"of nominal 197 — chip-state yardstick for this run")
    rng = np.random.default_rng(0)
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), dtype)
    q, k, v = t((B, S, D)), t((B, S, D)), t((B, S, D))
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule()

    # Config-independent pricing: live-tile FLOPs at fixed 128x128 tiles.
    flops_128 = matmul_flops_forward(rule, "none_front", (S,), (S,), D, D, B)

    configs = [(1024, 1024)] if fast else [(2048, 1024), (1024, 1024), (2048, 2048)]
    table = []
    for bq, bk in configs:
        bq_c, bk_c = min(bq, S), min(bk, S)
        cfg = BlockConfig(bq_c, bk_c, bq_c, bk_c, bq_c, bk_c)
        fn = lambda q, k, v: flash_forward(q, k, v, pack=pack, rule=rule, config=cfg)[0]
        flops_sched = matmul_flops_forward(
            rule, "none_front", (S,), (S,), D, D, B, bq_c, bk_c)
        samples = _time_samples(device_time, fn, (q, k, v))
        if not samples:
            log(f"causal fwd {bq_c}x{bk_c}: FAILED")
            continue
        dt, dt_med = min(samples), statistics.median(samples)
        row = {
            "config": [bq_c, bk_c],
            "ms_min": round(dt * 1e3, 4),
            "ms_median": round(dt_med * 1e3, 4),
            "tflops": round(flops_sched / dt / 1e12, 1),
            "tflops_128": round(flops_128 / dt / 1e12, 1),
        }
        table.append(row)
        log(f"causal fwd {bq_c}x{bk_c}: min {row['ms_min']} ms / median "
            f"{row['ms_median']} ms  {row['tflops']} TFLOP/s scheduled, "
            f"{row['tflops_128']} TFLOP/s at 128x128 pricing "
            f"({len(samples)} samples)")

    if not table:
        print(json.dumps({"metric": "causal_1d fwd bf16 TFLOP/s/chip",
                          "value": 0, "unit": "TFLOP/s", "vs_baseline": 0}),
              flush=True)
        return

    # Selection is by WALL TIME only.
    best = min(table, key=lambda r: r["ms_min"])
    best_cfg = tuple(best["config"])
    best_tflops = best["tflops"]

    # ceilings for context
    flops_best = matmul_flops_forward(
        rule, "none_front", (S,), (S,), D, D, B, *best_cfg)
    live = build_schedule(pack, rule, *best_cfg).live.sum()
    softmax_elems = float(live) * best_cfg[0] * best_cfg[1] * B
    hbm = 4 * B * S * D * jnp.dtype(dtype).itemsize
    t_serial = V5E.attention_ceiling_serial(flops_best, softmax_elems, hbm, dtype)
    log(f"ceilings: serial-model {flops_best/t_serial/1e12:.1f} TFLOP/s, "
        f"raw bf16 peak 197")
    log(f"best (by wall time): {best_cfg} {best['ms_min']} ms = "
        f"{best_tflops:.1f} TFLOP/s scheduled / {best['tflops_128']} TFLOP/s "
        f"at 128x128 pricing ({best_tflops/197:.0%} of raw bf16 peak)")

    # ---- backward: both kernels (dQ + dK/dV), priced in useful gradient
    # FLOPs (5-GEMM count, no recompute credit).  Reference timing parity:
    # internal_test.cu:278-279,566-567 times forward AND backward.
    o, l, m = jax.block_until_ready(jax.jit(
        lambda q, k, v: flash_forward(
            q, k, v, pack=pack, rule=rule,
            config=BlockConfig(*best_cfg, *best_cfg, *best_cfg)))(q, k, v))
    bwd_flops = matmul_flops_backward(rule, "none_front", (S,), (S,), D, D, B)
    bwd_configs = ([(1024, 512, 512, 1024)] if fast
                   else [(1024, 512, 512, 1024), (1024, 1024, 1024, 1024)])
    bwd_table = []
    for bq1, bk1, bq2, bk2 in bwd_configs:
        cfg = BlockConfig(best_cfg[0], best_cfg[1],
                          min(bq1, S), min(bk1, S), min(bq2, S), min(bk2, S))
        fnb = lambda q, k, v, o, l, m, do: flash_backward(
            q, k, v, o, l, m, do, pack=pack, rule=rule, config=cfg)
        samples = _time_samples(device_time, fnb, (q, k, v, o, l, m, k), n=10)
        if not samples:
            log(f"causal bwd dq={bq1}x{bk1} dkv={bq2}x{bk2}: FAILED")
            continue
        dt, dt_med = min(samples), statistics.median(samples)
        row = {
            "config": [bq1, bk1, bq2, bk2],
            "ms_min": round(dt * 1e3, 4),
            "ms_median": round(dt_med * 1e3, 4),
            "tflops_useful": round(bwd_flops / dt / 1e12, 1),
        }
        bwd_table.append(row)
        log(f"causal bwd dq={bq1}x{bk1} dkv={bq2}x{bk2}: min {row['ms_min']} ms"
            f" / median {row['ms_median']} ms  {row['tflops_useful']} "
            f"useful TFLOP/s")
    bwd_best = min(bwd_table, key=lambda r: r["ms_min"]) if bwd_table else None
    if bwd_best:
        log(f"bwd best (by wall time): {tuple(bwd_best['config'])} "
            f"{bwd_best['ms_min']} ms = {bwd_best['tflops_useful']} useful "
            f"TFLOP/s")

    target = 0.85 * 197.0
    print(json.dumps({
        "metric": "causal_1d fwd bf16 TFLOP/s/chip (S=%d, d=128, B=%d)" % (S, B),
        "value": best_tflops,
        "unit": "TFLOP/s",
        "vs_baseline": round(best_tflops / target, 3),
        "pricing": "scheduled MXU work at the winning config's live-tile "
                   "granularity; tflops_128 = config-independent 128x128 "
                   "pricing; selection by wall time",
        "fwd_tflops_128": best["tflops_128"],
        "fwd_ms": best["ms_min"],
        "mxu_ref_tflops": mxu_ref,
        "configs": table,
        "bwd": {"tflops_useful": bwd_best["tflops_useful"],
                "ms": bwd_best["ms_min"],
                "config": bwd_best["config"],
                "configs": bwd_table} if bwd_best else None,
    }), flush=True)


if __name__ == "__main__":
    main()
