"""On-chip backward-kernel tuning sweep (round 3).

VERDICT round-2 item 1: the backward kernels were never benchmarked or
tuned.  This sweep measures ``flash_backward`` (both kernels, dQ + dK/dV)
across the (block_q_dq, block_kv_dq, block_q_dkv, block_kv_dkv) frontier on
the attached chip, priced in *useful gradient FLOPs* — the canonical
5-GEMM backward count ``2*Br*Bc*(3d + 2*v_d)`` per live 128x128 tile —
which does NOT credit the two-kernel recompute (the scheduled-MXU number
is also printed for the record).

Usage: python tools/exp_bwd_tune.py [quick]
"""
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.block_sizes import BlockConfig
from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule
from tf_flash_attention_tpu.ops.backward import flash_backward
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.schedule import build_schedule
from tf_flash_attention_tpu.sync_modes import make_sync_pack
from tf_flash_attention_tpu.utils.profiling import device_time

S = int(os.environ.get("FA_SEQ", 4096))
B = int(os.environ.get("FA_BATCH", 8))
D = 128
RULE = os.environ.get("FA_RULE", "causal")

# (block_q_dq, block_kv_dq, block_q_dkv, block_kv_dkv)
CONFIGS = [
    (1024, 1024, 1024, 1024),   # round-2 bench default (untuned)
    (512, 512, 512, 512),
    (1024, 512, 512, 1024),     # pre-LSE best: 0.911 ms / 97.3 useful TF/s
    (512, 1024, 1024, 512),
    (256, 512, 512, 256),
    (1024, 256, 256, 1024),
    (512, 256, 256, 512),
]


def useful_bwd_flops(rule, S, d, v_d, batch):
    pack = make_sync_pack("none_front", (S,), (S,))
    live = build_schedule(pack, rule, 128, 128).live
    return float(2.0 * 128 * 128 * (3 * d + 2 * v_d) * int(live.sum()) * batch)


def main():
    quick = "quick" in sys.argv[1:]
    print(f"backend={jax.default_backend()} S={S} B={B} rule={RULE}",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
    q, k, v, do = t((B, S, D)), t((B, S, D)), t((B, S, D)), t((B, S, D))
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule() if RULE == "causal" else FullRule()

    fwd_cfg = BlockConfig(1024, 1024, 1024, 1024, 1024, 1024)
    o, l, m = jax.jit(
        lambda q, k, v: flash_forward(q, k, v, pack=pack, rule=rule,
                                      config=fwd_cfg)
    )(q, k, v)
    o, l, m = jax.block_until_ready((o, l, m))

    flops = useful_bwd_flops(rule, S, D, D, B)
    configs = CONFIGS[:4] if quick else CONFIGS
    results = []
    for bq1, bk1, bq2, bk2 in configs:
        if max(bq1, bk1, bq2, bk2) > S:
            continue
        cfg = BlockConfig(1024, 1024, bq1, bk1, bq2, bk2)
        fn = lambda q, k, v, o, l, m, do: flash_backward(
            q, k, v, o, l, m, do, pack=pack, rule=rule, config=cfg)
        tag = f"dq={bq1}x{bk1} dkv={bq2}x{bk2}"
        try:
            dt = device_time(fn, (q, k, v, o, l, m, do), n=10)
        except Exception as e:
            print(f"{tag:28s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        tf_s = flops / dt / 1e12
        results.append((tf_s, tag, dt))
        print(f"{tag:28s}: {dt*1e3:7.3f} ms  {tf_s:6.1f} useful-TFLOP/s",
              flush=True)

    results.sort(reverse=True)
    print("--- top 3 ---", flush=True)
    for tf_s, tag, dt in results[:3]:
        print(f"{tag:28s}: {dt*1e3:7.3f} ms  {tf_s:6.1f} useful-TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
