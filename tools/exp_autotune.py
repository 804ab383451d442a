"""On-chip block-config autotune sweep for the forward kernel (round 2).

VERDICT.md round-1 item 1: the headline 133.9 TFLOP/s (68% of raw bf16
peak) left the ``block_q_compute`` / ``block_kv_compute`` sub-tiling knobs
default-off.  q sub-tiles form *independent* online-softmax chains, so
Mosaic can overlap sub-tile j+1's MXU matmul with sub-tile j's VPU softmax.
This sweep measures the production kernel (no code changes) across the
(block_q, block_kv, q_compute, kv_compute) frontier on the attached chip.

Usage: python tools/exp_autotune.py [quick]
"""
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.block_sizes import BlockConfig
from tf_flash_attention_tpu.flops import matmul_flops_forward
from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.sync_modes import make_sync_pack
from tf_flash_attention_tpu.utils.profiling import device_time

S = int(os.environ.get("FA_SEQ", 4096))
B = int(os.environ.get("FA_BATCH", 8))
D = 128
RULE = os.environ.get("FA_RULE", "causal")

CONFIGS = [
    # (block_q, block_kv, q_compute, kv_compute)
    (1024, 1024, None, None),   # round-2 best: 0.252 ms / 170.1 TFLOP/s
    (1024, 1024, 512, None),
    (1024, 1024, None, 512),
    (1024, 512, None, None),
    (512, 1024, None, None),
    (512, 512, None, None),
    (2048, 1024, None, None),
    (2048, 2048, None, None),
    (2048, 2048, 512, None),
    (1024, 2048, None, None),
]


def main():
    quick = "quick" in sys.argv[1:]
    print(f"backend={jax.default_backend()} S={S} B={B} rule={RULE}",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
    q, k, v = t((B, S, D)), t((B, S, D)), t((B, S, D))
    pack = make_sync_pack("none_front", (S,), (S,))
    rule = CausalRule() if RULE == "causal" else FullRule()

    configs = CONFIGS[:4] if quick else CONFIGS
    results = []
    for bq, bk, qc, kc in configs:
        if bq > S or bk > S:
            continue
        cfg = BlockConfig(bq, bk, bq, bk, bq, bk,
                          block_kv_compute=kc, block_q_compute=qc)
        fn = lambda q, k, v: flash_forward(q, k, v, pack=pack, rule=rule,
                                           config=cfg)[0]
        flops = matmul_flops_forward(rule, "none_front", (S,), (S,), D, D, B,
                                     bq, bk)
        tag = f"{bq}x{bk} qc={qc} kc={kc}"
        try:
            dt = device_time(fn, (q, k, v), n=10)
        except Exception as e:
            print(f"{tag:32s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        tf_s = flops / dt / 1e12
        results.append((tf_s, tag, dt))
        print(f"{tag:32s}: {dt*1e3:7.3f} ms  {tf_s:6.1f} TFLOP/s", flush=True)

    results.sort(reverse=True)
    print("--- top 3 ---", flush=True)
    for tf_s, tag, dt in results[:3]:
        print(f"{tag:32s}: {dt*1e3:7.3f} ms  {tf_s:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
