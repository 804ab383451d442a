"""2d-rule block-config sweep: banded vs table kernel at small tiles.

VERDICT r4 item 3: local_2d w8 schedules 3.0x the useful work at
(1024, 1024) tiles and the table kernel loses at small tiles to per-GRID-
step overhead.  The banded resident-KV kernel's kv loop is an in-kernel
fori_loop (no grid bookkeeping per kv tile), so its small-tile penalty
may be far lower — this sweep measures the full config matrix for the
two bench 2d cases, each config on both kernels, with a state probe
bracketing the run (chip-state bimodality, docs/TUNING.md).

Usage: python tools/exp_2d_sweep.py
"""
import os
import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.block_sizes import BlockConfig
from tf_flash_attention_tpu.flops import matmul_flops_forward
from tf_flash_attention_tpu.mask_rules import CausalRule, LocalRule
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.schedule import build_schedule
from tf_flash_attention_tpu.sync_modes import make_sync_pack
from tf_flash_attention_tpu.utils.profiling import ChainTimer

SHP = (64, 64)
L = SHP[0] * SHP[1]
B, D = 8, 128
rng = np.random.default_rng(0)
t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
q, k, v = t((B, L, D)), t((B, L, D)), t((B, L, D))


def probe():
    a = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    f = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    if not hasattr(probe, "timer"):
        probe.timer = ChainTimer(f, (a, b), n=60)
    mxu = 2 * 4096**3 / statistics.median(probe.timer.sample(3)) / 1e12
    print(f"  [state] mxu_ref {mxu:.1f} TFLOP/s", flush=True)
    return mxu


CASES = [
    ("local_2d w8", LocalRule(window_size=8, log2_stride_size=0,
                              is_causal=True)),
    ("causal_2d", CausalRule()),
]
CONFIGS = [(1024, 1024), (512, 1024), (1024, 512), (512, 512), (512, 256),
           (256, 256), (1024, 128), (512, 128)]

probe()
for nm, rule in CASES:
    pk = make_sync_pack("none_front", SHP, SHP)
    f128 = matmul_flops_forward(rule, "none_front", SHP, SHP, D, D, B)
    print(f"{nm}: useful(128-priced) {f128/1e9:.2f} GFLOP", flush=True)
    for bq, bk in CONFIGS:
        sched = build_schedule(pk, rule, bq, bk)
        sched_fl = 2 * 2 * bq * bk * D * int(sched.live.sum()) * B
        for banded in (True, False):
            os.environ["FA_BANDED"] = "1" if banded else "0"
            cfg = BlockConfig(bq, bk, bq, bk, bq, bk)
            fn = lambda q, k, v, c=cfg, r=rule, p=pk: flash_forward(
                q, k, v, pack=p, rule=r, config=c)[0]
            try:
                tmr = ChainTimer(fn, (q, k, v), n=80)
                med = statistics.median(tmr.sample(6))
            except Exception as e:
                print(f"  ({bq},{bk}) banded={banded}: FAILED "
                      f"{str(e)[:90]}", flush=True)
                continue
            print(f"  ({bq:4d},{bk:4d}) banded={int(banded)}: "
                  f"{med*1e3:7.4f} ms  {f128/med/1e12:6.1f} TFLOP/s-128  "
                  f"{sched_fl/med/1e12:6.1f} sched "
                  f"(waste {sched_fl/f128:.2f}x)", flush=True)
    probe()
os.environ.pop("FA_BANDED", None)
