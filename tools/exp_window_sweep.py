"""On-chip sweep of the round-5 single-window kernel (VERDICT r4 item 3).

Measures the dynamic-start fixed-width window kernel
(``ops/forward_banded.window_forward``, routed via
``schedule.window_band_table``) against the previous best paths on the
narrow-band cases the waste analysis flagged (2d local w=8 at 30-41
TFLOP/s-128 against a 167 bar), plus routing-risk cases (full rule,
causal_2d) where the window path newly engages.

Each case runs FA_WINDOW=1 at block_q in {128, 256, 512} against
FA_WINDOW=0 at the round-4 solver pick, bracketed with state probes.

Usage: python tools/exp_window_sweep.py [case ...]
"""
import os
import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.block_sizes import (
    BlockConfig, choose_block_config)
from tf_flash_attention_tpu.flops import matmul_flops_forward
from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule, LocalRule
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.schedule import window_band_table
from tf_flash_attention_tpu.sync_modes import make_sync_pack
from tf_flash_attention_tpu.utils.profiling import ChainTimer

D = 128
B = 8
rng = np.random.default_rng(0)
t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)

CASES = {
    "local2d_w8": (LocalRule(window_size=8, log2_stride_size=0,
                             is_causal=True), (64, 64)),
    "local2d_w8_nc": (LocalRule(window_size=8, log2_stride_size=0,
                                is_causal=False), (64, 64)),
    "causal2d": (CausalRule(), (64, 64)),
    "local1d_w512": (LocalRule(window_size=512, log2_stride_size=0,
                               is_causal=True), (8192,)),
    "full1d_4k": (FullRule(), (4096,)),
    "stride2d": (LocalRule(window_size=8, log2_stride_size=1,
                           is_causal=True), (64, 64)),
}


def probe():
    a = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    f = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    m = 2 * 4096**3 / statistics.median(
        ChainTimer(f, (a, a), n=60).sample(3)) / 1e12
    print(f"[state] mxu_ref {m:.1f}", flush=True)


names = sys.argv[1:] or list(CASES)
probe()
for nm in names:
    rule, shp = CASES[nm]
    L = int(np.prod(shp))
    pk = make_sync_pack("none_front", shp, shp)
    q, k, v = t((B, L, D)), t((B, L, D)), t((B, L, D))
    f128 = matmul_flops_forward(rule, "none_front", shp, shp, D, D, B)
    rows = []
    # previous best (FA_WINDOW=0, solver pick)
    os.environ["FA_WINDOW"] = "0"
    cfg0 = choose_block_config(L, L, D, D, jnp.bfloat16, pack=pk, rule=rule)
    fn0 = lambda q, k, v: flash_forward(q, k, v, pack=pk, rule=rule,
                                        config=cfg0)[0]
    try:
        med = statistics.median(ChainTimer(fn0, (q, k, v), n=48).sample(6))
        rows.append((f"prev ({cfg0.block_q},{cfg0.block_kv})", med))
    except Exception as e:
        print(f"  prev FAILED {str(e)[:90]}")
    os.environ["FA_WINDOW"] = "1"
    cfg1 = choose_block_config(L, L, D, D, jnp.bfloat16, pack=pk, rule=rule)
    k_pad = -(-L // cfg1.block_kv) * cfg1.block_kv
    q_pad = -(-L // cfg1.block_q) * cfg1.block_q
    eligible = any(
        window_band_table(pk, rule, sq, L, L, q_pad, k_pad) is not None
        for sq in (128, 256, 512))
    if eligible:
        fn = lambda q, k, v: flash_forward(q, k, v, pack=pk, rule=rule,
                                           config=cfg1)[0]
        try:
            med = statistics.median(ChainTimer(fn, (q, k, v), n=48).sample(6))
            rows.append((f"window routed grid={cfg1.block_q}", med))
        except Exception as e:
            print(f"  window FAILED {str(e)[:90]}")
    else:
        print("  window ineligible", flush=True)
    os.environ.pop("FA_WINDOW", None)
    for tag, med in rows:
        print(f"{nm:14s} {tag:28s} {med*1e3:8.4f} ms  "
              f"{f128/med/1e12:6.1f} TFLOP/s-128", flush=True)
    probe()
