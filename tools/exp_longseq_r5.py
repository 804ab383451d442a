"""Long-seq frontier re-rank in a state-checked window (VERDICT r4 item 8).

Ranks the S=32k B=1 and S=16k B=2 causal forward configs with the
jitter-proof ChainTimer, bracketing with state probes (mxu_ref + the
S=4096 (1024,1024) reference kernel) so the record is state-labeled.
Run when the fast state is up (S=4096 median <= 0.295 ms); the winner is
encoded in bench.py + docs/TUNING.md.

Usage: python tools/exp_longseq_r5.py
"""
import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.block_sizes import BlockConfig
from tf_flash_attention_tpu.flops import matmul_flops_forward
from tf_flash_attention_tpu.mask_rules import CausalRule
from tf_flash_attention_tpu.ops.forward import flash_forward
from tf_flash_attention_tpu.sync_modes import make_sync_pack
from tf_flash_attention_tpu.utils.profiling import ChainTimer

D = 128
rng = np.random.default_rng(0)
t = lambda s: jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
rule = CausalRule()


def probe_timers():
    a = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.uniform(-1, 1, (4096, 4096)), jnp.bfloat16)
    f = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    mxu = ChainTimer(f, (a, b), n=60)
    S, B = 4096, 8
    q, k, v = t((B, S, D)), t((B, S, D)), t((B, S, D))
    pk = make_sync_pack("none_front", (S,), (S,))
    cfg = BlockConfig(1024, 1024, 1024, 1024, 1024, 1024)
    fwd = ChainTimer(lambda q, k, v: flash_forward(
        q, k, v, pack=pk, rule=rule, config=cfg)[0], (q, k, v), n=150)
    return mxu, fwd


def probe(mxu, fwd):
    m = 2 * 4096**3 / statistics.median(mxu.sample(3)) / 1e12
    f = statistics.median(fwd.sample(6)) * 1e3
    state = "FAST" if f <= 0.295 else "degraded"
    print(f"[state] mxu_ref {m:.1f}  S=4096 fwd {f:.4f} ms  {state}",
          flush=True)
    return state


mxu, fwd = probe_timers()
probe(mxu, fwd)
for S, B in [(32768, 1), (16384, 2)]:
    q, k, v = t((B, S, D)), t((B, S, D)), t((B, S, D))
    pk = make_sync_pack("none_front", (S,), (S,))
    f128 = matmul_flops_forward(rule, "none_front", (S,), (S,), D, D, B)
    for bq, bk in [(1024, 1024), (1024, 2048), (2048, 1024)]:
        cfg = BlockConfig(bq, bk, 1024, 1024, 1024, 1024)
        fn = lambda q, k, v, c=cfg, p=pk: flash_forward(
            q, k, v, pack=p, rule=rule, config=c)[0]
        try:
            med = statistics.median(ChainTimer(fn, (q, k, v), n=24).sample(6))
        except Exception as e:
            print(f"S={S} B={B} ({bq},{bk}): FAILED {str(e)[:90]}", flush=True)
            continue
        print(f"S={S} B={B} ({bq},{bk}): {med*1e3:8.4f} ms  "
              f"{f128/med/1e12:6.1f} TFLOP/s-128", flush=True)
    probe(mxu, fwd)
