"""Engine decode-step cost accounting on the chip.

Times the pieces of a decode step individually (chaining many pallas
calls into one device_time scan exceeds the remote compile helper's
payload limit, and one-shot dispatch costs ~20 ms of tunnel RTT, so the
full step must be measured as the *marginal* scan step — see
tools/engine_bench.py).  Conclusion recorded from the measurements: the
step is attention+weights bound — full step ms ~= n_layers x single
attention call + weights-DMA; appends/sampling/rope are noise.
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.serving.decode import paged_decode_attention
from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig, PagedKVCache, _pack_nibbles, _pack_scales,
    _quantize_tokens, append_tokens_batched)
from tf_flash_attention_tpu.utils.profiling import device_time

B, CTX, PAGE, N_KV, D = 16, 8192, 1024, 8, 128
PPS = CTX // PAGE
cfg = KVCacheConfig(n_kv_heads=N_KV, head_dim=D, page_size=PAGE,
                    n_pages=B * PPS + B + 1, max_seqs=B,
                    max_pages_per_seq=2 * PPS, quantized=True,
                    quant_dtype="int4")
rng = np.random.default_rng(0)


@jax.jit
def make(k):
    qv, sc = _quantize_tokens(k, "int4")
    kp = _pack_nibbles(qv).reshape(N_KV, PPS, PAGE // 2, D)
    scp = jnp.swapaxes(
        _pack_scales(sc[..., 0]).reshape(N_KV, 2, PPS, PAGE // 2), 1, 2)
    return kp, scp


k = jnp.asarray(rng.uniform(-1, 1, (N_KV, CTX, D)), jnp.float32)
kp, ks = make(k)
pad = cfg.n_pages - PPS
p4 = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0), (0, 0)))
table = np.zeros((B, 2 * PPS), np.int32)
table[:, :PPS] = np.arange(PPS)
table[:, PPS] = PPS
cache = PagedKVCache(k_pages=p4(kp), v_pages=p4(kp), k_scales=p4(ks),
                     v_scales=p4(ks), page_tables=jnp.asarray(table),
                     lengths=jnp.full((B,), CTX, jnp.int32))
kv = jnp.asarray(rng.uniform(-1, 1, (B, N_KV, D)), jnp.bfloat16)
active = jnp.ones((B,), bool)
q = jnp.asarray(rng.uniform(-1, 1, (B, 8, D)), jnp.bfloat16)

t = device_time(lambda q, c: paged_decode_attention(q, c, cfg), (q, cache),
                n=20, reps=4)
print(f"single decode attention call: {t*1e3:.3f} ms "
      f"(x n_layers ~= the attention share of a full step)")

f = jax.jit(lambda kv, c: append_tokens_batched(
    c, cfg, kv, kv, active, cfg.n_pages - 1, interpret=False),
    donate_argnums=(1,))
best = float("inf")
for _ in range(5):
    c2 = jax.tree.map(lambda x: x.copy(), cache)
    jax.block_until_ready(f(kv, c2))
    c2 = jax.tree.map(lambda x: x.copy(), cache)
    t0 = time.perf_counter()
    jax.block_until_ready(f(kv, c2))
    best = min(best, time.perf_counter() - t0)
print(f"single append call, one-shot (dominated by ~20 ms dispatch RTT; "
      f"device cost is noise): {best*1e3:.3f} ms")
