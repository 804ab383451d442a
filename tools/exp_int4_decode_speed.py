"""Kernel-level decode timing: int8 vs int4 paged attention (real chip)."""
import sys
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig, PageAllocator, PagedKVCache, write_prompt)
from tf_flash_attention_tpu.serving.decode import paged_decode_attention
from tf_flash_attention_tpu.utils.profiling import device_time

B = 16
CTX = 8192
PAGE = 256
N_KV = 8
D = 128
G = 8  # q heads per kv head -> 64 q heads? keep 8*8 = 64? no: n_q = N_KV*G

rng = np.random.default_rng(0)
for kvq in ("int8", "int4"):
    qd = {"int8": jnp.int8, "int4": "int4"}[kvq]
    cfg = KVCacheConfig(n_kv_heads=N_KV, head_dim=D, page_size=PAGE,
                        n_pages=B * (CTX // PAGE) + 2, max_seqs=B,
                        max_pages_per_seq=CTX // PAGE,
                        quantized=True, quant_dtype=qd)
    cache = PagedKVCache.create(cfg)
    alloc = PageAllocator(cfg.n_pages - 1)
    k = jnp.asarray(rng.uniform(-1, 1, (N_KV, CTX, D)), jnp.bfloat16)
    v = jnp.asarray(rng.uniform(-1, 1, (N_KV, CTX, D)), jnp.bfloat16)
    for s in range(B):
        cache = write_prompt(cache, cfg, s,
                             np.array(alloc.alloc(s, CTX // PAGE)), k, v)
    q = jnp.asarray(rng.uniform(-1, 1, (B, N_KV * G, D)), jnp.bfloat16)

    def run(q, cache):
        return paged_decode_attention(q, cache, cfg)

    t = device_time(run, (q, cache), n=20, reps=4)
    kv_bytes = B * CTX * N_KV * D * 2 * (1 if kvq == "int8" else 0.5)
    sc_bytes = B * CTX * N_KV * 4 * 2
    bw = (kv_bytes + sc_bytes) / t / 1e9
    print(f"{kvq}: {t*1e3:.3f} ms/step, {B/t:,.0f} tok/s, "
          f"{bw:.0f} GB/s effective ({kv_bytes/1e9:.2f} GB KV)")
