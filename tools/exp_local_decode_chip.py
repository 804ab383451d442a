"""On-chip check + timing for rule-based paged decode (LocalRule).

Correctness vs the masked dense oracle, then the page-skip payoff: a
window-512 decode over a 32k context should stream ~1 page, not 32.
"""
import sys
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.mask_rules import LocalRule
from tf_flash_attention_tpu.serving.decode import paged_decode_attention
from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig, PagedKVCache, _pack_nibbles, _pack_scales,
    _quantize_tokens, gather_sequence_kv)
from tf_flash_attention_tpu.utils.profiling import device_time

B, CTX, PAGE, N_KV, D, G = 16, 32768, 1024, 8, 128, 8
PAGES_PER_SEQ = CTX // PAGE

rng = np.random.default_rng(0)
k_host = rng.uniform(-1, 1, (N_KV, CTX, D)).astype(np.float32)
v_host = rng.uniform(-1, 1, (N_KV, CTX, D)).astype(np.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N_KV * G, D)), jnp.bfloat16)

cfg = KVCacheConfig(n_kv_heads=N_KV, head_dim=D, page_size=PAGE,
                    n_pages=PAGES_PER_SEQ + 2, max_seqs=B,
                    max_pages_per_seq=PAGES_PER_SEQ,
                    quantized=True, quant_dtype=jnp.int8)


@jax.jit
def make(k, v):
    def quant(x):
        qv, sc = _quantize_tokens(x, jnp.int8)
        return (qv.reshape(N_KV, PAGES_PER_SEQ, PAGE, D),
                sc[..., 0].reshape(N_KV, PAGES_PER_SEQ, 1, PAGE))
    kp, ks = quant(k)
    vp, vs = quant(v)
    return kp, ks, vp, vs


kp, ks, vp, vs = make(jnp.asarray(k_host), jnp.asarray(v_host))
padn = cfg.n_pages - PAGES_PER_SEQ
pad4 = lambda a: jnp.pad(a, ((0, 0), (0, padn), (0, 0), (0, 0)))
cache = PagedKVCache(
    k_pages=pad4(kp), v_pages=pad4(vp), k_scales=pad4(ks), v_scales=pad4(vs),
    page_tables=jnp.asarray(
        np.tile(np.arange(PAGES_PER_SEQ, dtype=np.int32), (B, 1))),
    lengths=jnp.full((B,), CTX, jnp.int32))

kd, vd = gather_sequence_kv(cache, cfg, 0)


def oracle(w, s):
    qg = np.asarray(q[0], np.float32).reshape(N_KV, G, D)
    sc = np.einsum("hgd,htd->hgt", qg, kd) / np.sqrt(D)
    pos = np.arange(CTX)
    diff = (CTX - 1) - pos
    vis = (diff >> s) < w
    if s:
        vis &= (diff & ((1 << s) - 1)) == 0
    sc = np.where(vis[None, None], sc, -1e30)
    p = np.exp(sc - sc.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    return np.einsum("hgt,htd->hgd", p, vd).reshape(N_KV * G, D)


for w, s in ((512, 0), (64, 3)):
    rule = LocalRule(window_size=w, log2_stride_size=s, is_causal=True)

    def run(q, cache):
        return paged_decode_attention(q, cache, cfg, rule=rule)

    o = run(q, cache)
    err = np.abs(np.asarray(o[0], np.float32) - oracle(w, s)).max()
    t = device_time(run, (q, cache), n=20, reps=4)
    print(f"local(w={w}, s={s}): {t*1e3:.3f} ms, err={err:.2e}")

def run_causal(q, cache):
    return paged_decode_attention(q, cache, cfg)

t = device_time(run_causal, (q, cache), n=20, reps=4)
print(f"causal (full 32k context): {t*1e3:.3f} ms")
