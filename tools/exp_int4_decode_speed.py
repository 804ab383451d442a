"""Kernel-level decode timing: int8 vs int4 paged attention (real chip).

Builds the whole paged cache in one jitted call (per-op eager writes are
RTT-bound through the tunnelled runtime), then measures the decode kernel
alone at B=16, ctx=8k — the config of the engine bench.
"""
import dataclasses
import sys
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig, PagedKVCache, _pack_nibbles, _pack_scales,
    _quantize_tokens, gather_sequence_kv)
from tf_flash_attention_tpu.serving.decode import paged_decode_attention
from tf_flash_attention_tpu.utils.profiling import device_time

import os
B = int(os.environ.get("XB", 16))
CTX = int(os.environ.get("XCTX", 8192))
PAGE = int(os.environ.get("XPAGE", 256))
N_KV = 8
D = 128
G = 8
PAGES_PER_SEQ = CTX // PAGE

rng = np.random.default_rng(0)
k_host = rng.uniform(-1, 1, (N_KV, CTX, D)).astype(np.float32)
v_host = rng.uniform(-1, 1, (N_KV, CTX, D)).astype(np.float32)
q = jnp.asarray(rng.uniform(-1, 1, (B, N_KV * G, D)), jnp.bfloat16)


def build_cache(cfg, k, v):
    """All B slots share the same physical pages (timing only cares about
    bytes streamed; the page table fans every slot out over the same
    PAGES_PER_SEQ pages)."""
    @jax.jit
    def make(k, v):
        def to_pages(x):
            if cfg.is_int4:
                qv, sc = _quantize_tokens(x, cfg.quant_dtype)
                qp = _pack_nibbles(qv).reshape(
                    N_KV, PAGES_PER_SEQ, PAGE // 2, D)
                scp = _pack_scales(sc[..., 0]).reshape(
                    N_KV, 2, PAGES_PER_SEQ, PAGE // 2)
                return qp, jnp.swapaxes(scp, 1, 2)
            qv, sc = _quantize_tokens(x, cfg.quant_dtype)
            qp = qv.reshape(N_KV, PAGES_PER_SEQ, PAGE, D)
            return qp, sc[..., 0].reshape(N_KV, PAGES_PER_SEQ, 1, PAGE)
        kp, ks = to_pages(k)
        vp, vs = to_pages(v)
        return kp, ks, vp, vs

    kp, ks, vp, vs = make(jnp.asarray(k), jnp.asarray(v))
    # pad the page arrays to n_pages
    padn = cfg.n_pages - PAGES_PER_SEQ
    pad4 = lambda a: jnp.pad(a, ((0, 0), (0, padn), (0, 0), (0, 0)))
    table = np.tile(np.arange(PAGES_PER_SEQ, dtype=np.int32), (B, 1))
    return PagedKVCache(
        k_pages=pad4(kp), v_pages=pad4(vp),
        k_scales=pad4(ks), v_scales=pad4(vs),
        page_tables=jnp.asarray(table),
        lengths=jnp.full((B,), CTX, jnp.int32))


for kvq in ("int8", "int4"):
    qd = {"int8": jnp.int8, "int4": "int4"}[kvq]
    cfg = KVCacheConfig(n_kv_heads=N_KV, head_dim=D, page_size=PAGE,
                        n_pages=PAGES_PER_SEQ + 2, max_seqs=B,
                        max_pages_per_seq=PAGES_PER_SEQ,
                        quantized=True, quant_dtype=qd)
    cache = build_cache(cfg, k_host, v_host)

    def run(q, cache):
        return paged_decode_attention(q, cache, cfg)

    # correctness spot-check vs the dequantized cache
    o = run(q, cache)
    kd, vd = gather_sequence_kv(cache, cfg, 0)
    qg = np.asarray(q[0], np.float32).reshape(N_KV, G, D)
    s = np.einsum("hgd,htd->hgt", qg, kd) / np.sqrt(D)
    p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    ref = np.einsum("hgt,htd->hgd", p, vd).reshape(N_KV * G, D)
    err = np.abs(np.asarray(o[0], np.float32) - ref).max()

    t = device_time(run, (q, cache), n=20, reps=4)
    kv_bytes = B * CTX * N_KV * D * 2 * (1 if kvq == "int8" else 0.5)
    sc_bytes = B * CTX * N_KV * 4 * 2
    bw = (kv_bytes + sc_bytes) / t / 1e9
    print(f"{kvq}: {t*1e3:.3f} ms/step, {B/t:,.0f} tok/s, "
          f"{bw:.0f} GB/s effective ({(kv_bytes+sc_bytes)/1e9:.2f} GB), "
          f"err={err:.2e}")
