"""Bisect the BENCH_r04 int4 decode collapse (5.6k tok/s @ 6.1% of HBM
roofline vs the 50-58k tok/s tool-run record).

Runs, in ONE chip session with identical timing methodology
(``device_time`` n=10, median of 3 reps -- the bench's estimator), the
exact bench construction and the exact tool construction plus the
intermediate variants that isolate every difference between them:

  A  bench-path   : PagedKVCache.create + write_prompt per slot,
                    DISTINCT pages per slot, n_pages = B*ppseq + 1 = 129
  B  tool-path    : hand-built pages, ALL slots share pages 0..7,
                    n_pages = ppseq + 2 = 10
  C  tool + big   : tool-built data, shared table, but n_pages = 129
                    (isolates the page-array size / padding)
  D  bench + share: write_prompt-built cache, but the page table is
                    rewritten so every slot points at slot 0's pages
                    (isolates unique-bytes working set vs construction)
  E  tool + dist  : tool-built quantized data tiled to 128 distinct
                    pages, per-slot tables (isolates table contents
                    with hand-built data)

Also times int8 at the same page size as a same-session yardstick.

Usage: python tools/exp_int4_bisect.py [page_size]
"""
import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tf_flash_attention_tpu.serving.decode import paged_decode_attention
from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig, PageAllocator, PagedKVCache, _pack_nibbles, _pack_scales,
    _quantize_tokens, write_prompt)
from tf_flash_attention_tpu.utils.profiling import V5E, device_time

B = 16
CTX = 8192
PAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N_KV, G, D = 8, 8, 128
PPSEQ = CTX // PAGE

rng = np.random.default_rng(0)
k_host = jnp.asarray(rng.uniform(-1, 1, (N_KV, CTX, D)), jnp.bfloat16)
v_host = jnp.asarray(rng.uniform(-1, 1, (N_KV, CTX, D)), jnp.bfloat16)
q = jnp.asarray(rng.uniform(-1, 1, (B, N_KV * G, D)), jnp.bfloat16)


def cfg_for(kvq, n_pages):
    qd = {"int8": jnp.int8, "int4": "int4"}[kvq]
    return KVCacheConfig(n_kv_heads=N_KV, head_dim=D, page_size=PAGE,
                         n_pages=n_pages, max_seqs=B,
                         max_pages_per_seq=PPSEQ,
                         quantized=True, quant_dtype=qd)


def bench_cache(cfg):
    """Exact bench_decode construction: write_prompt per slot."""
    cache = PagedKVCache.create(cfg)
    alloc = PageAllocator(cfg.n_pages - 1)
    for slot in range(B):
        cache = write_prompt(cache, cfg, slot,
                             np.array(alloc.alloc(slot, PPSEQ)),
                             k_host, v_host)
    return cache


def tool_cache(cfg, n_pages):
    """Exact exp_int4_decode_speed construction: one jitted quantize,
    every slot's table pointing at the same PPSEQ physical pages."""
    @jax.jit
    def make(k, v):
        def to_pages(x):
            qv, sc = _quantize_tokens(x, cfg.quant_dtype)
            if cfg.is_int4:
                qp = _pack_nibbles(qv).reshape(N_KV, PPSEQ, PAGE // 2, D)
                scp = _pack_scales(sc[..., 0]).reshape(
                    N_KV, 2, PPSEQ, PAGE // 2)
                return qp, jnp.swapaxes(scp, 1, 2)
            qp = qv.reshape(N_KV, PPSEQ, PAGE, D)
            return qp, sc[..., 0].reshape(N_KV, PPSEQ, 1, PAGE)
        kp, ks = to_pages(k)
        vp, vs = to_pages(v)
        return kp, ks, vp, vs

    kp, ks, vp, vs = make(k_host, v_host)
    padn = n_pages - kp.shape[1]
    pad4 = lambda a: jnp.pad(a, ((0, 0), (0, padn), (0, 0), (0, 0)))
    table = np.tile(np.arange(PPSEQ, dtype=np.int32), (B, 1))
    return PagedKVCache(
        k_pages=pad4(kp), v_pages=pad4(vp),
        k_scales=pad4(ks), v_scales=pad4(vs),
        page_tables=jnp.asarray(table),
        lengths=jnp.full((B,), CTX, jnp.int32))


def tool_cache_distinct(cfg):
    """Tool-built data tiled out to B distinct page sets."""
    base = tool_cache(cfg, PPSEQ)
    tile = lambda a: jnp.tile(a[:, :PPSEQ], (1, B, 1, 1))
    table = (np.tile(np.arange(PPSEQ, dtype=np.int32), (B, 1))
             + PPSEQ * np.arange(B, dtype=np.int32)[:, None])
    return PagedKVCache(
        k_pages=tile(base.k_pages), v_pages=tile(base.v_pages),
        k_scales=tile(base.k_scales), v_scales=tile(base.v_scales),
        page_tables=jnp.asarray(table), lengths=base.lengths)


def timeit(name, cfg, cache):
    fn = lambda q, cache: paged_decode_attention(q, cache, cfg)
    dt = statistics.median(device_time(fn, (q, cache), n=10) for _ in range(3))
    payload = 0.5 if cfg.is_int4 else 1
    bytes_step = int(B * CTX * N_KV * (2 * D * payload + 2 * 4))
    t_hbm = bytes_step / V5E.hbm_bytes
    print(f"{name:16s}: {dt*1e3:7.3f} ms  {B/dt:9,.0f} tok/s  "
          f"{t_hbm/dt:6.1%} of HBM roofline  "
          f"(k_pages {tuple(cache.k_pages.shape)})", flush=True)
    return dt


print(f"page={PAGE} ppseq={PPSEQ} B={B} ctx={CTX}", flush=True)

cfg4_big = cfg_for("int4", B * PPSEQ + 1)
cfg4_small = cfg_for("int4", PPSEQ + 2)
cfg8_big = cfg_for("int8", B * PPSEQ + 1)

timeit("A bench int4", cfg4_big, bench_cache(cfg4_big))
timeit("B tool int4", cfg4_small, tool_cache(cfg4_small, PPSEQ + 2))
timeit("C tool+big int4", cfg4_big, tool_cache(cfg4_big, B * PPSEQ + 1))
bc = bench_cache(cfg4_big)
shared = jnp.tile(bc.page_tables[:1], (B, 1))
timeit("D bench+share", cfg4_big,
       PagedKVCache(k_pages=bc.k_pages, v_pages=bc.v_pages,
                    k_scales=bc.k_scales, v_scales=bc.v_scales,
                    page_tables=shared, lengths=bc.lengths))
timeit("E tool+dist", cfg4_big, tool_cache_distinct(cfg4_big))
timeit("F bench int8", cfg8_big, bench_cache(cfg8_big))
