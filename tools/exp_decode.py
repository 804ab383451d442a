"""Decode-kernel dequant-strategy experiment (run on the real chip).

Measures end-to-end paged-decode variants against the real cache layout to
find where the INT8 path loses to the HBM roofline:

  current    — dequant K/V tiles: ``i8 -> bf16 * per-token scale`` (tile-wide
               broadcast multiply), bf16 matmuls
  postscale  — cast K/V tiles ``i8 -> bf16`` only; per-token scales applied
               to the (G, P) score/probability tiles instead
  int8mm     — native int8 MXU matmuls: q (and the probability tile)
               quantized per row in-kernel, scales folded into the small
               (G, P) tiles; no (P, D)-size casts at all

Prints ms/step, tok/s, % of the INT8 bandwidth bound, and max|err| vs the
bf16 dense oracle for each variant.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from tf_flash_attention_tpu.block_sizes import LANE, VMEM_LIMIT, pad_to
from tf_flash_attention_tpu.ops.kernel_common import LOG2E, NEG_INF_F32
from tf_flash_attention_tpu.serving.kv_cache import (
    KVCacheConfig, PageAllocator, PagedKVCache, write_prompt)
from tf_flash_attention_tpu.utils.profiling import V5E, device_time


def _decode_kernel(
    tables_ref, counts_ref, lengths_ref,
    q_ref, k_ref, ks_ref, v_ref, vs_ref,
    o_ref,
    acc_ref, m_scratch, l_scratch,
    *,
    n_kv, page_size, max_pages, scale, variant,
):
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p < counts_ref[b])
    def _compute():
        token_pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, page_size), 2)
        bounds = token_pos < lengths_ref[b]
        q = q_ref[0]                               # (n_kv, g_pad, d)
        k = k_ref[:, 0]                            # (n_kv, page, d)
        v = v_ref[:, 0]
        if variant.endswith("_t"):
            ks_row = ks_ref[:, 0]                  # (n_kv, 1, page) stored row-major
            vs_row = vs_ref[:, 0]
        else:
            ks_row = jnp.swapaxes(ks_ref[:, 0], 1, 2)  # (n_kv, 1, page)
            vs_row = jnp.swapaxes(vs_ref[:, 0], 1, 2)

        if variant == "current":
            k = k.astype(jnp.bfloat16) * ks_ref[:, 0].astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16) * vs_ref[:, 0].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q.astype(k.dtype), k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s * jnp.float32(scale * LOG2E)
        elif variant in ("postscale", "postscale_t"):
            k = k.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q.astype(k.dtype), k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s * (ks_row * jnp.float32(scale * LOG2E))
        elif variant.startswith("int8mm"):
            qq = q.astype(jnp.float32)
            qs = jnp.max(jnp.abs(qq), axis=2, keepdims=True) / 127.0
            qs = jnp.where(qs == 0.0, 1.0, qs)
            qi = jnp.round(qq / qs).astype(jnp.int8)
            s = jax.lax.dot_general(
                qi, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            s = s.astype(jnp.float32) * (qs * ks_row * jnp.float32(scale * LOG2E))
        s = jnp.where(bounds, s, NEG_INF_F32)

        m_prev = m_scratch[:, :, :1]
        l_prev = l_scratch[:, :, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        pw = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(pw, axis=2, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        if variant == "current":
            pv = jax.lax.dot_general(
                pw.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        elif variant in ("postscale", "postscale_t"):
            v = v.astype(jnp.bfloat16)
            pw = pw * vs_row
            pv = jax.lax.dot_general(
                pw.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        elif variant.startswith("int8mm"):
            pw = pw * vs_row                      # fold per-token V scale
            ps = jnp.max(pw, axis=2, keepdims=True) / 127.0
            ps = jnp.where(ps == 0.0, 1.0, ps)
            pi = jnp.round(pw / ps).astype(jnp.int8)
            pv = jax.lax.dot_general(
                pi, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            pv = pv.astype(jnp.float32) * ps
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(p == max_pages - 1)
    def _finalize():
        l_col = l_scratch[:, :, :1]
        l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def run_variant(variant, q, cache, cfg, max_seqs):
    n_kv = cfg.n_kv_heads
    _, n_q_heads, d = q.shape
    g = n_q_heads // n_kv
    g_pad = max(8, pad_to(g, 8))
    d_pad = cfg.head_dim_store
    scale = 1.0 / np.sqrt(d)
    qg = q.reshape(max_seqs, n_kv, g, d)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, d_pad - d)))
    counts = -(-cache.lengths // cfg.page_size)
    max_pages = cfg.max_pages_per_seq
    k_scales, v_scales = cache.k_scales, cache.v_scales
    scale_block = (n_kv, 1, cfg.page_size, 1)
    if variant.endswith("_t"):
        k_scales = jnp.swapaxes(k_scales, 2, 3)   # (n_kv, n_pages, 1, page)
        v_scales = jnp.swapaxes(v_scales, 2, 3)
        scale_block = (n_kv, 1, 1, cfg.page_size)

    def page_idx(b, p, t, c, L):
        lp = jnp.maximum(0, jnp.minimum(p, c[b] - 1))
        return (0, t[b, lp], 0, 0)

    def q_idx(b, p, t, c, L):
        return (b, 0, 0, 0)

    kernel = functools.partial(
        _decode_kernel, n_kv=n_kv, page_size=cfg.page_size,
        max_pages=max_pages, scale=float(scale), variant=variant)

    def fn(qg, cache):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(max_seqs, max_pages),
                in_specs=[
                    pl.BlockSpec((1, n_kv, g_pad, d_pad), q_idx),
                    pl.BlockSpec((n_kv, 1, cfg.page_size, d_pad), page_idx),
                    pl.BlockSpec(scale_block, page_idx),
                    pl.BlockSpec((n_kv, 1, cfg.page_size, d_pad), page_idx),
                    pl.BlockSpec(scale_block, page_idx),
                ],
                out_specs=[pl.BlockSpec((1, n_kv, g_pad, d_pad), q_idx)],
                scratch_shapes=[
                    pltpu.VMEM((n_kv, g_pad, d_pad), jnp.float32),
                    pltpu.VMEM((n_kv, g_pad, LANE), jnp.float32),
                    pltpu.VMEM((n_kv, g_pad, LANE), jnp.float32),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((max_seqs, n_kv, g_pad, d_pad), q.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT,
            ),
        )(jnp.asarray(cache.page_tables), counts.astype(jnp.int32),
          cache.lengths.astype(jnp.int32),
          qg, cache.k_pages, k_scales, cache.v_pages, v_scales)[0]

    out = fn(qg, cache)[:, :, :g, :d].reshape(max_seqs, n_q_heads, d)
    dt = device_time(fn, (qg, cache), n=10)
    return out, dt


def main():
    max_seqs, seq_len = 16, 8192
    n_kv, n_q, d, page = 8, 8, 128, 512
    pps = seq_len // page
    cfg = KVCacheConfig(n_kv_heads=n_kv, head_dim=d, page_size=page,
                        n_pages=max_seqs * pps + 1, max_seqs=max_seqs,
                        max_pages_per_seq=pps, quantized=True)
    cache = PagedKVCache.create(cfg)
    alloc = PageAllocator(cfg.n_pages - 1)
    rng = np.random.default_rng(0)
    kfull = np.empty((max_seqs, n_kv, seq_len, d), np.float32)
    vfull = np.empty((max_seqs, n_kv, seq_len, d), np.float32)
    for slot in range(max_seqs):
        kfull[slot] = rng.uniform(-1, 1, (n_kv, seq_len, d))
        vfull[slot] = rng.uniform(-1, 1, (n_kv, seq_len, d))
        cache = write_prompt(cache, cfg, slot,
                             np.array(alloc.alloc(slot, pps)),
                             jnp.asarray(kfull[slot], jnp.bfloat16),
                             jnp.asarray(vfull[slot], jnp.bfloat16))
    q = jnp.asarray(rng.uniform(-1, 1, (max_seqs, n_q, d)), jnp.bfloat16)

    # dense bf16 oracle
    qf = np.asarray(q, np.float32).reshape(max_seqs, n_kv, 1, d)
    s = np.einsum("bhqd,bhtd->bhqt", qf, kfull) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    oref = np.einsum("bhqt,bhtd->bhd", p, vfull)

    bytes_step = max_seqs * seq_len * n_kv * (2 * d + 2 * 4)
    t_hbm = bytes_step / V5E.hbm_bytes
    for variant in ("postscale_t", "int8mm_t"):
        out, dt = run_variant(variant, q, cache, cfg, max_seqs)
        err = np.max(np.abs(np.asarray(out, np.float32).reshape(oref.shape) - oref))
        print(f"{variant:10s}: {dt*1e3:.3f} ms/step, {max_seqs/dt:,.0f} tok/s, "
              f"{t_hbm/dt:.0%} of bw bound, max|err|={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
