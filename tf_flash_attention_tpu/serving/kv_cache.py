"""Paged, optionally INT8/FP8/INT4-quantized KV cache.

Serving-side state for multi-sequence decode (no reference counterpart —
the reference is a stateless op library, SURVEY.md §5).  Virtual-memory
layout: K/V live in fixed-size pages scattered across HBM; each sequence
owns a page table.  Values may be stored INT8/FP8 with per-token scales,
or INT4 (two tokens nibble-packed per int8 byte), dequantized inside the
decode kernel.

Layouts (``pack`` = tokens per stored byte row: 1 for int8/fp8, 2 for int4):
  k_pages, v_pages: (n_kv_heads, n_pages, page_size // pack, head_dim)
  k_scales, v_scales: (n_kv_heads, n_pages, pack, page_size // pack) f32
  page_tables: (max_seqs, max_pages_per_seq) int32
  lengths:     (max_seqs,) int32

Scales are stored *token-minor* — one lane-major row per page (two for
int4: sublane 0 = even-position tokens, sublane 1 = odd) — so the decode
kernel fetches them as a single contiguous DMA.  The transposed layout
(page_size, 1) costs a one-lane-wide DMA per page, which measured ~4x
slower end-to-end on v5e (18% -> 71% of the HBM bandwidth bound at B=16,
ctx=8k).

INT4 packs tokens pairwise along the *token* axis (byte row r of a page
holds token 2r in its low nibble, token 2r+1 in its high nibble), keeping
the lane (feature) axis at full width so every DMA and matmul tile shape
is unchanged — native ``jnp.int4`` arrays cannot cross jit boundaries on
all platforms, and lane-axis packing would shrink tiles below the 128-lane
width.  Kernels sign-extend the nibbles with two shifts and attend to the
even/odd halves as two half-page key/value sets.

The page allocator is host-side (free-list); device state is a pytree so
the whole cache threads through jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..block_sizes import LANE, pad_to

__all__ = ["KVCacheConfig", "PagedKVCache", "PageAllocator", "write_tokens_at",
           "gather_sequence_kv"]


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    n_kv_heads: int
    head_dim: int
    page_size: int = 512
    n_pages: int = 64
    max_seqs: int = 8
    max_pages_per_seq: int = 16
    quantized: bool = True
    # int8, float8_e4m3fn, float8_e5m2, or the string "int4" (nibble-packed
    # int8 bytes)
    quant_dtype: object = jnp.int8
    dtype: object = jnp.bfloat16      # payload dtype when not quantized

    @property
    def head_dim_store(self) -> int:
        # storage feature dim padded to the TPU lane width so kernel block
        # specs never read past the array
        return pad_to(self.head_dim, LANE)

    @property
    def is_int4(self) -> bool:
        return self.quantized and isinstance(self.quant_dtype, str) \
            and self.quant_dtype == "int4"

    @property
    def tok_pack(self) -> int:
        """Tokens per stored byte row (2 for int4, else 1)."""
        return 2 if self.is_int4 else 1

    @property
    def page_rows(self) -> int:
        """Payload sublane rows per page (= page_size / tok_pack)."""
        return self.page_size // self.tok_pack

    @property
    def payload_dtype(self):
        if not self.quantized:
            return self.dtype
        return jnp.int8 if self.is_int4 else self.quant_dtype


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    k_pages: jax.Array
    v_pages: jax.Array
    k_scales: Optional[jax.Array]
    v_scales: Optional[jax.Array]
    page_tables: jax.Array  # (max_seqs, max_pages_per_seq) int32
    lengths: jax.Array      # (max_seqs,) int32

    @staticmethod
    def create(cfg: KVCacheConfig) -> "PagedKVCache":
        shape = (cfg.n_kv_heads, cfg.n_pages, cfg.page_rows, cfg.head_dim_store)
        scales_shape = (cfg.n_kv_heads, cfg.n_pages, cfg.tok_pack, cfg.page_rows)
        return PagedKVCache(
            k_pages=jnp.zeros(shape, cfg.payload_dtype),
            v_pages=jnp.zeros(shape, cfg.payload_dtype),
            k_scales=jnp.ones(scales_shape, jnp.float32) if cfg.quantized else None,
            v_scales=jnp.ones(scales_shape, jnp.float32) if cfg.quantized else None,
            page_tables=jnp.zeros((cfg.max_seqs, cfg.max_pages_per_seq), jnp.int32),
            lengths=jnp.zeros((cfg.max_seqs,), jnp.int32),
        )


def _pad_feature(x, d_store):
    d = x.shape[-1]
    if d == d_store:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, d_store - d)])


def _quant_max(qdtype) -> float:
    if isinstance(qdtype, str) and qdtype == "int4":
        return 7.0
    if jnp.dtype(qdtype) == jnp.int8:
        return 127.0
    if jnp.dtype(qdtype) == jnp.dtype(jnp.float8_e4m3fn):
        return 448.0
    if jnp.dtype(qdtype) == jnp.dtype(jnp.float8_e5m2):
        return 57344.0
    raise ValueError(f"unsupported quant dtype {qdtype}")


def _quantize_tokens(x, qdtype=jnp.int8):
    """Per-token symmetric quantization to ``qdtype`` (int8, fp8-e4m3, or
    "int4"): x (..., t, d) -> (payload, f32 scales (..., t, 1)).  int4
    values come back *unpacked*, one int8 in [-7, 7] per token — pack
    pairs with ``_pack_nibbles``."""
    qmax = _quant_max(qdtype)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
    scaled = x.astype(jnp.float32) / scale
    if isinstance(qdtype, str) and qdtype == "int4":
        q = jnp.clip(jnp.round(scaled), -7, 7).astype(jnp.int8)
    elif jnp.dtype(qdtype) == jnp.int8:
        q = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
    else:
        q = scaled.astype(qdtype)
    return q, scale


def _pack_nibbles(q):
    """Pack token pairs along the second-to-last axis: int8 values in
    [-7, 7] of shape (..., t, d) -> int8 bytes (..., t//2, d), token 2r in
    the low nibble of byte row r, token 2r+1 in the high nibble."""
    lo = q[..., 0::2, :].astype(jnp.int32) & 0xF
    hi = q[..., 1::2, :].astype(jnp.int32) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def _pack_scales(sc):
    """Per-token scales (..., t) -> (..., 2, t//2): sublane 0 = scales of
    even-position tokens, sublane 1 = odd (matching ``_pack_nibbles``)."""
    return jnp.stack([sc[..., 0::2], sc[..., 1::2]], axis=-2)


def _unpack_nibbles(x):
    """Sign-extend packed int4 bytes (Pallas-safe: shifts only).
    (..., rows, d) int8 -> (even, odd) int32 pair, each (..., rows, d)."""
    xi = x.astype(jnp.int32)
    even = (xi << 28) >> 28
    odd = (xi << 24) >> 28
    return even, odd


def append_token(cache: PagedKVCache, cfg: KVCacheConfig, slot, k_new, v_new) -> PagedKVCache:
    """Append one token's K/V for sequence ``slot``.

    ``k_new, v_new``: (n_kv_heads, head_dim).  Page index and intra-page
    offset derive from the current length; the page table must already map
    the target page (see ``PageAllocator.ensure_capacity``).
    """
    k_new = _pad_feature(k_new, cfg.head_dim_store)
    v_new = _pad_feature(v_new, cfg.head_dim_store)
    length = cache.lengths[slot]
    logical_page = (length // cfg.page_size) % cfg.max_pages_per_seq
    offset = length % cfg.page_size
    page = cache.page_tables[slot, logical_page]
    n_kv, d_store = cfg.n_kv_heads, cfg.head_dim_store

    def scatter(pages, scales, new):
        if cfg.is_int4:
            qv, sc = _quantize_tokens(new, cfg.quant_dtype)  # (n_kv, d), [-7,7]
            byte_row = offset // 2
            nib = offset % 2
            old = jax.lax.dynamic_slice(
                pages, (0, page, byte_row, 0), (n_kv, 1, 1, d_store)
            ).astype(jnp.int32)
            q32 = qv.astype(jnp.int32)[:, None, None, :] & 0xF
            # RMW the byte: an even append owns the whole byte (its odd
            # partner doesn't exist yet -> high nibble 0); an odd append
            # preserves the even token in the low nibble
            new_byte = jnp.where(nib == 0,
                                 q32,
                                 (old & 0xF) | (q32 << 4)).astype(jnp.int8)
            pages = jax.lax.dynamic_update_slice(
                pages, new_byte, (0, page, byte_row, 0))
            scales = jax.lax.dynamic_update_slice(
                scales, sc[:, None, None, :], (0, page, nib, byte_row))
            return pages, scales
        if cfg.quantized:
            qv, sc = _quantize_tokens(new, cfg.quant_dtype)
            pages = jax.lax.dynamic_update_slice(
                pages, qv[:, None, None, :], (0, page, offset, 0))
            # token-minor scale layout: one f32 per token along the lane dim
            scales = jax.lax.dynamic_update_slice(
                scales, sc[:, None, None, :], (0, page, 0, offset))
            return pages, scales
        pages = jax.lax.dynamic_update_slice(
            pages, new.astype(pages.dtype)[:, None, None, :], (0, page, offset, 0))
        return pages, scales

    k_pages, k_scales = scatter(cache.k_pages, cache.k_scales, k_new)
    v_pages, v_scales = scatter(cache.v_pages, cache.v_scales, v_new)
    return dataclasses.replace(
        cache,
        k_pages=k_pages, v_pages=v_pages,
        k_scales=k_scales, v_scales=v_scales,
        lengths=cache.lengths.at[slot].add(1),
    )


def write_prompt(cache: PagedKVCache, cfg: KVCacheConfig, slot: int,
                 pages: np.ndarray, k: jax.Array, v: jax.Array) -> PagedKVCache:
    """Bulk-write a prompt's K/V into pre-allocated physical ``pages``.

    ``k, v``: (n_kv_heads, t, head_dim); ``pages``: host int32 array of the
    physical pages backing the prompt (``ceil(t / page_size)`` entries).
    """
    k = _pad_feature(k, cfg.head_dim_store)
    v = _pad_feature(v, cfg.head_dim_store)
    t = k.shape[1]
    n_used = -(-t // cfg.page_size)
    assert len(pages) >= n_used
    pad = n_used * cfg.page_size - t
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kp = kp.reshape(cfg.n_kv_heads, n_used, cfg.page_size, cfg.head_dim_store)
    vp = vp.reshape(cfg.n_kv_heads, n_used, cfg.page_size, cfg.head_dim_store)

    k_pages, v_pages = cache.k_pages, cache.v_pages
    k_scales, v_scales = cache.k_scales, cache.v_scales
    if cfg.is_int4:
        kq, ks = _quantize_tokens(kp, cfg.quant_dtype)
        vq, vs = _quantize_tokens(vp, cfg.quant_dtype)
        kq, vq = _pack_nibbles(kq), _pack_nibbles(vq)  # (n_kv, n_used, page/2, d)
        ks = _pack_scales(ks[..., 0])                  # (n_kv, n_used, 2, page/2)
        vs = _pack_scales(vs[..., 0])
    elif cfg.quantized:
        kq, ks = _quantize_tokens(kp, cfg.quant_dtype)
        vq, vs = _quantize_tokens(vp, cfg.quant_dtype)
        ks = jnp.swapaxes(ks, 2, 3)  # -> token-minor (n_kv, n_used, 1, page)
        vs = jnp.swapaxes(vs, 2, 3)
    else:
        kq, vq, ks, vs = kp.astype(k_pages.dtype), vp.astype(v_pages.dtype), None, None
    for i in range(n_used):
        p = int(pages[i])
        k_pages = k_pages.at[:, p].set(kq[:, i])
        v_pages = v_pages.at[:, p].set(vq[:, i])
        if cfg.quantized:
            k_scales = k_scales.at[:, p].set(ks[:, i])
            v_scales = v_scales.at[:, p].set(vs[:, i])
    table = cache.page_tables.at[slot, :n_used].set(jnp.asarray(pages[:n_used], jnp.int32))
    return dataclasses.replace(
        cache,
        k_pages=k_pages, v_pages=v_pages, k_scales=k_scales, v_scales=v_scales,
        page_tables=table,
        lengths=cache.lengths.at[slot].set(t),
    )


def _chunk_write_kernel(tables_ref, meta_ref,
                        kq_ref, ksc_ref, vq_ref, vsc_ref,
                        kpi_ref, ksi_ref, vpi_ref, vsi_ref,
                        kpo_ref, kso_ref, vpo_ref, vso_ref,
                        *, quantized: bool):
    """Block-copy one aligned row-group of the chunk into its page.

    The aliased page inputs arrive as untouched HBM refs (memory space
    ANY) purely to carry the aliasing; every output block is fully
    overwritten, and unvisited pages keep their aliased contents.
    """
    del tables_ref, meta_ref, kpi_ref, ksi_ref, vpi_ref, vsi_ref
    kpo_ref[...] = kq_ref[...][:, None]
    vpo_ref[...] = vq_ref[...][:, None]
    if quantized:
        # scale values are (n_kv, pack, rows) -> page block (n_kv,1,pack,rows)
        kso_ref[...] = ksc_ref[...][:, None]
        vso_ref[...] = vsc_ref[...][:, None]


def _owned_token_count(total, page_size, stride, offset):
    """Tokens in [0, total) on the shard owning every ``stride``-th page
    starting at ``offset`` (sequence sharding; stride 1 owns everything)."""
    total = jnp.asarray(total, jnp.int32)
    if stride == 1:
        return total
    n_g = total // page_size
    full = jnp.where(n_g > offset, (n_g - offset + stride - 1) // stride, 0)
    tail = jnp.where((n_g % stride) == offset, total % page_size, 0)
    return full * page_size + tail


def _chunk_write_via_kernel(cache, cfg, slot, start, total, trash_page,
                            kq, ksc, vq, vsc, page_stride=1, page_offset=None):
    """Pallas path for the chunked-prefill KV write.

    Requires the engine's alignment invariant (chunks start at multiples
    of ``rows_block = min(chunk, page_size)``, which divides both chunk
    and page size), so each grid step fully overwrites one aligned
    (rows_block/pack, d) byte-row-group of a page — no read-modify-write,
    no scatter.  Row-groups past ``total`` are routed to the trash page;
    padding rows inside the last live group land at positions beyond the
    sequence length, which nothing ever reads and later appends overwrite
    row-by-row (int4: nibble-by-nibble).

    ``kq/vq``: packed payloads (n_kv, chunk/pack, d_store);
    ``ksc/vsc``: scales (n_kv, pack, chunk/pack) (quantized only).
    """
    n_kv, n_pages, page_rows, d_store = cache.k_pages.shape
    pack = cfg.tok_pack
    page_size = cfg.page_size
    chunk = kq.shape[1] * pack
    rows_block = min(chunk, page_size)       # tokens per grid step
    brows = rows_block // pack               # byte rows per grid step
    n_blocks = chunk // rows_block
    max_pages = cache.page_tables.shape[1]
    quantized = cfg.quantized
    if not quantized:
        ksc = jnp.zeros((n_kv, 1, chunk), jnp.float32)
        vsc = ksc
        k_scales_in = jnp.zeros((n_kv, 1, 1, page_size), jnp.float32)
        v_scales_in = k_scales_in
    else:
        k_scales_in, v_scales_in = cache.k_scales, cache.v_scales

    # logical pages wrap modulo the table width (rolling table): for
    # bounded-length sequences the modulo is the identity; with a window
    # rule the engine reuses table slots of pages below the window.
    # Sequence sharding: this shard owns every page_stride-th global page
    # starting at meta[4]; row-groups of other shards' pages go to trash.
    def _phys(tables, meta, off_tok):
        g = off_tok // page_size
        if page_stride == 1:
            logical = g % max_pages
            own = off_tok < meta[2]
        else:
            logical = ((g - meta[4]) // page_stride) % max_pages
            own = jnp.logical_and(off_tok < meta[2],
                                  (g % page_stride) == meta[4])
        return jnp.where(own, tables[meta[0], logical], meta[3])

    def page_idx(i, tables, meta):
        off_tok = meta[1] + i * rows_block
        return (0, _phys(tables, meta, off_tok),
                (off_tok % page_size) // rows_block, 0)

    def scales_idx(i, tables, meta):
        if not quantized:
            return (0, 0, 0, 0)
        off_tok = meta[1] + i * rows_block
        return (0, _phys(tables, meta, off_tok), 0,
                (off_tok % page_size) // rows_block)

    def val_idx(i, tables, meta):
        return (0, i, 0)

    def sc_val_idx(i, tables, meta):
        return (0, 0, i)

    offset = (jnp.asarray(0, jnp.int32) if page_offset is None
              else jnp.asarray(page_offset, jnp.int32))
    meta = jnp.stack([
        jnp.asarray(slot, jnp.int32), jnp.asarray(start, jnp.int32),
        jnp.asarray(total, jnp.int32), jnp.asarray(trash_page, jnp.int32),
        offset])
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    page_block = pl.BlockSpec((n_kv, 1, brows, d_store), page_idx)
    scales_block = pl.BlockSpec((n_kv, 1, k_scales_in.shape[2], brows), scales_idx)
    sc_val_block = pl.BlockSpec((n_kv, ksc.shape[1], brows), sc_val_idx)
    outs = pl.pallas_call(
        functools.partial(_chunk_write_kernel, quantized=quantized),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((n_kv, brows, d_store), val_idx),
                sc_val_block,
                pl.BlockSpec((n_kv, brows, d_store), val_idx),
                sc_val_block,
                any_spec, any_spec, any_spec, any_spec,
            ],
            out_specs=[page_block, scales_block, page_block, scales_block],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(cache.k_pages.shape, cache.k_pages.dtype),
            jax.ShapeDtypeStruct(k_scales_in.shape, jnp.float32),
            jax.ShapeDtypeStruct(cache.v_pages.shape, cache.v_pages.dtype),
            jax.ShapeDtypeStruct(v_scales_in.shape, jnp.float32),
        ],
        # 2 scalar prefetch + 4 value operands; aliased page arrays at 6..9
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(jnp.asarray(cache.page_tables), meta, kq, ksc, vq, vsc,
      cache.k_pages, k_scales_in, cache.v_pages, v_scales_in)
    k_pages, k_scales, v_pages, v_scales = outs
    if not quantized:
        k_scales = v_scales = None
    return k_pages, k_scales, v_pages, v_scales


def write_tokens_at(cache: PagedKVCache, cfg: KVCacheConfig, slot, start,
                    k: jax.Array, v: jax.Array, true_len,
                    trash_page: int,
                    page_stride: int = 1, page_offset=None,
                    interpret: Optional[bool] = None) -> PagedKVCache:
    """Write a chunk of tokens at absolute position ``start`` (chunked prefill).

    ``k, v``: (n_kv_heads, chunk, head_dim); ``slot``, ``start`` and
    ``true_len`` are traced scalars so one compilation serves every chunk
    of every prompt.  Rows past ``true_len`` (chunk padding) are routed to
    the reserved ``trash_page`` so the scatter stays branch-free and never
    touches unassigned pages.  The slot's length becomes
    ``start + true_len``.

    Sequence sharding: with ``page_stride``/``page_offset`` this cache
    holds every ``page_stride``-th global page starting at ``page_offset``
    — tokens of other shards' pages route to the trash page and the
    slot's (local) length becomes its owned-token count.

    On TPU, when the engine's chunk/page alignment holds, the write goes
    through an aliased block-copy Pallas kernel; the XLA-scatter path
    remains for interpret mode, unaligned chunks, and as the spec.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    chunk = k.shape[1]
    page = cfg.page_size
    pack = cfg.tok_pack
    if pack == 2 and chunk % 2:
        raise ValueError(f"int4 KV requires an even chunk, got {chunk}")
    # full-page blocks need page byte-rows divisible by the sublane width;
    # sub-page blocks additionally block the lane-major scale row by chunk
    # byte-rows, which must then be lane-aligned
    aligned = (chunk % page == 0 and (page // pack) % 8 == 0) or (
        page % chunk == 0 and (chunk // pack) % 128 == 0)
    if not interpret and aligned:
        def quant(new):
            vals = _pad_feature(new, cfg.head_dim_store)  # (n_kv, chunk, d)
            if cfg.is_int4:
                qv, sc = _quantize_tokens(vals, cfg.quant_dtype)
                # packed payload + (n_kv, 2, chunk/2) even/odd scales
                return _pack_nibbles(qv), _pack_scales(sc[..., 0])
            if cfg.quantized:
                qv, sc = _quantize_tokens(vals, cfg.quant_dtype)
                return qv, sc[..., 0][:, None]            # (n_kv, 1, chunk)
            return vals.astype(cache.k_pages.dtype), None

        kq, ksc = quant(k)
        vq, vsc = quant(v)
        total = jnp.asarray(start, jnp.int32) + jnp.asarray(true_len, jnp.int32)
        k_pages, k_scales, v_pages, v_scales = _chunk_write_via_kernel(
            cache, cfg, slot, start, total, trash_page, kq, ksc, vq, vsc,
            page_stride=page_stride, page_offset=page_offset)
        loc_len = _owned_token_count(
            total, page, page_stride,
            0 if page_offset is None else jnp.asarray(page_offset, jnp.int32))
        return dataclasses.replace(
            cache,
            k_pages=k_pages, v_pages=v_pages,
            k_scales=k_scales, v_scales=v_scales,
            lengths=cache.lengths.at[slot].set(loc_len),
        )
    if pack == 2 and jnp.ndim(start) == 0 and isinstance(start, int) and start % 2:
        raise ValueError("int4 chunked writes must start at even positions")
    pos = jnp.asarray(start, jnp.int32) + jnp.arange(chunk, dtype=jnp.int32)
    valid = jnp.arange(chunk) < true_len
    poff = (jnp.asarray(0, jnp.int32) if page_offset is None
            else jnp.asarray(page_offset, jnp.int32))
    g = pos // cfg.page_size
    if page_stride == 1:
        logical = g % cfg.max_pages_per_seq
    else:
        logical = ((g - poff) // page_stride) % cfg.max_pages_per_seq
        valid = jnp.logical_and(valid, (g % page_stride) == poff)
    phys = cache.page_tables[slot, logical]
    phys = jnp.where(valid, phys, trash_page)
    offset = pos % cfg.page_size

    def scatter(pages, scales, new):
        vals = _pad_feature(new, cfg.head_dim_store)      # (n_kv, chunk, d_store)
        if cfg.is_int4:
            # start is even (engine invariant), so the chunk covers whole
            # byte rows; route a byte row to trash only if BOTH its tokens
            # are padding (an odd true_len leaves a zero high nibble that
            # later appends overwrite nibble-wise)
            qv, sc = _quantize_tokens(vals, cfg.quant_dtype)
            qb = _pack_nibbles(qv)                        # (n_kv, chunk/2, d)
            scp = _pack_scales(sc[..., 0])                # (n_kv, 2, chunk/2)
            phys_b = phys[0::2]
            off_b = offset[0::2] // 2
            pages = pages.at[:, phys_b, off_b, :].set(qb)
            scales = scales.at[:, phys_b, 0, off_b].set(scp[:, 0])
            scales = scales.at[:, phys_b, 1, off_b].set(scp[:, 1])
            return pages, scales
        if cfg.quantized:
            qv, sc = _quantize_tokens(vals, cfg.quant_dtype)
            pages = pages.at[:, phys, offset, :].set(qv)
            scales = scales.at[:, phys, 0, offset].set(sc[..., 0])
            return pages, scales
        return pages.at[:, phys, offset, :].set(vals.astype(pages.dtype)), scales

    k_pages, k_scales = scatter(cache.k_pages, cache.k_scales, k)
    v_pages, v_scales = scatter(cache.v_pages, cache.v_scales, v)
    total = jnp.asarray(start, jnp.int32) + jnp.asarray(true_len, jnp.int32)
    loc_len = _owned_token_count(total, cfg.page_size, page_stride, poff)
    return dataclasses.replace(
        cache,
        k_pages=k_pages, v_pages=v_pages,
        k_scales=k_scales, v_scales=v_scales,
        lengths=cache.lengths.at[slot].set(loc_len),
    )


def assign_page(cache: PagedKVCache, slot: int, logical_page: int, physical_page: int) -> PagedKVCache:
    """Map ``logical_page`` of ``slot`` to ``physical_page`` in the table."""
    return dataclasses.replace(
        cache,
        page_tables=cache.page_tables.at[slot, logical_page].set(physical_page),
    )


def _append_rmw_kernel(phys_ref, off_ref,
                       kq_ref, ksc_ref, vq_ref, vsc_ref,
                       kpi_ref, ksi_ref, vpi_ref, vsi_ref,
                       kpo_ref, kso_ref, vpo_ref, vso_ref,
                       *, page_size: int, quantized: bool, pack: int):
    """In-place (aliased) read-modify-write of one token row per slot.

    pack == 2 (int4): the token RMWs a single *nibble* of its byte row —
    an even token owns the whole byte (its odd partner doesn't exist yet),
    an odd token preserves the even token in the low nibble.
    """
    s = pl.program_id(0)
    off = off_ref[s]
    page_rows = page_size // pack
    brow = off // pack
    row_sel = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, page_rows, 1), 2) == brow

    def blend(new_tok, old_pages):
        new = new_tok[:, None, None, :]
        if pack == 1:
            return jnp.where(row_sel, new, old_pages)
        old32 = old_pages.astype(jnp.int32)
        q32 = new.astype(jnp.int32) & 0xF
        byte = jnp.where(off % 2 == 0, q32, (old32 & 0xF) | (q32 << 4))
        return jnp.where(row_sel, byte, old32).astype(jnp.int8)

    kpo_ref[...] = blend(kq_ref[0], kpi_ref[...])
    vpo_ref[...] = blend(vq_ref[0], vpi_ref[...])
    if quantized:
        n_kv = ksi_ref.shape[0]
        lane_sel = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, 1, page_rows), 3) == brow
        if pack == 2:
            sub_sel = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, pack, 1), 2) == off % 2
            lane_sel = jnp.logical_and(lane_sel, sub_sel)
        # scales come in transposed (n_kv, S): extract lane s by masked
        # reduction (dynamic lane slices / lane->sublane reshapes do not
        # lower on Mosaic), keeping the value sublane-major so it
        # broadcasts cleanly to the (n_kv, 1, pack, page_rows) scale block
        slot_sel = jax.lax.broadcasted_iota(
            jnp.int32, ksc_ref.shape, 1) == s
        ks_col = jnp.sum(jnp.where(slot_sel, ksc_ref[...], 0.0),
                         axis=1, keepdims=True)            # (n_kv, 1)
        vs_col = jnp.sum(jnp.where(slot_sel, vsc_ref[...], 0.0),
                         axis=1, keepdims=True)
        ksb = jax.lax.broadcast_in_dim(ks_col, (n_kv, 1, 1, page_rows), (0, 3))
        vsb = jax.lax.broadcast_in_dim(vs_col, (n_kv, 1, 1, page_rows), (0, 3))
        kso_ref[...] = jnp.where(lane_sel, ksb, ksi_ref[...])
        vso_ref[...] = jnp.where(lane_sel, vsb, vsi_ref[...])


def _append_via_kernel(cache, cfg, phys, offset, kq, ksc, vq, vsc):
    """Pallas path for the decode-step append: each grid step RMWs its
    slot's target page in VMEM with the pages aliased in-place, so the
    update costs one page of DMA per slot instead of an XLA scatter (which
    lowers to a serial multi-ms update chain on TPU).

    Safe aliasing: two active slots never target the same physical page
    (each appends at its own length, past any shared prefix); only the
    trash page can repeat, and its contents are garbage by design.
    """
    S = phys.shape[0]
    n_kv, n_pages, page_rows, d_store = cache.k_pages.shape
    pack = cfg.tok_pack
    quantized = cfg.quantized
    if not quantized:
        ksc = jnp.zeros((n_kv, S), jnp.float32)
        vsc = ksc
        k_scales_in = jnp.zeros((n_kv, 1, 1, cfg.page_size), jnp.float32)
        v_scales_in = k_scales_in
    else:
        k_scales_in, v_scales_in = cache.k_scales, cache.v_scales

    def val_idx(s, phys, off):
        return (s, 0, 0)

    def sc_val_idx(s, phys, off):
        # the (n_kv, S) scale values are too small to block per-slot under
        # TPU tiling rules; load whole and slice the slot lane in-kernel
        return (0, 0)

    def page_idx(s, phys, off):
        return (0, phys[s], 0, 0)

    def scales_idx(s, phys, off):
        if quantized:
            return (0, phys[s], 0, 0)
        return (0, 0, 0, 0)

    page_block = pl.BlockSpec((n_kv, 1, page_rows, d_store), page_idx)
    scales_block = pl.BlockSpec((n_kv, 1, k_scales_in.shape[2], k_scales_in.shape[3]),
                                scales_idx)
    outs = pl.pallas_call(
        functools.partial(_append_rmw_kernel, page_size=cfg.page_size,
                          quantized=quantized, pack=pack),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, n_kv, d_store), val_idx),
                pl.BlockSpec((n_kv, S), sc_val_idx),
                pl.BlockSpec((1, n_kv, d_store), val_idx),
                pl.BlockSpec((n_kv, S), sc_val_idx),
                page_block, scales_block, page_block, scales_block,
            ],
            out_specs=[page_block, scales_block, page_block, scales_block],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(cache.k_pages.shape, cache.k_pages.dtype),
            jax.ShapeDtypeStruct(k_scales_in.shape, jnp.float32),
            jax.ShapeDtypeStruct(cache.v_pages.shape, cache.v_pages.dtype),
            jax.ShapeDtypeStruct(v_scales_in.shape, jnp.float32),
        ],
        # flattened input indices: 2 scalar-prefetch args, 4 value operands,
        # then the 4 aliased page arrays at 6..9
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(phys, offset, kq, ksc, vq, vsc,
      cache.k_pages, k_scales_in, cache.v_pages, v_scales_in)
    k_pages, k_scales, v_pages, v_scales = outs
    if not quantized:
        k_scales = v_scales = None
    return k_pages, k_scales, v_pages, v_scales


def append_tokens_batched(cache: PagedKVCache, cfg: KVCacheConfig,
                          k_new: jax.Array, v_new: jax.Array,
                          active: jax.Array, trash_page: int,
                          interpret: Optional[bool] = None) -> PagedKVCache:
    """Append one token per sequence slot (vectorised decode-step write).

    ``k_new, v_new``: (max_seqs, n_kv_heads, head_dim); ``active``:
    (max_seqs,) bool.  Inactive slots write to the reserved ``trash_page``
    so the scatter stays branch-free; their lengths do not advance.

    On TPU the write goes through an aliased Pallas RMW kernel (see
    ``_append_via_kernel``); the XLA-scatter path remains for interpret
    mode and as the behavioural spec.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    lengths = cache.lengths
    logical = (lengths // cfg.page_size) % cfg.max_pages_per_seq
    offset = lengths % cfg.page_size
    phys = jnp.take_along_axis(cache.page_tables, logical[:, None], axis=1)[:, 0]
    phys = jnp.where(active, phys, trash_page)

    if not interpret:
        def quant(new):
            vals = _pad_feature(new, cfg.head_dim_store)   # (S, n_kv, d_store)
            if cfg.quantized:
                qv, sc = _quantize_tokens(vals, cfg.quant_dtype)
                return qv, sc[..., 0].T  # (n_kv, S) for the kernel
            return vals.astype(cache.k_pages.dtype), None

        kq, ksc = quant(k_new)
        vq, vsc = quant(v_new)
        k_pages, k_scales, v_pages, v_scales = _append_via_kernel(
            cache, cfg, phys.astype(jnp.int32), offset.astype(jnp.int32),
            kq, ksc, vq, vsc)
        return dataclasses.replace(
            cache,
            k_pages=k_pages, v_pages=v_pages,
            k_scales=k_scales, v_scales=v_scales,
            lengths=cache.lengths + active.astype(jnp.int32),
        )

    def scatter(pages, scales, new):
        # new: (max_seqs, n_kv_heads, d) -> write at [:, phys[s], offset[s], :]
        vals = jnp.swapaxes(_pad_feature(new, cfg.head_dim_store), 0, 1)
        if cfg.is_int4:
            qv, sc = _quantize_tokens(vals, cfg.quant_dtype)   # (n_kv, S, d)
            brow = offset // 2
            nib = offset % 2
            old = pages[:, phys, brow, :].astype(jnp.int32)    # (n_kv, S, d)
            q32 = qv.astype(jnp.int32) & 0xF
            # even append owns the byte; odd append keeps the low nibble
            byte = jnp.where(nib[None, :, None] == 0,
                             q32, (old & 0xF) | (q32 << 4)).astype(jnp.int8)
            pages = pages.at[:, phys, brow, :].set(byte)
            scales = scales.at[:, phys, nib, brow].set(sc[..., 0])
            return pages, scales
        if cfg.quantized:
            qv, sc = _quantize_tokens(vals, cfg.quant_dtype)
            pages = pages.at[:, phys, offset, :].set(qv)
            # token-minor layout: slot s writes scales[:, phys[s], 0, offset[s]]
            scales = scales.at[:, phys, 0, offset].set(sc[..., 0])
            return pages, scales
        return pages.at[:, phys, offset, :].set(vals.astype(pages.dtype)), scales

    k_pages, k_scales = scatter(cache.k_pages, cache.k_scales, k_new)
    v_pages, v_scales = scatter(cache.v_pages, cache.v_scales, v_new)
    return dataclasses.replace(
        cache,
        k_pages=k_pages, v_pages=v_pages,
        k_scales=k_scales, v_scales=v_scales,
        lengths=cache.lengths + active.astype(jnp.int32),
    )


def gather_sequence_kv(cache: PagedKVCache, cfg: KVCacheConfig, slot: int,
                       length: Optional[int] = None):
    """Host-side: gather and dequantize one sequence's K/V from its pages.

    Returns ``(k, v)`` float32 of shape (n_kv_heads, length, head_dim) —
    exactly the values the decode/prefill kernels reconstruct, so kernel
    outputs can be checked against a dense oracle on these with tight
    tolerances (quantization error cancels out).  Test/debug utility.

    Rolling page tables (sliding-window sequences longer than the table):
    logical pages wrap modulo the table width, so tokens whose table slot
    has been reused return the OVERWRITING page's data — only the last
    window of a wrapped sequence is recoverable (which is all the kernels
    ever read).
    """
    table = np.asarray(cache.page_tables)[slot]
    L = int(cache.lengths[slot]) if length is None else int(length)
    n_used = -(-L // cfg.page_size)
    kp = np.asarray(cache.k_pages)
    vp = np.asarray(cache.v_pages)
    ksc = np.asarray(cache.k_scales) if cfg.quantized else None
    vsc = np.asarray(cache.v_scales) if cfg.quantized else None

    def page_tokens(pages, scales, p):
        if cfg.is_int4:
            b = pages[:, p].astype(np.int32)          # (n_kv, page/2, d)
            even = ((b << 28) >> 28).astype(np.float32)
            odd = ((b << 24) >> 28).astype(np.float32)
            out = np.empty((b.shape[0], b.shape[1] * 2, b.shape[2]), np.float32)
            out[:, 0::2] = even * scales[:, p, 0][:, :, None]
            out[:, 1::2] = odd * scales[:, p, 1][:, :, None]
            return out
        if cfg.quantized:
            return pages[:, p].astype(np.float32) * scales[:, p, 0][:, :, None]
        return pages[:, p].astype(np.float32)

    mp = cfg.max_pages_per_seq
    ks = [page_tokens(kp, ksc, int(table[i % mp])) for i in range(n_used)]
    vs = [page_tokens(vp, vsc, int(table[i % mp])) for i in range(n_used)]
    k = np.concatenate(ks, axis=1)[:, :L, :cfg.head_dim]
    v = np.concatenate(vs, axis=1)[:, :L, :cfg.head_dim]
    return k, v


class PageAllocator:
    """Host-side free-list page allocator (the runtime's memory manager)."""

    def __init__(self, n_pages: int):
        self._free = list(range(n_pages - 1, -1, -1))
        self._owned = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, slot: int, n: int):
        if n > len(self._free):
            raise MemoryError(f"out of KV pages: want {n}, have {len(self._free)}")
        pages = [self._free.pop() for _ in range(n)]
        self._owned.setdefault(slot, []).extend(pages)
        return pages

    def owned(self, slot: int):
        return list(self._owned.get(slot, []))

    def free(self, slot: int):
        pages = self._owned.pop(slot, [])
        self._free.extend(reversed(pages))
        return pages
