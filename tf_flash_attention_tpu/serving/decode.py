"""Paged decode attention kernel (q_len = 1, INT8/FP8/INT4 KV, GQA).

The serving-path kernel from the BASELINE north star: one new query token
per sequence attends to its paged (optionally quantized) KV cache.  Design
points:

* the page table is a **scalar-prefetch argument and the kv ``BlockSpec``
  index maps read it**, so non-contiguous pages stream through the normal
  Pallas input pipeline with automatic double buffering — no hand-rolled
  DMA machinery (the same trace-time-table trick the training kernels use
  for block skipping);
* one grid step covers **all KV heads of one page** (an unrolled in-kernel
  head loop): per-step work is ~1 MB of DMA + a few small matmuls, so the
  fixed per-step cost amortises — decode throughput is grid-overhead
  sensitive, not MXU-bound;
* steps past a sequence's page count re-map to its last page — consecutive
  identical block indices are not re-fetched, so dead steps cost no
  bandwidth — and their compute is predicated off;
* quantized payloads are dequantized per page inside the kernel, halving
  decode HBM traffic, which is the binding resource (decode is
  bandwidth-bound).  Dequantization is *post-scaled*: the (page, d) tiles
  are only cast (``int8/fp8 -> bf16``); the per-token scales — stored
  token-minor, one contiguous lane-major row per page — are applied to
  the small (group, page) score/probability tiles instead (K scales fold
  into the logits scale multiply, V scales into the probabilities before
  the PV matmul).  Applying scales to the big tiles, or storing them
  token-major (one-lane-wide DMAs), each measured ~4x slower end-to-end;
* GQA: queries are grouped per KV head, one ``(group, d) @ (d, page)``
  matmul per head per page.

* INT4 KV (nibble-packed int8 bytes, two tokens per byte row) halves the
  page bytes again; the kernel sign-extends the nibbles with int32 shifts
  and attends to the even/odd token halves as two half-page key sets under
  one online softmax.  The unpack is VPU work proportional to the bytes
  streamed, so it only wins once per-step fixed costs are amortised:
  **use page_size >= 512 with int4** (measured on v5e at B=16, ctx=8k:
  page 256 int4 is ~20% slower than int8; page 1024 int4 is ~18% faster
  than page-1024 int8 and ~2.6x the page-256 engine baseline, plus 2x KV
  capacity; see tools/exp_int4_unpack.py for the variants measured).

* rule-based masking in the paged layout (the reference's policy engine
  carried into serving): ``rule`` may be a ``LocalRule(window_size,
  log2_stride_size, is_causal)`` — pages entirely below the oldest query
  row's strided window are **skipped before any load** (a per-slot
  first-live-page scalar shifts the page stream, the serving analog of the
  training kernels' skip-before-load schedule), and the window/stride
  predicate is applied per element in-kernel.  Decode always enforces
  left-to-right causal ordering on top of the rule (tokens to the right of
  a query row do not exist for an autoregressive step).

Sequence lengths are runtime values (continuous batching), so skipping is
driven by prefetched per-slot page counts rather than the trace-time
schedule the training kernels use.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..block_sizes import LANE, VMEM_LIMIT, pad_to
from ..mask_rules import CausalRule, FullRule, LocalRule, MaskRule
from ..ops.kernel_common import LOG2E, NEG_INF_F32
from .kv_cache import KVCacheConfig, PagedKVCache, _unpack_nibbles


def _rule_visible(rule, q_pos, kv_pos):
    """Element predicate: may kv_pos feed the query row at q_pos?

    Left-to-right ordering (kv_pos <= q_pos) is always enforced — at a
    decode step the tokens to the right of a row do not exist yet — and a
    ``LocalRule`` adds its strided-window constraint on the distance
    (``mask_rules.LocalRule.check`` semantics on 1d token positions).
    """
    ok = kv_pos <= q_pos
    if isinstance(rule, LocalRule):
        diff = q_pos - kv_pos
        ok = jnp.logical_and(ok, (diff >> rule.log2_stride_size) < rule.window_size)
        if rule.log2_stride_size:
            ok = jnp.logical_and(ok, (diff & rule.remainder_mask) == 0)
    return ok


def _first_live_page(rule, lengths, gamma, page_size, stride=1, offset=0):
    """Per-slot LOCAL index of the first page the rule can see
    (skip-before-load).

    The oldest query row sits at GLOBAL position ``length - gamma``; a
    LocalRule cannot see kv below ``oldest - (strided_window - 1)``.  With
    sequence sharding (``stride`` = number of shards, ``offset`` = this
    shard's index) local page j holds global page ``j*stride + offset``,
    so the first live local page is the count of local pages strictly
    below the global first-live page.
    """
    if isinstance(rule, LocalRule):
        lo = jnp.maximum(0, lengths - gamma - (rule.strided_window_size - 1))
        gfp = lo // page_size
        if stride == 1:
            return gfp.astype(jnp.int32)
        local = jnp.where(gfp > offset, (gfp - offset + stride - 1) // stride, 0)
        return local.astype(jnp.int32)
    return jnp.zeros_like(lengths, jnp.int32)

__all__ = ["paged_decode_attention", "paged_multitoken_decode"]


def _decode_kernel(
    tables_ref, shard_ref, starts_ref, counts_ref, lengths_ref,  # prefetch
    q_ref, k_ref, ks_ref, v_ref, vs_ref,          # inputs
    *refs,                                        # outputs + scratch
    n_kv: int,
    page_size: int,
    max_pages: int,
    scale: float,
    quantized: bool,
    pack: int = 1,
    gamma: int = 1,
    rule: MaskRule = CausalRule(),
    return_lm: bool = False,
    page_stride: int = 1,
):
    # sequence sharding: local page j holds global page j*stride + offset
    # (shard_ref[0]); lengths_ref carries GLOBAL lengths, counts_ref the
    # LOCAL page counts — stride 1 / offset 0 is the single-shard case
    if return_lm:
        o_ref, l_ref, m_ref, acc_ref, m_scratch, l_scratch = refs
    else:
        o_ref, acc_ref, m_scratch, l_scratch = refs
        l_ref = m_ref = None
    b = pl.program_id(0)
    p = pl.program_id(1)
    page_rows = page_size // pack

    @pl.when(p == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # the page stream starts at the rule's first live page (skip-before-load)
    lp = starts_ref[b] + p
    gp = lp * page_stride + shard_ref[0]          # global page index

    @pl.when(p < counts_ref[b] - starts_ref[b])
    def _compute():
        def bounds_for(token_pos):
            if gamma == 1:
                return _rule_visible(rule, lengths_ref[b] - 1, token_pos)
            # speculative multi-token decode: row r holds draft position
            # r mod gamma at absolute position lengths - gamma + (r mod
            # gamma); it attends (rule-constrained) up to and incl. itself
            row_mod = jax.lax.broadcasted_iota(
                jnp.int32, (1, q_ref.shape[2], 1), 1) % gamma
            q_pos = lengths_ref[b] - gamma + row_mod
            return _rule_visible(rule, q_pos, token_pos)

        # all heads at once via head-batched dot_generals: one op stream per
        # page regardless of head count (decode is per-step-overhead bound)
        q = q_ref[0]                               # (n_kv, g_pad, d)
        k = k_ref[:, 0]                            # (n_kv, page_rows, d)
        v = v_ref[:, 0]
        if pack == 2:
            # int4: byte row r holds tokens 2r (low nibble) / 2r+1 (high);
            # attend to the even/odd halves as two half-page key sets
            ke, ko = _unpack_nibbles(k)
            ve, vo = _unpack_nibbles(v)
            halves = ((ke.astype(jnp.bfloat16), ve.astype(jnp.bfloat16), 0),
                      (ko.astype(jnp.bfloat16), vo.astype(jnp.bfloat16), 1))
        else:
            if quantized:
                k = k.astype(jnp.bfloat16)
                v = v.astype(jnp.bfloat16)
            halves = ((k, v, 0),)

        parts = []
        for kh, vh, nib in halves:
            s = jax.lax.dot_general(
                q.astype(kh.dtype), kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                      # (n_kv, g_pad, page_rows)
            if quantized:
                # post-scale: per-token K scales fold into the logits multiply
                s = s * (ks_ref[:, 0, nib][:, None, :] * jnp.float32(scale * LOG2E))
            else:
                s = s * jnp.float32(scale * LOG2E)
            token_pos = (gp * page_size + nib) + pack * jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, page_rows), 2)
            s = jnp.where(bounds_for(token_pos), s, NEG_INF_F32)
            parts.append((s, vh, nib))

        m_prev = m_scratch[:, :, :1]
        l_prev = l_scratch[:, :, :1]
        m_curr = parts[0][0].max(axis=2, keepdims=True)
        for s, _, _ in parts[1:]:
            m_curr = jnp.maximum(m_curr, s.max(axis=2, keepdims=True))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        # a row with no visible key yet has m_next == NEG_INF, making
        # exp2(s - m_next) == 1 on its masked entries; zero those rows
        # (LocalRule page-skipping can defer a row's first live key past
        # the first processed page — causal rows always see key 0)
        row_live = m_next > jnp.float32(NEG_INF_F32 * 0.5)
        pv = None
        l_add = None
        for s, vh, nib in parts:
            pw = jnp.where(row_live, jnp.exp2(s - m_next), 0.0)
            ps = jnp.sum(pw, axis=2, keepdims=True)
            l_add = ps if l_add is None else l_add + ps
            if quantized:
                # post-scale: per-token V scales fold into the probabilities
                pw = pw * vs_ref[:, 0, nib][:, None, :]
            contrib = jax.lax.dot_general(
                pw.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                      # (n_kv, g_pad, d)
            pv = contrib if pv is None else pv + contrib
        l_next = alpha * l_prev + l_add
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(p == max_pages - 1)
    def _finalize():
        l_col = l_scratch[:, :, :1]
        l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        if return_lm:
            # per-row softmax statistics for cross-shard merging (base-2,
            # i.e. m is in the same exp2 domain the kernel works in)
            l_ref[0] = l_scratch[...]
            m_ref[0] = m_scratch[...]


def paged_decode_attention(
    q: jax.Array,
    cache: PagedKVCache,
    cfg: KVCacheConfig,
    *,
    scale: Optional[float] = None,
    rule: MaskRule = CausalRule(),
    returning_l_m: bool = False,
    page_stride: int = 1,
    page_offset=None,
    global_lengths=None,
    interpret: Optional[bool] = None,
):
    """One decode step of attention against the paged cache.

    ``q``: (max_seqs, n_q_heads, head_dim) — the current token's queries.
    Returns ``o`` of the same shape.  Sequences with length 0 yield zeros.

    Sequence sharding (``seq_sharded_decode.py``): when the cache holds
    every ``page_stride``-th global page starting at ``page_offset``
    (a traced scalar), pass ``global_lengths`` so masking and window
    skipping run on global token positions while page counts stay local.

    ``rule``: masking rule (Full/Causal behave identically at decode —
    left-to-right ordering is always enforced; ``LocalRule`` restricts
    each query to its strided window and pages below the window are never
    loaded).

    ``returning_l_m``: also return the per-row online-softmax statistics
    ``(o, l, m)`` — each (max_seqs, n_q_heads) f32, ``m`` in the kernel's
    base-2 domain — so partial attentions over disjoint KV shards can be
    merged exactly (sequence-sharded decode; same merge contract as the
    training kernels' ``(O, l, m)`` outputs).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    max_seqs, n_q_heads, d = q.shape
    n_kv = cfg.n_kv_heads
    if n_q_heads % n_kv:
        raise ValueError(f"q heads {n_q_heads} not a multiple of kv heads {n_kv}")
    g = n_q_heads // n_kv
    g_pad = max(8, pad_to(g, 8))
    d_pad = cfg.head_dim_store
    assert cache.k_pages.shape[-1] == d_pad, (cache.k_pages.shape, d_pad)
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    qg = q.reshape(max_seqs, n_kv, g, d)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, d_pad - d)))

    glob_len = cache.lengths if global_lengths is None else global_lengths
    offset = jnp.zeros((1,), jnp.int32) if page_offset is None else (
        jnp.asarray(page_offset, jnp.int32).reshape(1))
    counts = -(-cache.lengths // cfg.page_size)
    starts = _first_live_page(rule, glob_len, 1, cfg.page_size,
                              page_stride, offset[0])
    max_pages = cfg.max_pages_per_seq
    quantized = cfg.quantized
    pack = cfg.tok_pack
    page_rows = cfg.page_rows

    def page_idx(b, p, t, sh, s, c, L):
        lp = jnp.maximum(0, jnp.minimum(s[b] + p, c[b] - 1))
        # rolling table: logical pages wrap modulo the table width
        return (0, t[b, lp % max_pages], 0, 0)

    def q_idx(b, p, t, sh, s, c, L):
        return (b, 0, 0, 0)

    kernel = functools.partial(
        _decode_kernel,
        n_kv=n_kv,
        page_size=cfg.page_size,
        max_pages=max_pages,
        scale=float(scale),
        quantized=quantized,
        pack=pack,
        rule=rule,
        return_lm=returning_l_m,
        page_stride=page_stride,
    )

    k_scales = cache.k_scales
    v_scales = cache.v_scales
    if not quantized:
        # dummy 1-page scale operands keep the kernel signature uniform
        k_scales = jnp.ones((n_kv, 1, 1, page_rows), jnp.float32)
        v_scales = k_scales

    def scales_idx(b, p, t, sh, s, c, L):
        if quantized:
            return page_idx(b, p, t, sh, s, c, L)
        return (0, 0, 0, 0)

    sc_rows = k_scales.shape[2]
    out_shape = [jax.ShapeDtypeStruct((max_seqs, n_kv, g_pad, d_pad), q.dtype)]
    out_specs = [pl.BlockSpec((1, n_kv, g_pad, d_pad), q_idx)]
    if returning_l_m:
        lm_shape = jax.ShapeDtypeStruct((max_seqs, n_kv, g_pad, LANE), jnp.float32)
        out_shape += [lm_shape, lm_shape]
        out_specs += [pl.BlockSpec((1, n_kv, g_pad, LANE), q_idx)] * 2
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(max_seqs, max_pages),
            in_specs=[
                pl.BlockSpec((1, n_kv, g_pad, d_pad), q_idx),
                pl.BlockSpec((n_kv, 1, page_rows, d_pad), page_idx),
                pl.BlockSpec((n_kv, 1, sc_rows, page_rows), scales_idx),
                pl.BlockSpec((n_kv, 1, page_rows, d_pad), page_idx),
                pl.BlockSpec((n_kv, 1, sc_rows, page_rows), scales_idx),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((n_kv, g_pad, d_pad), jnp.float32),
                pltpu.VMEM((n_kv, g_pad, LANE), jnp.float32),
                pltpu.VMEM((n_kv, g_pad, LANE), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(jnp.asarray(cache.page_tables), offset, starts, counts.astype(jnp.int32),
      glob_len.astype(jnp.int32),
      qg, cache.k_pages, k_scales, cache.v_pages, v_scales)

    o = outs[0][:, :, :g, :d].reshape(max_seqs, n_q_heads, d)
    if returning_l_m:
        l = outs[1][:, :, :g, 0].reshape(max_seqs, n_q_heads)
        m = outs[2][:, :, :g, 0].reshape(max_seqs, n_q_heads)
        return o, l, m
    return o


def paged_multitoken_decode(
    q: jax.Array,
    cache: PagedKVCache,
    cfg: KVCacheConfig,
    *,
    scale: Optional[float] = None,
    rule: MaskRule = CausalRule(),
    returning_l_m: bool = False,
    page_stride: int = 1,
    page_offset=None,
    global_lengths=None,
    interpret: Optional[bool] = None,
):
    """Speculative verification attention: ``gamma`` tokens per slot.

    ``q``: (max_seqs, gamma, n_q_heads, head_dim) — queries for the
    gamma draft tokens sitting at absolute positions
    ``lengths - gamma .. lengths`` of each slot (their K/V must already be
    appended, so ``cache.lengths`` INCLUDES the drafts).  Draft i attends
    causally through position ``lengths - gamma + i``.  Returns
    (max_seqs, gamma, n_q_heads, head_dim).

    Same kernel as single-token decode (which is the gamma=1 special
    case): the only difference is a per-row causal bound, so verification
    costs one pass of the same page stream — the basis of lossless greedy
    speculative decoding in the engine.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    max_seqs, gamma, n_q_heads, d = q.shape
    n_kv = cfg.n_kv_heads
    if n_q_heads % n_kv:
        raise ValueError(f"q heads {n_q_heads} not a multiple of kv heads {n_kv}")
    g = n_q_heads // n_kv
    rows = g * gamma
    # padding rows land on arbitrary (r mod gamma) draft positions, which
    # is harmless: softmax is per-row, every row keeps key 0 live (its
    # causal bound is >= 1), and padded outputs are sliced off below
    rows_pad = max(8, pad_to(rows, 8))
    d_pad = cfg.head_dim_store
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    # gamma-minor rows: row r = head_in_group * gamma + draft_index
    qg = q.reshape(max_seqs, gamma, n_kv, g, d)
    qg = jnp.transpose(qg, (0, 2, 3, 1, 4)).reshape(max_seqs, n_kv, rows, d)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, rows_pad - rows), (0, d_pad - d)))

    glob_len = cache.lengths if global_lengths is None else global_lengths
    offset = jnp.zeros((1,), jnp.int32) if page_offset is None else (
        jnp.asarray(page_offset, jnp.int32).reshape(1))
    counts = -(-cache.lengths // cfg.page_size)
    starts = _first_live_page(rule, glob_len, gamma, cfg.page_size,
                              page_stride, offset[0])
    max_pages = cfg.max_pages_per_seq
    quantized = cfg.quantized
    pack = cfg.tok_pack
    page_rows = cfg.page_rows

    def page_idx(b, p, t, sh, s, c, L):
        lp = jnp.maximum(0, jnp.minimum(s[b] + p, c[b] - 1))
        # rolling table: logical pages wrap modulo the table width
        return (0, t[b, lp % max_pages], 0, 0)

    def q_idx(b, p, t, sh, s, c, L):
        return (b, 0, 0, 0)

    kernel = functools.partial(
        _decode_kernel,
        n_kv=n_kv,
        page_size=cfg.page_size,
        max_pages=max_pages,
        scale=float(scale),
        quantized=quantized,
        pack=pack,
        gamma=gamma,
        rule=rule,
        return_lm=returning_l_m,
        page_stride=page_stride,
    )

    k_scales = cache.k_scales
    v_scales = cache.v_scales
    if not quantized:
        k_scales = jnp.ones((n_kv, 1, 1, page_rows), jnp.float32)
        v_scales = k_scales

    def scales_idx(b, p, t, sh, s, c, L):
        if quantized:
            return page_idx(b, p, t, sh, s, c, L)
        return (0, 0, 0, 0)

    sc_rows = k_scales.shape[2]
    out_shape = [jax.ShapeDtypeStruct((max_seqs, n_kv, rows_pad, d_pad), q.dtype)]
    out_specs = [pl.BlockSpec((1, n_kv, rows_pad, d_pad), q_idx)]
    if returning_l_m:
        lm_shape = jax.ShapeDtypeStruct((max_seqs, n_kv, rows_pad, LANE), jnp.float32)
        out_shape += [lm_shape, lm_shape]
        out_specs += [pl.BlockSpec((1, n_kv, rows_pad, LANE), q_idx)] * 2
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(max_seqs, max_pages),
            in_specs=[
                pl.BlockSpec((1, n_kv, rows_pad, d_pad), q_idx),
                pl.BlockSpec((n_kv, 1, page_rows, d_pad), page_idx),
                pl.BlockSpec((n_kv, 1, sc_rows, page_rows), scales_idx),
                pl.BlockSpec((n_kv, 1, page_rows, d_pad), page_idx),
                pl.BlockSpec((n_kv, 1, sc_rows, page_rows), scales_idx),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((n_kv, rows_pad, d_pad), jnp.float32),
                pltpu.VMEM((n_kv, rows_pad, LANE), jnp.float32),
                pltpu.VMEM((n_kv, rows_pad, LANE), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(jnp.asarray(cache.page_tables), offset, starts, counts.astype(jnp.int32),
      glob_len.astype(jnp.int32),
      qg, cache.k_pages, k_scales, cache.v_pages, v_scales)

    def rowsplit(x, dd):
        x = x[:, :, :rows].reshape(max_seqs, n_kv, g, gamma, -1)[..., :dd]
        return jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(
            max_seqs, gamma, n_q_heads, dd)

    o = rowsplit(outs[0], d)
    if returning_l_m:
        l = rowsplit(outs[1], 1)[..., 0]     # (max_seqs, gamma, n_q_heads)
        m = rowsplit(outs[2], 1)[..., 0]
        return o, l, m
    return o
