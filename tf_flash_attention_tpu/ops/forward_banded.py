"""Banded resident-KV Pallas forward kernel (round-4 fast path).

Same mathematics as ``ops/forward.py`` (online log2-domain softmax, the
reference's merge at ``flash_attention.cu:974-1035``), different schedule
structure, chosen from on-chip measurement (tools/exp_resident.py,
docs/TUNING.md round 4):

* **K/V are resident**: their BlockSpec windows cover the whole (padded)
  key sequence with a block index constant across the q axis, so Pallas
  DMAs each batch row's K/V from HBM ONCE instead of re-streaming one
  (block_kv, d) window per live (q-block, step) — a ~4x cut in K/V HBM
  traffic for the causal bench shape, directly visible when the chip's
  DMA/compute overlap degrades (the bimodal states of docs/TUNING.md).
* **The kv loop is an in-kernel ``fori_loop``**, not a grid dimension:
  the per-q-block live band ``[start, end)`` and its mask-free interior
  run ``[i0, i1)`` come from the trace-time schedule as a scalar-prefetch
  segment table, so each q block executes exactly
  ``masked prefix → interior → masked suffix`` with zero per-tile grid
  bookkeeping and no ``pl.when`` branches (measured 2-3x loss, round 4).

Eligibility (``flash_forward`` auto-routes): every schedule row's live
set must be one contiguous band with one contiguous interior run
(causal, non-strided local, full — with any sync mode); K/V must fit the
VMEM budget.  Strided-local rules and very long sequences fall back to
the table-driven kernel, which remains the behavioural spec.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..block_sizes import LANE, VMEM_LIMIT
from ..mask_rules import MaskRule
from ..sync_modes import SyncPack
from .kernel_common import (
    INV_LOG2E, NEG_INF_F32, build_tile_mask, dot_precision,
)

__all__ = ["banded_forward", "window_forward", "RESIDENT_KV_BUDGET"]

#: K+V resident-window budget (bytes).  Leaves the rest of VMEM for the
#: q/o streams, score tiles and accumulators under VMEM_LIMIT.
RESIDENT_KV_BUDGET = 40 * 1024 * 1024

STATS_LANES = 8  # must match forward.STATS_LANES (single packed stats tensor)


def _stats_lanes() -> int:
    import os
    return 8 if os.environ.get("FA_NARROW_STATS") else 128


def _bf16_scores() -> bool:
    import os
    return os.environ.get("FA_WINDOW_BF16S") == "1"


def _banded_kernel(
    *refs,
    pack: SyncPack,
    rule: MaskRule,
    q_len: int,
    k_len: int,
    q_len_padded: int,
    k_len_padded: int,
    block_kv: int,
    fast_softmax: bool,
    delta_mask: bool,
):
    if delta_mask:
        # precomputed deduped tile masks (schedule.delta_mask_table):
        # slots_ref (n_q, n_k) int32 scalar prefetch, masks_ref
        # (n_masks, block_q, block_kv) int8 resident in VMEM
        (seg_ref, slots_ref, q_ref, k_ref, v_ref, masks_ref,
         o_ref, stats_ref, acc_ref, m_scratch, l_scratch) = refs
    else:
        (seg_ref, q_ref, k_ref, v_ref,
         o_ref, stats_ref, acc_ref, m_scratch, l_scratch) = refs
    qi = pl.program_id(1)
    block_q = q_ref.shape[1]
    start = seg_ref[qi, 0]
    i0 = seg_ref[qi, 1]
    i1 = seg_ref[qi, 2]
    end = seg_ref[qi, 3]

    m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
    l_scratch[...] = jnp.zeros_like(l_scratch)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(j, carry, masked):
        col = pl.multiple_of(j * block_kv, block_kv)
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0, pl.ds(col, block_kv), :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q_ref.dtype),
        )
        if masked and delta_mask:
            # 2 VPU ops (compare + select) replace the ~9-op arithmetic
            # mask chain; bounds are baked into the precomputed tiles
            mask = masks_ref[slots_ref[qi, j]] != 0
            s = jnp.where(mask, s, NEG_INF_F32)
        elif masked:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0)
            k_pos = col + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_kv), 1)
            mask = build_tile_mask(
                pack, rule, q_pos, k_pos, q_len, k_len,
                q_len_padded, k_len_padded,
            )
            if mask is not None:
                s = jnp.where(mask, s, NEG_INF_F32)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        if fast_softmax:
            # bf16 exp2 chain; see forward.py for the error budget.
            p = jnp.exp2((s - m_next).astype(jnp.bfloat16))
            l_next = alpha * l_prev + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32)
        else:
            p = jnp.exp2(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, pl.ds(col, block_kv), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=dot_precision(v_ref.dtype),
        )
        acc_ref[...] = acc_ref[...] * alpha + pv
        return carry

    jax.lax.fori_loop(start, i0, functools.partial(body, masked=True), 0)
    jax.lax.fori_loop(i0, i1, functools.partial(body, masked=False), 0)
    jax.lax.fori_loop(i1, end, functools.partial(body, masked=True), 0)

    l_col = l_scratch[:, :1]
    m_col = m_scratch[:, :1]
    dead = m_col <= NEG_INF_F32
    l_col = jnp.where(dead, 0.0, l_col)
    l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
    o = acc_ref[...] / l_safe
    o = jnp.where(dead, 0.0, o)
    o_ref[0] = o.astype(o_ref.dtype)
    m_pub = jnp.where(dead, NEG_INF_F32, m_col * jnp.float32(INV_LOG2E))
    stats_ref[0] = jnp.concatenate(
        [l_col, m_pub,
         jnp.zeros((acc_ref.shape[0], STATS_LANES - 2), jnp.float32)],
        axis=1,
    )


def _window_kernel(
    *refs,
    W: int,
    sub_q: int,
    fast_softmax: bool,
    masked: bool,
):
    """Single-window softmax: one Q.K^T / P.V pair per q sub-block.

    No online merge at all — each sub-block's live kv set is one
    contiguous ``W``-wide window at a per-sub-block dynamic start
    (``schedule.window_band_table``), so the softmax is computed closed
    form over the whole band.  This removes both costs that capped the
    narrow-band (2d local) cases: the per-kv-step merge chain and the
    block_kv-granularity scheduling waste (docs/TUNING.md round 5).

    The grid q block carries ``rq = block_q // sub_q`` INDEPENDENT
    sub-block chains, unrolled: small sub-blocks keep the band (and so
    the scheduled area) narrow, while the larger grid step amortises
    per-step overhead and lets Mosaic overlap one sub-block's MXU
    matmuls with another's VPU softmax — measured 2x over one-window-
    per-grid-step at equal band area (tools/exp_window_sweep.py).
    """
    if masked:
        (start_ref, slot_ref, q_ref, k_ref, v_ref, masks_ref,
         o_ref, stats_ref) = refs
    else:
        (start_ref, q_ref, k_ref, v_ref, o_ref, stats_ref) = refs
    qi = pl.program_id(1)
    block_q = q_ref.shape[1]
    rq = block_q // sub_q
    for j in range(rq):
        sub = qi * rq + j
        col = pl.multiple_of(start_ref[sub], LANE)
        s = jax.lax.dot_general(
            q_ref[0, j * sub_q:(j + 1) * sub_q, :],
            k_ref[0, pl.ds(col, W), :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q_ref.dtype),
        )
        if fast_softmax and _bf16_scores():
            # experimental (FA_WINDOW_BF16S=1): run the whole mask/max/
            # subtract chain at bf16 VPU rate (2x lanes vs f32); the
            # rounding (~2^-8 relative on s and the published m) sits
            # inside the half-dtype tolerance model the bf16 exp2 chain
            # already uses.  Only reachable for 16-bit inputs.
            s = s.astype(jnp.bfloat16)
            if masked:
                mask = masks_ref[slot_ref[sub]] != 0
                s = jnp.where(mask, s, jnp.bfloat16(NEG_INF_F32))
            m16 = jnp.max(s, axis=1, keepdims=True)
            m_col = m16.astype(jnp.float32)
            # 0.5x margin: bf16 rounding of the finite -inf sentinel can
            # land on either side of the exact f32 constant
            dead = m_col <= 0.5 * NEG_INF_F32
            p = jnp.exp2(s - jnp.where(dead, jnp.bfloat16(0), m16))
            l_col = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
            m_safe = jnp.where(dead, 0.0, m_col)
        else:
            if masked:
                mask = masks_ref[slot_ref[sub]] != 0
                s = jnp.where(mask, s, NEG_INF_F32)
            m_col = jnp.max(s, axis=1, keepdims=True)
            dead = m_col <= NEG_INF_F32
            m_safe = jnp.where(dead, 0.0, m_col)
            if fast_softmax:
                p = jnp.exp2((s - m_safe).astype(jnp.bfloat16))
                l_col = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
            else:
                p = jnp.exp2(s - m_safe)
                l_col = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, pl.ds(col, W), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=dot_precision(v_ref.dtype),
        )
        l_col = jnp.where(dead, 0.0, l_col)
        l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
        o = pv / l_safe
        o = jnp.where(dead, 0.0, o)
        o_ref[0, j * sub_q:(j + 1) * sub_q, :] = o.astype(o_ref.dtype)
        m_pub = jnp.where(dead, NEG_INF_F32, m_safe * jnp.float32(INV_LOG2E))
        stats_ref[0, j * sub_q:(j + 1) * sub_q, :] = jnp.concatenate(
            [l_col, m_pub,
             jnp.zeros((sub_q, STATS_LANES - 2), jnp.float32)],
            axis=1,
        )


def window_forward(
    qp: jax.Array,       # (B, q_pad, d_pad) pre-scaled, padded
    kp: jax.Array,       # (B_kv, k_pad, d_pad) padded
    vp: jax.Array,       # (B_kv, k_pad, v_d_pad) padded
    starts: np.ndarray,  # (n_sub,) int32 lane-aligned band starts
    W: int,              # static window width (lane multiple)
    slots,               # (n_sub,) int32 mask slots, or None (no masking)
    masks,               # (n_masks, sub_q, W) int8, or None
    *,
    block_q: int,
    sub_q: int,
    fast_softmax: bool,
    cost: Optional[pl.CostEstimate],
    interpret: bool = False,
):
    """Run the single-window kernel on pre-padded/pre-scaled tensors.

    ``flash_forward`` owns padding, scaling, GQA and eligibility
    (``schedule.window_band_table``); this owns only the pallas_call.
    Returns ``(o, stats)`` in padded layout.
    """
    B, q_pad, d_pad = qp.shape
    B_kv, k_pad, v_d_pad = vp.shape
    g = B // B_kv
    n_q = q_pad // block_q
    masked = masks is not None

    kernel = functools.partial(
        _window_kernel, W=W, sub_q=sub_q, fast_softmax=fast_softmax,
        masked=masked)
    qi_map = lambda b, qi, *p: (b, qi, 0)
    kv_map = lambda b, qi, *p: (b // g, 0, 0)
    in_specs = [
        pl.BlockSpec((1, block_q, d_pad), qi_map),
        pl.BlockSpec((1, k_pad, d_pad), kv_map),
        pl.BlockSpec((1, k_pad, v_d_pad), kv_map),
    ]
    inputs = [qp, kp, vp]
    prefetch = [jnp.asarray(starts)]
    num_prefetch = 1
    if masked:
        num_prefetch = 2
        prefetch.append(jnp.asarray(slots))
        in_specs.append(pl.BlockSpec(
            (masks.shape[0], sub_q, W), lambda b, qi, *p: (0, 0, 0)))
        inputs.append(jnp.asarray(masks))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(B, n_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, v_d_pad), qi_map),
            pl.BlockSpec((1, block_q, STATS_LANES), qi_map),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, q_pad, v_d_pad), qp.dtype),
            jax.ShapeDtypeStruct((B, q_pad, STATS_LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*prefetch, *inputs)


def _resident_kernel(
    *refs,
    pack: SyncPack,
    rule: MaskRule,
    q_len: int,
    k_len: int,
    q_len_padded: int,
    k_len_padded: int,
    block_q: int,
    block_kv: int,
    fast_softmax: bool,
    delta_mask: bool,
):
    """Fully-resident forward: whole Q/K/V/O batch rows in VMEM.

    The grid is (B,) only; an in-kernel ``fori_loop`` walks the q
    blocks, each running the banded [start, end) kv segment walk of
    ``_banded_kernel``.  All HBM traffic is one contiguous DMA per
    operand per batch row — the shape the degraded chip state does not
    penalise (measured on the banded fused backward: ~233 TFLOP/s
    scheduled in windows where HBM-streaming kernels lose 30%,
    docs/TUNING.md round 5).
    """
    if delta_mask:
        (seg_ref, slots_ref, q_ref, k_ref, v_ref, masks_ref,
         o_ref, stats_ref, acc_ref, m_scratch, l_scratch) = refs
    else:
        (seg_ref, q_ref, k_ref, v_ref,
         o_ref, stats_ref, acc_ref, m_scratch, l_scratch) = refs
    n_q = q_len_padded // block_q

    def qblock(qi, carry):
        row = pl.multiple_of(qi * block_q, block_q)
        q_blk = q_ref[0, pl.ds(row, block_q), :]
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(j, carry, masked):
            col = pl.multiple_of(j * block_kv, block_kv)
            s = jax.lax.dot_general(
                q_blk, k_ref[0, pl.ds(col, block_kv), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q_ref.dtype),
            )
            if masked and delta_mask:
                mask = masks_ref[slots_ref[qi, j]] != 0
                s = jnp.where(mask, s, NEG_INF_F32)
            elif masked:
                q_pos = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0)
                k_pos = col + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_kv), 1)
                mask = build_tile_mask(
                    pack, rule, q_pos, k_pos, q_len, k_len,
                    q_len_padded, k_len_padded,
                )
                if mask is not None:
                    s = jnp.where(mask, s, NEG_INF_F32)
            m_prev = m_scratch[:, :1]
            l_prev = l_scratch[:, :1]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            if fast_softmax:
                p = jnp.exp2((s - m_next).astype(jnp.bfloat16))
                l_next = alpha * l_prev + jnp.sum(
                    p, axis=1, keepdims=True, dtype=jnp.float32)
            else:
                p = jnp.exp2(s - m_next)
                l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
            l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, pl.ds(col, block_kv), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(v_ref.dtype),
            )
            acc_ref[...] = acc_ref[...] * alpha + pv
            return carry

        start = seg_ref[qi, 0]
        i0 = seg_ref[qi, 1]
        i1 = seg_ref[qi, 2]
        end = seg_ref[qi, 3]
        jax.lax.fori_loop(start, i0, functools.partial(body, masked=True), 0)
        jax.lax.fori_loop(i0, i1, functools.partial(body, masked=False), 0)
        jax.lax.fori_loop(i1, end, functools.partial(body, masked=True), 0)

        l_col = l_scratch[:, :1]
        m_col = m_scratch[:, :1]
        dead = m_col <= NEG_INF_F32
        l_col = jnp.where(dead, 0.0, l_col)
        l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
        o = acc_ref[...] / l_safe
        o = jnp.where(dead, 0.0, o)
        o_ref[0, pl.ds(row, block_q), :] = o.astype(o_ref.dtype)
        m_pub = jnp.where(dead, NEG_INF_F32, m_col * jnp.float32(INV_LOG2E))
        stats_ref[0, pl.ds(row, block_q), :] = jnp.concatenate(
            [l_col, m_pub,
             jnp.zeros((block_q, STATS_LANES - 2), jnp.float32)],
            axis=1,
        )
        return carry

    jax.lax.fori_loop(0, n_q, qblock, 0)


def resident_forward(
    qp: jax.Array,       # (B, q_pad, d_pad) pre-scaled, padded
    kp: jax.Array,       # (B_kv, k_pad, d_pad) padded
    vp: jax.Array,       # (B_kv, k_pad, v_d_pad) padded
    seg: np.ndarray,     # (n_q, 4) int32 band segments
    *,
    pack: SyncPack,
    rule: MaskRule,
    q_len: int,
    k_len: int,
    block_q: int,
    block_kv: int,
    fast_softmax: bool,
    cost: Optional[pl.CostEstimate],
    interpret: bool = False,
    delta=None,
):
    """Run the fully-resident kernel on pre-padded/pre-scaled tensors.

    Same contract as ``banded_forward``; grid is (B,) with whole-row
    operand windows.
    """
    B, q_pad, d_pad = qp.shape
    B_kv, k_pad, v_d_pad = vp.shape
    g = B // B_kv

    kernel = functools.partial(
        _resident_kernel,
        pack=pack, rule=rule, q_len=q_len, k_len=k_len,
        q_len_padded=q_pad, k_len_padded=k_pad,
        block_q=block_q, block_kv=block_kv, fast_softmax=fast_softmax,
        delta_mask=delta is not None,
    )
    row_map = lambda b, *p: (b, 0, 0)
    kv_map = lambda b, *p: (b // g, 0, 0)
    in_specs = [
        pl.BlockSpec((1, q_pad, d_pad), row_map),
        pl.BlockSpec((1, k_pad, d_pad), kv_map),
        pl.BlockSpec((1, k_pad, v_d_pad), kv_map),
    ]
    inputs = [qp, kp, vp]
    num_prefetch = 1
    prefetch = [jnp.asarray(seg)]
    if delta is not None:
        slots, masks = delta
        num_prefetch = 2
        prefetch.append(jnp.asarray(slots))
        in_specs.append(pl.BlockSpec(
            (masks.shape[0], block_q, block_kv), lambda b, *p: (0, 0, 0)))
        inputs.append(jnp.asarray(masks))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(B,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, q_pad, v_d_pad), row_map),
            pl.BlockSpec((1, q_pad, STATS_LANES), row_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, v_d_pad), jnp.float32),
            pltpu.VMEM((block_q, _stats_lanes()), jnp.float32),
            pltpu.VMEM((block_q, _stats_lanes()), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, q_pad, v_d_pad), qp.dtype),
            jax.ShapeDtypeStruct((B, q_pad, STATS_LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*prefetch, *inputs)


def banded_forward(
    qp: jax.Array,       # (B, q_pad, d_pad) pre-scaled, padded
    kp: jax.Array,       # (B_kv, k_pad, d_pad) padded
    vp: jax.Array,       # (B_kv, k_pad, v_d_pad) padded
    seg: np.ndarray,     # (n_q, 4) int32 band segments
    *,
    pack: SyncPack,
    rule: MaskRule,
    q_len: int,
    k_len: int,
    block_q: int,
    block_kv: int,
    fast_softmax: bool,
    cost: Optional[pl.CostEstimate],
    interpret: bool = False,
    delta=None,
):
    """Run the banded kernel on pre-padded/pre-scaled tensors.

    ``flash_forward`` owns padding, scaling, GQA setup and eligibility;
    this function owns only the pallas_call.  Returns ``(o, stats)`` in
    padded layout.  ``delta`` is an optional ``(slots, masks)`` pair from
    ``schedule.delta_mask_table``: precomputed deduped tile masks kept
    resident in VMEM, replacing per-tile mask arithmetic.
    """
    B, q_pad, d_pad = qp.shape
    B_kv, k_pad, v_d_pad = vp.shape
    g = B // B_kv
    n_q = q_pad // block_q

    kernel = functools.partial(
        _banded_kernel,
        pack=pack, rule=rule, q_len=q_len, k_len=k_len,
        q_len_padded=q_pad, k_len_padded=k_pad,
        block_kv=block_kv, fast_softmax=fast_softmax,
        delta_mask=delta is not None,
    )
    qi_map = lambda b, qi, *p: (b, qi, 0)
    kv_map = lambda b, qi, *p: (b // g, 0, 0)
    in_specs = [
        pl.BlockSpec((1, block_q, d_pad), qi_map),
        pl.BlockSpec((1, k_pad, d_pad), kv_map),
        pl.BlockSpec((1, k_pad, v_d_pad), kv_map),
    ]
    inputs = [qp, kp, vp]
    num_prefetch = 1
    prefetch = [jnp.asarray(seg)]
    if delta is not None:
        slots, masks = delta
        num_prefetch = 2
        prefetch.append(jnp.asarray(slots))
        in_specs.append(pl.BlockSpec(
            (masks.shape[0], block_q, block_kv), lambda b, qi, *p: (0, 0, 0)))
        inputs.append(jnp.asarray(masks))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(B, n_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, v_d_pad), qi_map),
            pl.BlockSpec((1, block_q, STATS_LANES), qi_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, v_d_pad), jnp.float32),
            # FA_NARROW_STATS=1: 8-lane m/l scratch (experimental knob —
            # cuts the per-step broadcast stores 16x; measured via
            # tools/exp_frontier_r4.py before being made default).
            pltpu.VMEM((block_q, _stats_lanes()), jnp.float32),
            pltpu.VMEM((block_q, _stats_lanes()), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, q_pad, v_d_pad), qp.dtype),
            jax.ShapeDtypeStruct((B, q_pad, STATS_LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*prefetch, *inputs)
