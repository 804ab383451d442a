"""Pallas backward kernels (recompute-based, lock-free).

TPU-native replacement for the reference backward CUDA kernel
(``BackwardImpl``, ``kernel/flash_attention.cu:1079-1967``).  The reference
computes dQ, dK and dV in one KV-outer kernel, accumulating dQ directly in
global memory under a per-(batch, q-block) spinlock.  On TPU the design is
split into two single-writer kernels so no cross-block accumulation (and
hence no locking) is ever needed:

* ``dQ`` kernel — q-outer grid, KV loop innermost, dQ accumulated in VMEM
  scratch;
* ``dK/dV`` kernel — kv-outer grid, Q loop innermost, dK/dV accumulated in
  VMEM scratch (this iteration order matches the reference's own outer
  loop, ``flash_attention.cu:1697-1965``).

Both kernels recompute the normalised probabilities ``P`` from
``(Q, K, l, m)`` — the stored softmax statistics — instead of storing ``P``
(the reference's approach, ``:1825-1846``), and share the precomputed
``D = rowsum(dO ∘ O)`` (``:1882-1891``), which is evaluated once as a cheap
fused XLA op.  Gradient math (``:1899-1940``):

``P = exp(scale·QKᵀ − m)/l`` (masked → 0), ``dV += Pᵀ·dO``,
``dS = P ∘ (dO·Vᵀ − D) · scale``, ``dQ += dS·K``, ``dK += dSᵀ·Q``.

Masked entries need no explicit re-select: they hold the finite
``neg_inf_approx`` so ``exp(NEG − m)`` underflows to exactly 0 for live
rows, and fully-masked / padded rows carry ``l = 0``, which the
``1/l → 0`` normaliser turns into an all-zero ``P`` row.

``(l, m, D)`` ride in one packed fp32 "stats" tensor of shape
``(B, q_pad, 8)`` (lanes 0..2) so row-aligned scalars satisfy the TPU
block-shape rules without burning a full 128-lane tensor per quantity.

Both kernels reuse the trace-time block-skip schedule (dead tiles are never
loaded) and its interior/partial tile classing (interior tiles skip mask
construction); the dK/dV kernel uses the transposed schedule.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..block_sizes import BlockConfig, LANE, VMEM_LIMIT, pad_to
from ..mask_rules import MaskRule
from ..schedule import build_schedule
from ..sync_modes import SyncPack
from .forward import STATS_LANES
from .kernel_common import (
    LOG2E, NEG_INF_F32, build_tile_mask, dot_precision,
)

__all__ = ["flash_backward"]


def _recompute_p(q, k, m2_row, l_row, mask):
    """Recompute normalised probabilities for one (bq, bk) tile.

    Same log2-domain evaluation as the forward kernel: ``q`` arrives
    pre-scaled by ``scale*log2(e)`` (folded into the small (bq, d) tile or
    into the XLA-side pad, never a per-logit-tile multiply) and ``m2_row``
    is the stored row max pre-multiplied by log2(e) (and clamped to the
    masking floor) on the XLA side.
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=dot_precision(q.dtype),
    )
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF_F32)
    p = jnp.exp2(s - m2_row)
    l_inv = jnp.where(l_row == 0.0, 0.0, 1.0 / l_row)
    return p * l_inv


def _tile_mask_or_none(masked, pack, rule, qb, kb, block_q, block_kv,
                       q_len, k_len, q_len_padded, k_len_padded):
    if not masked:
        return None
    q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    k_pos = kb * block_kv + jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
    return build_tile_mask(
        pack, rule, q_pos, k_pos, q_len, k_len, q_len_padded, k_len_padded
    )


def _dq_kernel(
    table_ref, counts_ref, needs_ref,
    q_ref, k_ref, v_ref, do_ref, stats_ref,
    dq_ref,
    dq_acc,
    *,
    pack, rule, scale, q_len, k_len, q_len_padded, k_len_padded, num_steps,
    has_interior, has_partial,
):
    qi = pl.program_id(1)
    step = pl.program_id(2)
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]

    @pl.when(step == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def update(masked: bool):
        kb = table_ref[qi, step]
        mask = _tile_mask_or_none(masked, pack, rule, qi, kb, block_q, block_kv,
                                  q_len, k_len, q_len_padded, k_len_padded)
        stats = stats_ref[0]
        l_row = stats[:, 0:1]
        m_row = stats[:, 1:2]
        delta_row = stats[:, 2:3]
        # q arrives pre-scaled by scale*log2(e) (XLA-side; it feeds only the
        # P recompute in this kernel).
        p = _recompute_p(q_ref[0], k_ref[0], m_row, l_row, mask)

        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(v_ref.dtype),
        )
        # dS's *scale factor is deferred to the fp32 accumulator finalize —
        # one (bq, d) multiply per q block instead of one (bq, bk) multiply
        # per tile.
        ds = p * (dp - delta_row)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(k_ref.dtype),
        )

    in_bounds = step < counts_ref[qi]
    if has_partial and has_interior:
        needs = needs_ref[qi, step] == 1

        @pl.when(in_bounds & needs)
        def _masked():
            update(True)

        @pl.when(in_bounds & jnp.logical_not(needs))
        def _interior():
            update(False)
    else:
        @pl.when(in_bounds)
        def _only():
            update(has_partial)

    @pl.when(step == num_steps - 1)
    def _finalize():
        dq_ref[0] = (dq_acc[...] * jnp.float32(scale)).astype(dq_ref.dtype)


def _dkv_kernel(
    table_ref, counts_ref, needs_ref,
    k_ref, v_ref, q_ref, do_ref, stats_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *,
    pack, rule, scale, q_len, k_len, q_len_padded, k_len_padded, num_steps,
    has_interior, has_partial,
):
    ki = pl.program_id(1)
    step = pl.program_id(2)
    block_kv = k_ref.shape[1]
    block_q = q_ref.shape[1]

    @pl.when(step == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def update(masked: bool):
        qb = table_ref[ki, step]
        mask = _tile_mask_or_none(masked, pack, rule, qb, ki, block_q, block_kv,
                                  q_len, k_len, q_len_padded, k_len_padded)
        stats = stats_ref[0]
        l_row = stats[:, 0:1]
        m_row = stats[:, 1:2]
        delta_row = stats[:, 2:3]
        # k arrives pre-scaled by scale*log2(e) (XLA-side; it feeds only the
        # P recompute in this kernel — dK is an output, and the dK GEMM
        # consumes unscaled q).
        p = _recompute_p(q_ref[0], k_ref[0], m_row, l_row, mask)

        # dV += Pᵀ · dO
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do_ref.dtype),
        )
        # dS = P ∘ (dO·Vᵀ − D); the *scale factor is deferred to the fp32
        # accumulator finalize (one (bk, d) multiply per kv block).
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(v_ref.dtype),
        )
        ds = p * (dp - delta_row)
        # dK += dSᵀ · Q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q_ref.dtype),
        )

    in_bounds = step < counts_ref[ki]
    if has_partial and has_interior:
        needs = needs_ref[ki, step] == 1

        @pl.when(in_bounds & needs)
        def _masked():
            update(True)

        @pl.when(in_bounds & jnp.logical_not(needs))
        def _interior():
            update(False)
    else:
        @pl.when(in_bounds)
        def _only():
            update(has_partial)

    @pl.when(step == num_steps - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[...] * jnp.float32(scale)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def flash_backward(
    q, k, v, o, l, m, do,
    *,
    pack: SyncPack,
    rule: MaskRule,
    config: BlockConfig,
    scale: Optional[float] = None,
    interpret: bool = False,
):
    """Compute ``(dQ, dK, dV)`` on sequence-major tensors.

    Input/saved-tensor contract mirrors the reference backward ops, which
    take ``(Q, K, V, O, l, m, dO)`` (``flash_attention.py:374-390``,
    ``flash_attention_backward.cc:181-344``).  ``l``/``m`` may be any float
    dtype; they are consumed in float32.
    """
    in_dtype = q.dtype
    if (in_dtype == jnp.float16 and not interpret) or jnp.dtype(in_dtype).itemsize == 1:
        # Mosaic has no native f16/fp8 MXU path; compute in bf16 (see forward).
        b16 = lambda x: x.astype(jnp.bfloat16)
        dq, dk, dv = flash_backward(
            b16(q), b16(k), b16(v), b16(o), l, m, b16(do),
            pack=pack, rule=rule, config=config, scale=scale,
            interpret=interpret)
        return (dq.astype(in_dtype), dk.astype(in_dtype),
                dv.astype(in_dtype))
    B, q_len, d = q.shape
    _, k_len, v_d = v.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    scale = float(scale)

    d_pad = pad_to(d, LANE)
    v_d_pad = pad_to(v_d, LANE)

    # D = rowsum(dO ∘ O): one fused elementwise+reduce XLA op, shared by
    # both kernels (the reference computes it per-tile on device, :1882-1891).
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    # m is stored/published in the natural-log domain; the kernels work in
    # the log2 domain, so pre-multiply by log2(e) here.  The clamp keeps
    # fully-masked rows at the masking floor (m·log2e would otherwise fall
    # below NEG_INF_F32 and turn exp2(NEG - m2) into +inf).
    m2 = jnp.maximum(m.astype(jnp.float32) * jnp.float32(LOG2E),
                     jnp.float32(NEG_INF_F32))
    stats = jnp.stack([l.astype(jnp.float32), m2, delta], axis=-1)
    stats = jnp.pad(stats, ((0, 0), (0, 0), (0, STATS_LANES - 3)))

    def padded(x, seq_to, feat_to=None, prescale=False):
        if prescale:
            # Fold scale*log2(e) into the tensor feeding the P-recompute
            # matmul (q for the dQ kernel, k for the dK/dV kernel): one
            # fused XLA pass, mirroring the forward kernel's prescaled Q.
            x = (x.astype(jnp.float32)
                 * jnp.float32(scale * LOG2E)).astype(x.dtype)
        pads = [(0, 0), (0, seq_to - x.shape[1])]
        pads.append((0, (feat_to - x.shape[2]) if feat_to else 0))
        return jnp.pad(x, pads)

    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=VMEM_LIMIT,
    )

    # ---- dQ kernel ----
    block_q = min(config.block_q_dq, pad_to(q_len, LANE))
    block_kv = min(config.block_kv_dq, pad_to(k_len, LANE))
    q_pad_len = pad_to(q_len, block_q)
    k_pad_len = pad_to(k_len, block_kv)
    sched = build_schedule(pack, rule, block_q, block_kv)

    dq_kernel = functools.partial(
        _dq_kernel, pack=pack, rule=rule, scale=scale,
        q_len=q_len, k_len=k_len,
        q_len_padded=q_pad_len, k_len_padded=k_pad_len,
        num_steps=sched.num_steps,
        has_interior=bool((sched.live & ~sched.partial).any()),
        has_partial=bool(sched.partial.any()),
    )
    qi_spec = lambda b, qi, s, t, c, n: (b, qi, 0)
    kv_spec = lambda b, qi, s, t, c, n: (b, t[qi, s], 0)
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, sched.num_q_blocks, sched.num_steps),
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), qi_spec),
                pl.BlockSpec((1, block_kv, d_pad), kv_spec),
                pl.BlockSpec((1, block_kv, v_d_pad), kv_spec),
                pl.BlockSpec((1, block_q, v_d_pad), qi_spec),
                pl.BlockSpec((1, block_q, STATS_LANES), qi_spec),
            ],
            out_specs=[pl.BlockSpec((1, block_q, d_pad), qi_spec)],
            scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, q_pad_len, d_pad), in_dtype)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(jnp.asarray(sched.kv_table), jnp.asarray(sched.kv_counts),
      jnp.asarray(sched.needs_mask),
      padded(q, q_pad_len, d_pad, prescale=True), padded(k, k_pad_len, d_pad),
      padded(v, k_pad_len, v_d_pad), padded(do, q_pad_len, v_d_pad),
      padded(stats, q_pad_len))[0]

    # ---- dK/dV kernel ----
    block_q2 = min(config.block_q_dkv, pad_to(q_len, LANE))
    block_kv2 = min(config.block_kv_dkv, pad_to(k_len, LANE))
    q_pad2 = pad_to(q_len, block_q2)
    k_pad2 = pad_to(k_len, block_kv2)
    sched_t = build_schedule(pack, rule, block_q2, block_kv2).transpose()

    dkv_kernel = functools.partial(
        _dkv_kernel, pack=pack, rule=rule, scale=scale,
        q_len=q_len, k_len=k_len,
        q_len_padded=q_pad2, k_len_padded=k_pad2,
        num_steps=sched_t.num_steps,
        has_interior=bool((sched_t.live & ~sched_t.partial).any()),
        has_partial=bool(sched_t.partial.any()),
    )
    ki_spec = lambda b, ki, s, t, c, n: (b, ki, 0)
    qb_spec = lambda b, ki, s, t, c, n: (b, t[ki, s], 0)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, sched_t.num_q_blocks, sched_t.num_steps),
            in_specs=[
                pl.BlockSpec((1, block_kv2, d_pad), ki_spec),
                pl.BlockSpec((1, block_kv2, v_d_pad), ki_spec),
                pl.BlockSpec((1, block_q2, d_pad), qb_spec),
                pl.BlockSpec((1, block_q2, v_d_pad), qb_spec),
                pl.BlockSpec((1, block_q2, STATS_LANES), qb_spec),
            ],
            out_specs=[
                pl.BlockSpec((1, block_kv2, d_pad), ki_spec),
                pl.BlockSpec((1, block_kv2, v_d_pad), ki_spec),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv2, d_pad), jnp.float32),
                pltpu.VMEM((block_kv2, v_d_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, k_pad2, d_pad), in_dtype),
            jax.ShapeDtypeStruct((B, k_pad2, v_d_pad), in_dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(jnp.asarray(sched_t.kv_table), jnp.asarray(sched_t.kv_counts),
      jnp.asarray(sched_t.needs_mask),
      padded(k, k_pad2, d_pad, prescale=True), padded(v, k_pad2, v_d_pad),
      padded(q, q_pad2, d_pad), padded(do, q_pad2, v_d_pad),
      padded(stats, q_pad2))

    return (
        dq[:, :q_len, :d],
        dk[:, :k_len, :d],
        dv[:, :k_len, :v_d],
    )
