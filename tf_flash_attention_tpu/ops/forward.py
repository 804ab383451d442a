"""Pallas forward flash-attention kernel.

TPU-native re-design of the reference forward CUDA kernel
(``ForwardImpl``, ``kernel/flash_attention.cu:425-1077``).  Architectural
inversion relative to the reference: the CUDA kernel is KV-outer (one thread
block per KV tile, looping over all Q tiles, serialised by a global
spinlock); on TPU the grid is Q-outer with the live-KV loop as the
innermost sequential grid dimension, carrying ``(m, l, acc)`` in VMEM
scratch — mathematically identical online-softmax merging
(``flash_attention.cu:974-1035``) with no locks, no pre-normalised global
writes (normalisation happens once, at the end of the KV loop), and
single-writer outputs.

Block skipping is compiled in: the trace-time schedule (``schedule.py``)
provides a per-q-block table of live kv blocks consumed via scalar
prefetch, so masked-out tiles are never fetched from HBM (the reference
instead tests ``IsSkipped`` per tile on device,
``flash_attention.cu:865-871``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..block_sizes import BlockConfig, LANE, pad_to
from ..mask_rules import MaskRule
from ..schedule import build_schedule
from ..sync_modes import SyncPack
from .kernel_common import NEG_INF_F32, build_tile_mask, dot_precision

__all__ = ["flash_forward"]


#: lane layout of the packed softmax-stats tensor (B, q_pad, STATS_LANES):
#: lane 0 = l (normaliser), lane 1 = m (row max); backward adds lane 2 = D.
STATS_LANES = 8


def _fwd_kernel(
    table_ref, counts_ref,          # scalar prefetch
    q_ref, k_ref, v_ref,            # inputs
    o_ref, stats_ref,               # outputs
    acc_ref, m_scratch, l_scratch,  # VMEM scratch
    *,
    pack: SyncPack,
    rule: MaskRule,
    scale: float,
    q_len: int,
    k_len: int,
    q_len_padded: int,
    k_len_padded: int,
    num_steps: int,
):
    qi = pl.program_id(1)
    step = pl.program_id(2)
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]

    @pl.when(step == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(step < counts_ref[qi])
    def _compute():
        kb = table_ref[qi, step]
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=dot_precision(q.dtype),
        )
        s = s * jnp.float32(scale)

        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        k_pos = kb * block_kv + jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1)
        mask = build_tile_mask(
            pack, rule, q_pos, k_pos, q_len, k_len, q_len_padded, k_len_padded
        )
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF_F32)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=dot_precision(v_ref.dtype),
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(step == num_steps - 1)
    def _finalize():
        l_col = l_scratch[:, :1]
        m_col = m_scratch[:, :1]
        l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        block_q = acc_ref.shape[0]
        stats_ref[0] = jnp.concatenate(
            [l_col, m_col, jnp.zeros((block_q, STATS_LANES - 2), jnp.float32)],
            axis=1,
        )


def flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    pack: SyncPack,
    rule: MaskRule,
    config: BlockConfig,
    scale: Optional[float] = None,
    interpret: bool = False,
):
    """Run the forward kernel on sequence-major tensors.

    Args:
      q: ``(B, q_len, d)``; k: ``(B, k_len, d)``; v: ``(B, k_len, v_d)``
        where ``B`` is the flattened batch (incl. heads) and the sequence
        axes are the row-major-flattened 1d/2d sequences of ``pack``.

    Returns ``(o, l, m)``: ``o: (B, q_len, v_d)``, ``l, m: (B, q_len)`` in
    float32 (the public API layer casts to the reference's output dtypes).
    """
    in_dtype = q.dtype
    B, q_len, d = q.shape
    _, k_len, v_d = v.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    block_q = min(config.block_q, pad_to(q_len, LANE))
    block_kv = min(config.block_kv, pad_to(k_len, LANE))
    q_pad = pad_to(q_len, block_q)
    k_pad = pad_to(k_len, block_kv)
    d_pad = pad_to(d, LANE)
    v_d_pad = pad_to(v_d, LANE)

    qp = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, k_pad - k_len), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, k_pad - k_len), (0, v_d_pad - v_d)))

    sched = build_schedule(pack, rule, block_q, block_kv)
    num_steps = sched.num_steps
    table = jnp.asarray(sched.kv_table)
    counts = jnp.asarray(sched.kv_counts)

    kernel = functools.partial(
        _fwd_kernel,
        pack=pack,
        rule=rule,
        scale=float(scale),
        q_len=q_len,
        k_len=k_len,
        q_len_padded=q_pad,
        k_len_padded=k_pad,
        num_steps=num_steps,
    )

    grid = (B, sched.num_q_blocks, num_steps)
    out_shapes = (
        jax.ShapeDtypeStruct((B, q_pad, v_d_pad), in_dtype),
        jax.ShapeDtypeStruct((B, q_pad, STATS_LANES), jnp.float32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, qi, s, t, c: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, qi, s, t, c: (b, t[qi, s], 0)),
            pl.BlockSpec((1, block_kv, v_d_pad), lambda b, qi, s, t, c: (b, t[qi, s], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, v_d_pad), lambda b, qi, s, t, c: (b, qi, 0)),
            pl.BlockSpec((1, block_q, STATS_LANES), lambda b, qi, s, t, c: (b, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, v_d_pad), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
        ],
    )

    o, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(table, counts, qp, kp, vp)

    return (
        o[:, :q_len, :v_d],
        stats[:, :q_len, 0],
        stats[:, :q_len, 1],
    )
