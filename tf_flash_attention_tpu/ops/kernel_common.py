"""Shared in-kernel helpers for the Pallas attention kernels.

The mask expression built here is the in-kernel twin of the NumPy rule
evaluation in ``reference.build_mask``: per-dimension order coordinates are
derived from global row/column positions with shift/mask arithmetic on the
power-of-two reference shape (the VPU analog of the reference's coordinate
codec, ``flash_attention.h:11-41``) and fed to ``MaskRule.check``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..mask_rules import MaskRule
from ..sync_modes import SeqDescriptor, SyncPack, ref_log2

__all__ = ["kernel_orders", "build_tile_mask", "dot_precision", "NEG_INF_F32",
           "LOG2E", "INV_LOG2E"]

from ..utils.dtypes import MASK_VALUE_F32 as NEG_INF_F32

#: The kernels run the online softmax in the log2 domain:
#: ``p = exp2(s·(scale·log2e) − m₂)``.  On the VPU ``exp`` is ``exp2`` plus a
#: hidden multiply by log2(e); folding that constant into the (already
#: required) scale multiply removes one full pass over the scores tile.
#: Public ``m`` outputs are converted back to the natural-log domain.
LOG2E = float(math.log2(math.e))
INV_LOG2E = 1.0 / LOG2E


def dot_precision(dtype):
    """MXU precision for a matmul with ``dtype`` operands.

    fp32 operands need ``HIGHEST`` (6-pass bf16 decomposition) to meet the
    reference's fp32 tolerance model (``test_base.py:205-226``); half
    dtypes run natively on the MXU, where a float32 contract-precision
    request is invalid (Mosaic rejects it).
    """
    if jnp.dtype(dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return None


def kernel_orders(desc: SeqDescriptor, logs: Tuple[int, ...], pos):
    """Order coordinates + flattened order for traced position indices.

    ``pos`` is a (broadcastable) int32 array of row-major flattened sequence
    positions; returns ``(coords, flat)`` where ``coords`` is a list of
    per-dimension order-coordinate arrays.  All arithmetic is static-shape
    int32 (divisions are by trace-time constants, so XLA lowers them to
    multiply/shift sequences).
    """
    ndim = len(desc.shape)
    shifts = [sum(logs[d + 1:]) for d in range(ndim)]
    coords = []
    rem = pos
    for d in range(ndim):
        inner = math.prod(desc.shape[d + 1:])
        idx_d = rem // inner if inner > 1 else rem
        if d + 1 < ndim:
            rem = rem - idx_d * inner
        c = idx_d * desc.stride[d] + desc.offset[d]
        coords.append(c)
    flat = coords[0] << shifts[0] if shifts[0] else coords[0]
    for d in range(1, ndim):
        flat = flat + (coords[d] << shifts[d] if shifts[d] else coords[d])
    return coords, flat


def build_tile_mask(
    pack: SyncPack,
    rule: MaskRule,
    q_pos,
    k_pos,
    q_len: int,
    k_len: int,
    q_len_padded: int,
    k_len_padded: int,
) -> Optional[jax.Array]:
    """Boolean visibility mask for a (block_q, block_kv) tile, or ``None``.

    ``q_pos``/``k_pos`` are global flattened positions as column/row int32
    arrays.  Returns ``None`` when nothing can be masked (full rule and no
    sequence padding), so callers can skip the select entirely.
    """
    mask = None
    if not rule.is_full:
        logs = ref_log2(pack.reference_shape)
        q_coords, q_flat = kernel_orders(pack.q, logs, q_pos)
        k_coords, k_flat = kernel_orders(pack.k, logs, k_pos)
        mask = rule.check(pack, q_coords, k_coords, q_flat, k_flat)
    if q_len_padded > q_len:
        bounds_q = q_pos < q_len
        mask = bounds_q if mask is None else (mask & bounds_q)
    if k_len_padded > k_len:
        bounds_k = k_pos < k_len
        mask = bounds_k if mask is None else (mask & bounds_k)
    if mask is None:
        return None
    return jnp.broadcast_to(mask, (q_pos.shape[0], k_pos.shape[1]))
