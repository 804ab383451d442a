"""Dense ("vanilla") attention oracle in pure JAX.

Plays the role of the reference's two oracles at once:

* the Python test oracle (``tests/test_1d.py:69-76``, ``tests/test_2d.py:97-109``):
  dense einsum attention with an explicit boolean mask generated from the
  same rules the kernel enforces;
* the CPU naive reference of the internal C++ test
  (``kernel/internal_test.cu:136-233``).

It reproduces the *kernel's* numeric contract exactly
(``flash_attention.cu:740-745``, ``:974-1035``):

* logits are scaled by ``1/sqrt(d)`` after the matmul;
* masked logits take the finite ``neg_inf_approx`` masking value;
* numerators of masked entries are exactly zero;
* a fully-masked query row yields ``O = 0``, ``l = 0``,
  ``m = neg_inf_approx``;
* ``l`` is float32 for half-precision inputs (``flash_attention.h:181-185``).

Tensors follow the reference's channel-first layout:
``Q: batch_shape + (d, *q_seq)``, ``K: batch_shape + (d, *k_seq)``,
``V: batch_shape + (v_d, *k_seq)`` → ``O: batch_shape + (v_d, *q_seq)``,
``l, m: batch_shape + q_seq`` (``flash_attention.py:80-119``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mask_rules import MaskRule
from ..schedule import sequence_orders
from ..sync_modes import SyncPack, make_sync_pack
from ..utils.dtypes import l_dtype, neg_inf_approx

__all__ = ["build_mask", "reference_attention", "reference_attention_flat"]


def build_mask(pack: SyncPack, rule: MaskRule) -> np.ndarray:
    """Dense boolean visibility mask of shape ``q_seq + k_seq``.

    Built from the rule's element predicate over the sync pack's order
    coordinates — the NumPy twin of the in-kernel mask expression (and of
    the reference's ``Vanilla*Policy`` TF mask generators,
    ``tests/test_base.py:33-67``).  Shapes are static, so this runs once per
    compiled specialisation.
    """
    q_coords, q_flat = sequence_orders(pack.q, pack.reference_shape)
    k_coords, k_flat = sequence_orders(pack.k, pack.reference_shape)
    q_len, k_len = q_flat.shape[0], k_flat.shape[0]
    mask = rule.check(
        pack,
        [c[:, None] for c in q_coords],
        [c[None, :] for c in k_coords],
        q_flat[:, None],
        k_flat[None, :],
    )
    mask = np.broadcast_to(np.asarray(mask, dtype=bool), (q_len, k_len))
    return mask.reshape(tuple(pack.q.shape) + tuple(pack.k.shape))


def reference_attention_flat(q, k, v, mask, *, scale=None):
    """Dense masked attention on flattened sequences.

    Args:
      q: ``(..., q_len, d)``; k: ``(..., k_len, d)``; v: ``(..., k_len, v_d)``
        (sequence-major layout, i.e. already transposed from the public
        channel-first API).
      mask: broadcastable to ``(..., q_len, k_len)``; True = visible.
      scale: logit scale; defaults to ``1/sqrt(d)``.

    Returns ``(o, l, m)`` with ``o: (..., q_len, v_d)``,
    ``l: (..., q_len)`` (float32 for half inputs), ``m: (..., q_len)`` in
    the input dtype.
    """
    in_dtype = q.dtype
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    # Compute dtype: float32 for narrow inputs, float64 for float64 inputs
    # (a float32 ``preferred_element_type`` would silently *down*-cast the
    # fp64 einsum and cap the oracle at f32 precision — the reference's fp64
    # threshold is 1e-9·k, internal_test.cu:15-28).
    compute = jnp.float64 if jnp.dtype(in_dtype) == jnp.float64 else jnp.float32
    mask_value = neg_inf_approx(compute)
    s = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=compute,
        precision="highest",
    ) * compute(scale)
    s = jnp.where(mask, s, mask_value)
    m = jnp.max(s, axis=-1)
    p = jnp.where(mask, jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = jnp.einsum(
        "...qk,...kv->...qv", p, v.astype(compute),
        preferred_element_type=compute, precision="highest",
    ) / l_safe[..., None]
    return (
        o.astype(in_dtype),
        l.astype(l_dtype(in_dtype)),
        m.astype(in_dtype),
    )


def reference_attention(Q, K, V, *, rule: MaskRule, sync_mode: str = "none_front",
                        seq_dims: int = 1, returning_l_m: bool = False):
    """Channel-first dense oracle with rule-generated masking.

    Matches the public API contract of the 6 reference entry points
    (``flash_attention.py:80-370``) but computed densely; used as the
    semantic specification and test oracle for the Pallas kernels.
    """
    q_seq = tuple(Q.shape[-seq_dims:])
    k_seq = tuple(K.shape[-seq_dims:])
    d = Q.shape[-seq_dims - 1]
    v_d = V.shape[-seq_dims - 1]
    batch_shape = tuple(Q.shape[: -seq_dims - 1])

    pack = make_sync_pack(sync_mode, q_seq, k_seq)
    mask = build_mask(pack, rule)
    q_len = int(np.prod(q_seq))
    k_len = int(np.prod(k_seq))

    # channel-first -> (batch, seq, channel)
    qf = jnp.swapaxes(Q.reshape(batch_shape + (d, q_len)), -1, -2)
    kf = jnp.swapaxes(K.reshape(batch_shape + (d, k_len)), -1, -2)
    vf = jnp.swapaxes(V.reshape(batch_shape + (v_d, k_len)), -1, -2)

    o, l, m = reference_attention_flat(
        qf, kf, vf, jnp.asarray(mask.reshape(q_len, k_len))
    )

    O = jnp.swapaxes(o, -1, -2).reshape(batch_shape + (v_d,) + q_seq)
    l = l.reshape(batch_shape + q_seq)
    m = m.reshape(batch_shape + q_seq)
    return (O, l, m) if returning_l_m else O
