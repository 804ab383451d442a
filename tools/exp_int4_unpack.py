"""INT4 decode-kernel unpack-strategy experiment (real chip).

The packed-int4 decode kernel measured 2x SLOWER than int8 despite
streaming half the bytes — per-page compute (nibble unpack + doubled
matmuls) dominates once the DMA halves.  Variants, all in one harness so
they share grid/pipeline structure:

  int8ref  — int8 payload control (full-size pages, postscale dequant)
  s32      — int4, widen to int32 + shift-unpack, 4 bf16 dots
  bitcast  — int4, lax.bitcast to native int4 + ONE hardware s4->bf16
             convert; interleaved-lane dots (zero-stuffed q built in the
             wrapper), even/odd PV fixed up by a lane-parity select and
             de-interleaved outside the kernel
  twopage  — like s32 but 2 pages per grid step (fixed overhead amortised)
"""
import functools
import sys
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_flash_attention_tpu.block_sizes import LANE, VMEM_LIMIT
from tf_flash_attention_tpu.ops.kernel_common import LOG2E, NEG_INF_F32
from tf_flash_attention_tpu.utils.profiling import device_time

B, CTX, PAGE, N_KV, D, G = 16, 8192, 256, 8, 128, 8
PAGES = CTX // PAGE
ROWS = PAGE // 2
SCALE = 1.0 / np.sqrt(D)


def softmax_update(parts, m_scratch, l_scratch, acc_ref, vscales):
    """parts: [(s, v_h, vs_or_None)]; online update shared by variants."""
    m_prev, l_prev = m_scratch[:, :, :1], l_scratch[:, :, :1]
    m_curr = parts[0][0].max(axis=2, keepdims=True)
    for s, _, _ in parts[1:]:
        m_curr = jnp.maximum(m_curr, s.max(axis=2, keepdims=True))
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    pv = l_add = None
    for s, vh, vsc in parts:
        pw = jnp.exp2(s - m_next)
        ps = jnp.sum(pw, axis=2, keepdims=True)
        l_add = ps if l_add is None else l_add + ps
        if vsc is not None:
            pw = pw * vsc
        c = jax.lax.dot_general(pw.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        pv = c if pv is None else pv + c
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next := alpha * l_prev + l_add,
                                      l_scratch.shape)
    del l_next
    acc_ref[...] = acc_ref[...] * alpha + pv
    return alpha, pv


def fin(o_ref, acc_ref, l_scratch):
    l_col = l_scratch[:, :, :1]
    l_safe = jnp.where(l_col == 0.0, 1.0, l_col)
    o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


def kern_int8ref(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                 acc_ref, m_scratch, l_scratch):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[:, 0].astype(jnp.bfloat16)
    v = v_ref[:, 0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * (ks_ref[:, 0] * jnp.float32(SCALE * LOG2E))
    softmax_update([(s, v, vs_ref[:, 0])], m_scratch, l_scratch, acc_ref, None)

    @pl.when(p == PAGES - 1)
    def _f():
        fin(o_ref, acc_ref, l_scratch)


def kern_s32(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
             acc_ref, m_scratch, l_scratch, *, npg=1):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    parts = []
    for j in range(npg):
        k = k_ref[:, j]
        v = v_ref[:, j]
        ki, vi = k.astype(jnp.int32), v.astype(jnp.int32)
        for nib, (kh, vh) in enumerate((
                ((ki << 28) >> 28, (vi << 28) >> 28), (ki >> 4, vi >> 4))):
            s = jax.lax.dot_general(
                q, kh.astype(jnp.bfloat16), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s * (ks_ref[:, j, nib][:, None, :] * jnp.float32(SCALE * LOG2E))
            parts.append((s, vh.astype(jnp.bfloat16),
                          vs_ref[:, j, nib][:, None, :]))
    softmax_update(parts, m_scratch, l_scratch, acc_ref, None)

    @pl.when(p == PAGES // npg - 1)
    def _f():
        fin(o_ref, acc_ref, l_scratch)


def kern_int8ref_npg(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                     acc_ref, m_scratch, l_scratch, *, npg=2):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    parts = []
    for j in range(npg):
        k = k_ref[:, j].astype(jnp.bfloat16)
        v = v_ref[:, j].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (ks_ref[:, j] * jnp.float32(SCALE * LOG2E))
        parts.append((s, v, vs_ref[:, j]))
    softmax_update(parts, m_scratch, l_scratch, acc_ref, None)

    @pl.when(p == PAGES // npg - 1)
    def _f():
        fin(o_ref, acc_ref, l_scratch)


def kern_bitcast(q2_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                 acc_ref, m_scratch, l_scratch):
    """q2_ref: (1, n_kv, 2, g, 2d) zero-stuffed interleaved queries.
    acc/o are (n_kv, g, 2d) interleaved; de-interleaved by the wrapper."""
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF_F32)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k4 = jax.lax.bitcast_convert_type(k_ref[:, 0], jnp.int4)  # (n_kv,rows,d,2)
    v4 = jax.lax.bitcast_convert_type(v_ref[:, 0], jnp.int4)
    kb = k4.reshape(N_KV, ROWS, 2 * D).astype(jnp.bfloat16)   # interleaved
    vb = v4.reshape(N_KV, ROWS, 2 * D).astype(jnp.bfloat16)
    parts = []
    for nib in range(2):
        qn = q2_ref[0, :, nib]                                # (n_kv, g, 2d)
        s = jax.lax.dot_general(qn, kb, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * (ks_ref[:, 0, nib][:, None, :] * jnp.float32(SCALE * LOG2E))
        parts.append((s, nib))

    m_prev, l_prev = m_scratch[:, :, :1], l_scratch[:, :, :1]
    m_curr = jnp.maximum(parts[0][0].max(axis=2, keepdims=True),
                         parts[1][0].max(axis=2, keepdims=True))
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    pvs = []
    l_add = None
    for s, nib in parts:
        pw = jnp.exp2(s - m_next)
        ps = jnp.sum(pw, axis=2, keepdims=True)
        l_add = ps if l_add is None else l_add + ps
        pw = pw * vs_ref[:, 0, nib][:, None, :]
        pvs.append(jax.lax.dot_general(
            pw.astype(jnp.bfloat16), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))            # (n_kv, g, 2d)
    lane_par = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * D), 2) % 2
    pv = jnp.where(lane_par == 0, pvs[0], pvs[1])
    m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(alpha * l_prev + l_add, l_scratch.shape)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(p == PAGES - 1)
    def _f():
        fin(o_ref, acc_ref, l_scratch)


def build():
    rng = np.random.default_rng(0)

    @jax.jit
    def setup(key):
        kv = jax.random.uniform(key, (2, N_KV, CTX, D), jnp.float32, -1, 1)

        def q4(x):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            sc = jnp.where(amax == 0, 1.0, amax / 7.0)
            q = jnp.clip(jnp.round(x / sc), -7, 7).astype(jnp.int32)
            lo, hi = q[:, 0::2] & 0xF, q[:, 1::2] & 0xF
            packed = (lo | (hi << 4)).astype(jnp.int8)
            scp = jnp.stack([sc[:, 0::2, 0], sc[:, 1::2, 0]], axis=1)
            return (packed.reshape(N_KV, PAGES, ROWS, D),
                    jnp.swapaxes(scp.reshape(N_KV, 2, PAGES, ROWS), 1, 2),
                    (q * sc).astype(jnp.float32))

        def q8(x):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            sc = jnp.where(amax == 0, 1.0, amax / 127.0)
            q = jnp.clip(jnp.round(x / sc), -127, 127).astype(jnp.int8)
            return (q.reshape(N_KV, PAGES, PAGE, D),
                    sc[..., 0].reshape(N_KV, PAGES, 1, PAGE))

        k4, ks4, kd = q4(kv[0])
        v4, vs4, vd = q4(kv[1])
        k8, ks8 = q8(kv[0])
        v8, vs8 = q8(kv[1])
        return k4, ks4, v4, vs4, kd, vd, k8, ks8, v8, vs8

    outs = setup(jax.random.PRNGKey(0))
    q = jnp.asarray(rng.uniform(-1, 1, (B, N_KV, G, D)), jnp.bfloat16)
    return q, outs


def main():
    q, (k4, ks4, v4, vs4, kd, vd, k8, ks8, v8, vs8) = build()

    # dense int4 oracle on slot 0
    qg = np.asarray(q[0], np.float32)
    s = np.einsum("hgd,htd->hgt", qg, np.asarray(kd)) / np.sqrt(D)
    p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
    ref = np.einsum("hgt,htd->hgd", p, np.asarray(vd))

    scr = lambda: [pltpu.VMEM((N_KV, G, D), jnp.float32),
                   pltpu.VMEM((N_KV, G, LANE), jnp.float32),
                   pltpu.VMEM((N_KV, G, LANE), jnp.float32)]
    cp = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"),
                              vmem_limit_bytes=VMEM_LIMIT)
    qspec = pl.BlockSpec((1, N_KV, G, D), lambda b, p: (b, 0, 0, 0))
    oshape = jax.ShapeDtypeStruct((B, N_KV, G, D), jnp.bfloat16)

    runners = {}

    runners["int8ref"] = (pl.pallas_call(
        kern_int8ref, grid=(B, PAGES),
        in_specs=[qspec,
                  pl.BlockSpec((N_KV, 1, PAGE, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, 1, PAGE), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, PAGE, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, 1, PAGE), lambda b, p: (0, p, 0, 0))],
        out_specs=qspec, out_shape=oshape, scratch_shapes=scr(),
        compiler_params=cp), (q, k8, ks8, v8, vs8), 2.0, None)

    runners["s32"] = (pl.pallas_call(
        functools.partial(kern_s32, npg=1), grid=(B, PAGES),
        in_specs=[qspec,
                  pl.BlockSpec((N_KV, 1, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, 2, ROWS), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, 2, ROWS), lambda b, p: (0, p, 0, 0))],
        out_specs=qspec, out_shape=oshape, scratch_shapes=scr(),
        compiler_params=cp), (q, k4, ks4, v4, vs4), 1.0, None)

    runners["twopage"] = (pl.pallas_call(
        functools.partial(kern_s32, npg=2), grid=(B, PAGES // 2),
        in_specs=[qspec,
                  pl.BlockSpec((N_KV, 2, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 2, 2, ROWS), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 2, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 2, 2, ROWS), lambda b, p: (0, p, 0, 0))],
        out_specs=qspec, out_shape=oshape, scratch_shapes=scr(),
        compiler_params=cp), (q, k4, ks4, v4, vs4), 1.0, None)

    runners["fourpage"] = (pl.pallas_call(
        functools.partial(kern_s32, npg=4), grid=(B, PAGES // 4),
        in_specs=[qspec,
                  pl.BlockSpec((N_KV, 4, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 4, 2, ROWS), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 4, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 4, 2, ROWS), lambda b, p: (0, p, 0, 0))],
        out_specs=qspec, out_shape=oshape, scratch_shapes=scr(),
        compiler_params=cp), (q, k4, ks4, v4, vs4), 1.0, None)

    runners["int8_2pg"] = (pl.pallas_call(
        functools.partial(kern_int8ref_npg, npg=2), grid=(B, PAGES // 2),
        in_specs=[qspec,
                  pl.BlockSpec((N_KV, 2, PAGE, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 2, 1, PAGE), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 2, PAGE, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 2, 1, PAGE), lambda b, p: (0, p, 0, 0))],
        out_specs=qspec, out_shape=oshape, scratch_shapes=scr(),
        compiler_params=cp), (q, k8, ks8, v8, vs8), 2.0, None)

    # bitcast variant: zero-stuffed interleaved queries + 2d-wide acc
    qf = q.astype(jnp.float32)                       # (B, n_kv, g, d)
    q2 = jnp.zeros((B, N_KV, 2, G, 2 * D), jnp.float32)
    q2 = q2.at[:, :, 0, :, 0::2].set(qf)             # lanes 2j   <- even tok
    q2 = q2.at[:, :, 1, :, 1::2].set(qf)             # lanes 2j+1 <- odd tok
    q2 = q2.astype(jnp.bfloat16)

    def deinterleave(o2):
        return o2[..., 0::2] + o2[..., 1::2]

    runners["bitcast"] = (pl.pallas_call(
        kern_bitcast, grid=(B, PAGES),
        in_specs=[pl.BlockSpec((1, N_KV, 2, G, 2 * D),
                               lambda b, p: (b, 0, 0, 0, 0)),
                  pl.BlockSpec((N_KV, 1, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, 2, ROWS), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, ROWS, D), lambda b, p: (0, p, 0, 0)),
                  pl.BlockSpec((N_KV, 1, 2, ROWS), lambda b, p: (0, p, 0, 0))],
        out_specs=pl.BlockSpec((1, N_KV, G, 2 * D), lambda b, p: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N_KV, G, 2 * D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((N_KV, G, 2 * D), jnp.float32),
                        pltpu.VMEM((N_KV, G, LANE), jnp.float32),
                        pltpu.VMEM((N_KV, G, LANE), jnp.float32)],
        compiler_params=cp), (q2, k4, ks4, v4, vs4), 1.0, deinterleave)

    for name, (f, args, bfac, post) in runners.items():
        try:
            g = (lambda f, post: (lambda *a: post(f(*a)) if post else f(*a)))(f, post)
            o = g(*args)
            err = np.abs(np.asarray(o[0], np.float32) - ref).max()
            t = device_time(g, args, n=20, reps=4)
            kvb = B * CTX * N_KV * D * bfac / 2 + B * CTX * N_KV * 4 * 2
            print(f"{name:8s}: {t*1e3:.3f} ms, {B/t:,.0f} tok/s, "
                  f"{kvb/t/1e9:.0f} GB/s, err={err:.2e}")
        except Exception as e:
            print(f"{name:8s}: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
