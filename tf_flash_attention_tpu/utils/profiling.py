"""Benchmark timing + roofline accounting.

Plays the role of the reference's measurement machinery: the CUDA-event
stopwatch (``internal_test.cu:31-66``) and the TF benchmark harness
(``tests/test_base.py:229-305``), adapted to remote-TPU reality:

* ``device_time`` — pure device time per call, measured by scan-chaining N
  executions inside ONE dispatch (host-side timing through the tunnelled
  runtime is polluted by ~30 ms RTT per fetch and non-blocking
  ``block_until_ready``).
* ``Roofline`` — analytic per-chip limits.  v5e: 197 bf16 TFLOP/s MXU,
  ~819 GB/s HBM.  For flash attention the per-element softmax chain
  (scale·select·max·sub·exp2·sum·cast ≈ 6 VPU ops at fp32) executes
  serially with the MXU within a grid step, so the practical ceiling is
  ``T_mxu + T_vpu``, not ``max``; both models are reported.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp

__all__ = ["device_time", "device_time_samples", "Roofline", "V5E"]


def device_time(fn, args, n: int = 20, reps: int = 3) -> float:
    """Seconds of device time per ``fn(*args)`` call.

    Chains ``n`` executions in one jitted dispatch via ``lax.scan`` with a
    scalar data dependency (so XLA cannot elide or reorder them), fetches
    one scalar, and differences against a shorter chain dispatched
    back-to-back to cancel dispatch/fetch overhead.

    Estimator (hardened in round 4): the tunnelled runtime adds ~30 ms of
    RTT plus multi-millisecond scheduling jitter to every dispatch, and
    the chip itself is bimodal (docs/TUNING.md).  Differencing two
    *independent minima* under that noise occasionally produced
    physically impossible readings (a "0.13 ms" forward implying 165% of
    the raw bf16 MXU peak, BENCH probes rounds 3-4).  Now each rep times
    the short and long chain back-to-back — seconds apart, so both see
    the same chip state — forms a per-rep paired difference, and the
    estimate is the MEDIAN of the per-rep differences (robust to a
    single rep straddling a state flip or catching a jitter spike).
    Reps whose paired difference is non-positive or absurd are discarded.
    """

    def chained(args, length):
        def body(carry, _):
            perturbed = (args[0] * (1.0 + carry * 1e-30)).astype(args[0].dtype)
            out = fn(*((perturbed,) + tuple(args[1:])))
            # The carry must depend on EVERY output leaf — otherwise XLA
            # dead-code-eliminates whole sub-computations of multi-output
            # functions (e.g. the dK/dV kernel of a backward pass) and the
            # measurement silently covers only part of the work.
            leaves = jax.tree_util.tree_leaves(out)
            acc = jnp.float32(0)
            for leaf in leaves:
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
            return acc, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return c

    diffs = device_time_samples(fn, args, n=n, reps=reps)
    diffs = sorted(diffs)
    return diffs[len(diffs) // 2]


def device_time_samples(fn, args, n: int = 20, reps: int = 3):
    """Per-rep paired-difference wall-time samples (seconds per call).

    Jits the short/long measurement chains ONCE and reuses them across
    reps (a fresh jit per sample costs a compile-cache round-trip through
    the tunnel each time).  Returns one paired difference per rep; reps
    whose difference is non-positive or absurd are replaced by the long
    chain's amortised upper bound (conservative, never flattering).
    """

    def chained(args, length):
        def body(carry, _):
            perturbed = (args[0] * (1.0 + carry * 1e-30)).astype(args[0].dtype)
            out = fn(*((perturbed,) + tuple(args[1:])))
            leaves = jax.tree_util.tree_leaves(out)
            acc = jnp.float32(0)
            for leaf in leaves:
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
            return acc, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
        return c

    n_short = max(2, n // 3)
    f_short = jax.jit(lambda *a: chained(a, n_short))
    f_long = jax.jit(lambda *a: chained(a, n))
    float(f_short(*args))
    float(f_long(*args))
    samples = []
    for _ in range(max(3, reps)):
        t0 = time.perf_counter()
        float(f_short(*args))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_long(*args))
        t_l = time.perf_counter() - t0
        d = (t_l - t_s) / (n - n_short)
        samples.append(d if 0 < d <= t_l / n * 1.5 else t_l / n)
    return samples


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Per-chip peak rates for roofline accounting."""

    name: str
    mxu_bf16_flops: float   # FLOP/s
    mxu_fp32_flops: float   # FLOP/s (6-pass decomposition)
    vpu_ops: float          # fp32 elementwise op/s
    hbm_bytes: float        # bytes/s

    def attention_time(self, matmul_flops: float, softmax_elems: float,
                       hbm_bytes: float, dtype=jnp.bfloat16,
                       vpu_ops_per_elem: float = 6.0):
        """(T_mxu, T_vpu, T_hbm) for one attention pass."""
        mxu = self.mxu_bf16_flops if jnp.dtype(dtype).itemsize == 2 else self.mxu_fp32_flops
        return (
            matmul_flops / mxu,
            softmax_elems * vpu_ops_per_elem / self.vpu_ops,
            hbm_bytes / self.hbm_bytes,
        )

    def attention_ceiling_serial(self, *args, **kwargs) -> float:
        """Practical ceiling: MXU and VPU serialised within a grid step."""
        t_mxu, t_vpu, t_hbm = self.attention_time(*args, **kwargs)
        return max(t_mxu + t_vpu, t_hbm)

    def attention_ceiling_overlap(self, *args, **kwargs) -> float:
        """Ideal ceiling: perfect MXU/VPU/DMA overlap."""
        return max(self.attention_time(*args, **kwargs))


# TPU v5e (v5 lite): 197 bf16 TFLOP/s, ~819 GB/s HBM BW, VPU ~4 Tops/s fp32.
V5E = Roofline(
    name="v5e",
    mxu_bf16_flops=197e12,
    mxu_fp32_flops=197e12 / 6,
    vpu_ops=3.9e12,
    hbm_bytes=819e9,
)
