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

__all__ = ["device_time", "Roofline", "V5E"]


def device_time(fn, args, n: int = 20, reps: int = 3) -> float:
    """Seconds of device time per ``fn(*args)`` call.

    Chains ``n`` executions in one jitted dispatch via ``lax.scan`` with a
    scalar data dependency (so XLA cannot elide or reorder them), fetches
    one scalar, and differences against a single-execution dispatch to
    cancel dispatch/fetch overhead.
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

    n_short = max(2, n // 3)
    f_short = jax.jit(lambda *a: chained(a, n_short))
    f_long = jax.jit(lambda *a: chained(a, n))
    float(f_short(*args))
    float(f_long(*args))
    best_s = best_l = float("inf")
    for _ in range(max(3, reps)):
        t0 = time.perf_counter()
        float(f_short(*args))
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f_long(*args))
        best_l = min(best_l, time.perf_counter() - t0)
    # Both chains amortise dispatch/fetch; differencing removes the fixed
    # overhead.  Guard against noise-driven negative/absurd results by
    # falling back to the long chain's amortised time.
    dt = (best_l - best_s) / (n - n_short)
    if not (0 < dt <= best_l / n * 1.5):
        dt = best_l / n
    return dt


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
