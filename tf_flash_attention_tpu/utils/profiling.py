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

__all__ = ["ChainTimer", "device_time", "device_time_samples", "Roofline", "V5E"]


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

    The carry of the measurement chain depends on EVERY output leaf —
    otherwise XLA dead-code-eliminates whole sub-computations of
    multi-output functions (e.g. the dK/dV kernel of a backward pass) and
    the measurement silently covers only part of the work.
    """
    diffs = device_time_samples(fn, args, n=n, reps=reps)
    diffs = sorted(diffs)
    return diffs[len(diffs) // 2]


class ChainTimer:
    """Reusable paired-difference device timer for one ``fn(*args)``.

    Jits a short and a long ``lax.scan`` measurement chain ONCE (a fresh
    jit per sample costs a compile-cache round-trip through the tunnel
    each time) and reuses them across calls — a benchmark can re-probe
    the same kernel across sampling windows for the cost of two
    dispatches per sample.

    Chain-length auto-scaling (round 5): the tunnel adds multi-ms
    scheduling jitter to every dispatch, so the differencing SIGNAL —
    ``(n - n_short) x t_call`` — must dominate that jitter or the
    estimate is a lottery.  BENCH_r04's int4-decode "collapse" (2.85
    ms/step vs a true ~0.3 ms) was exactly this: a 0.3 ms kernel at
    n=10 has a 2.1 ms signal, below the jitter floor, so reps collapsed
    into the ``t_l/n`` fallback (which amortises the ~25 ms RTT over 10
    calls).  The long chain is therefore re-jitted once, at
    construction, with enough iterations that the signal is at least
    ``min_signal_s`` (36 ms default ≈ 3-10x the observed jitter;
    measured per-rep spread at a 48 ms signal is ±5%), and samples
    whose paired difference is non-positive or absurd are DISCARDED and
    re-measured (up to 3x the requested count) rather than silently
    replaced with the RTT-polluted fallback.

    The carry of the measurement chain depends on EVERY output leaf —
    otherwise XLA dead-code-eliminates whole sub-computations of
    multi-output functions (e.g. the dK/dV kernel of a backward pass)
    and the measurement silently covers only part of the work.
    """

    def __init__(self, fn, args, n: int = 20, min_signal_s: float = 0.036):
        self.args = args

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

        self.n_short = max(2, n // 3)
        self.f_short = jax.jit(lambda *a: chained(a, self.n_short))
        f_long = jax.jit(lambda *a: chained(a, n))
        float(self.f_short(*args))
        t0 = time.perf_counter()
        float(self.f_short(*args))
        t_s0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_long(*args))
        t_l0 = time.perf_counter() - t0
        if min_signal_s and (t_l0 - t_s0) < min_signal_s:
            # estimate the per-call time robustly: the paired diff when
            # sane, else the long chain minus a nominal 25 ms dispatch RTT
            d0 = (t_l0 - t_s0) / (n - self.n_short)
            t_hat = max(d0, (t_l0 - 0.025) / n, 1e-6)
            n_new = min(1024, self.n_short + int(-(-min_signal_s // t_hat)))
            if n_new > n:
                n = n_new
                f_long = jax.jit(lambda *a: chained(a, n))
                float(f_long(*args))
        self.n = n
        self.f_long = f_long

    def sample(self, reps: int = 3):
        """``reps`` per-call wall-time samples (seconds), freshly measured."""
        samples = []
        attempts = 0
        t_l = None
        while len(samples) < max(1, reps) and attempts < 3 * max(1, reps):
            attempts += 1
            t0 = time.perf_counter()
            float(self.f_short(*self.args))
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(self.f_long(*self.args))
            t_l = time.perf_counter() - t0
            d = (t_l - t_s) / (self.n - self.n_short)
            if 0 < d <= t_l / self.n * 1.5:
                samples.append(d)
        if not samples:
            samples = [t_l / self.n]  # conservative last resort
        return samples


def device_time_samples(fn, args, n: int = 20, reps: int = 3,
                        min_signal_s: float = 0.036):
    """Per-rep paired-difference wall-time samples (seconds per call).

    One-shot form of ``ChainTimer`` (see its docstring for the estimator
    and the round-5 chain-length auto-scaling rationale).
    """
    return ChainTimer(fn, args, n=n, min_signal_s=min_signal_s).sample(
        reps=max(3, reps))


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
