"""Kernel block-size selection from the VMEM budget.

TPU analog of the reference's shared-memory-budget solver
(``DecideConfigurationForForward`` / ``DetermineConfigurationForBackward``,
``flash_attention.cu:1977-2067``; fixed ``Br`` choice at
``flash_attention.h:200``).  On TPU the constraints are:

* the lane dimension is 128, so block sizes on the kv axis (which forms the
  lane dimension of the scores tile) are multiples of 128;
* sublane granularity is 8 (fp32) / 16 (bf16), so q-axis blocks are kept at
  multiples of 128 as well for MXU efficiency;
* all live tiles (Q, double-buffered K/V, scores, fp32 accumulators) must
  fit in ~16 MB of VMEM per core; we solve against a conservative budget to
  leave the Mosaic pipeline room for double buffering.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["BlockConfig", "choose_block_config", "pad_to", "LANE", "MIN_BLOCK", "VMEM_LIMIT"]

LANE = 128
MIN_BLOCK = 128
# Conservative solver budget (bytes); real VMEM is ~16 MiB on v5e but the
# pipeline needs headroom for double-buffered input windows.
DEFAULT_VMEM_BUDGET = 10 * 1024 * 1024
# Mosaic scoped-VMEM ceiling requested for the attention kernels.  The
# default Mosaic limit is 16 MiB; v5e physically has more, and the large
# (2048x1024) score tiles need the headroom.
VMEM_LIMIT = 64 * 1024 * 1024


def pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """Static tile sizes for the forward and backward kernels.

    ``block_kv_compute`` sub-tiles the kv block inside one grid step with an
    unrolled loop, so the MXU matmul of sub-tile j+1 can overlap the VPU
    softmax chain of sub-tile j (the analog of the two-level
    ``block_k_major``/``block_k`` tiling in JAX's production flash kernels).
    ``None`` means no sub-tiling.
    """

    block_q: int
    block_kv: int
    block_q_dq: int
    block_kv_dq: int
    block_q_dkv: int
    block_kv_dkv: int
    block_kv_compute: int | None = None
    # q-axis sub-tiling: splits one grid step into independent per-sub-block
    # softmax chains, giving the scheduler freedom to overlap one sub-block's
    # matmul with another's VPU chain (no data dependence between them)
    block_q_compute: int | None = None

    def __post_init__(self):
        for name in ("block_q", "block_kv", "block_q_dq", "block_kv_dq",
                     "block_q_dkv", "block_kv_dkv"):
            v = getattr(self, name)
            if v % LANE:
                raise ValueError(f"{name}={v} must be a multiple of {LANE}")
        if self.block_kv_compute is not None:
            if self.block_kv_compute % LANE or self.block_kv % self.block_kv_compute:
                raise ValueError(
                    f"block_kv_compute={self.block_kv_compute} must be a multiple of "
                    f"{LANE} and divide block_kv={self.block_kv}")
        if self.block_q_compute is not None:
            if self.block_q_compute % LANE or self.block_q % self.block_q_compute:
                raise ValueError(
                    f"block_q_compute={self.block_q_compute} must be a multiple of "
                    f"{LANE} and divide block_q={self.block_q}")


def _fwd_vmem_bytes(bq: int, bk: int, dp: int, vdp: int, itemsize: int) -> int:
    q = bq * dp * itemsize
    kv = 2 * bk * (dp + vdp) * itemsize  # double-buffered input windows
    scores = bq * bk * 4
    acc = bq * vdp * 4
    stats = 2 * bq * LANE * 4
    out = bq * vdp * itemsize
    return q + kv + scores + acc + stats + out


def _bwd_vmem_bytes(bq: int, bk: int, dp: int, vdp: int, itemsize: int) -> int:
    # dKV kernel is the heavier one: k, v resident; q, o, do stream per step;
    # scores + p + ds in fp32; dk, dv fp32 accumulators.
    kv = bk * (dp + vdp) * itemsize
    stream = 2 * bq * (dp + 2 * vdp) * itemsize
    mats = 3 * bq * bk * 4
    accs = bk * (dp + vdp) * 4
    stats = 3 * bq * LANE * 4
    return kv + stream + mats + accs + stats


# Measured-preference frontiers from the on-chip autotune sweeps
# (tools/exp_autotune.py forward, tools/exp_bwd_tune.py backward; results
# recorded in docs/TUNING.md).  The solver walks each list in order and
# takes the first entry that fits the VMEM budget and sequence caps,
# falling back to the analytic area-maximising ladder for shapes the
# sweeps did not cover.  This closes the loop the reference's smem solver
# closes analytically (``flash_attention.cu:1977-2067``): on TPU the
# frontier is measured, not derived, because the Mosaic pipeline's
# overlap behaviour is not captured by a byte-budget model.
_FWD_PREF = [(1024, 1024), (1024, 512), (512, 512)]
_DQ_PREF = [(1024, 512), (1024, 1024), (512, 512)]
# (512, 512) first: the round-4 fused kernel's measured winner (153 vs
# 136 useful TFLOP/s at (512, 1024), tools/exp_frontier_r4.py); the
# split dK/dV kernel (GQA fallback) measured best at (512, 1024), which
# stays second for shapes where 512^2 doesn't fit.
_DKV_PREF = [(512, 512), (512, 1024), (1024, 1024)]


#: Per-block-size wall-time factors relative to the 1024-class, from the
#: round-4 on-chip full-rule (zero-waste) rows in docs/TUNING.md, with the
#: untested small sizes extrapolated from the causal rectangle sweep.
#: time ~ scheduled_flops x _BQ_FACTOR[bq] x _BK_FACTOR[bk].
_BQ_FACTOR = {2048: 1.0, 1024: 1.0, 512: 1.14, 256: 1.4, 128: 1.8}
_BK_FACTOR = {2048: 0.95, 1024: 1.0, 512: 1.05, 256: 1.2, 128: 1.5}


def _waste_aware_blocks(pack, rule, q_len, k_len, q_cap, k_cap,
                        cost_fn, d_pad, v_d_pad, itemsize, vmem_budget):
    """Schedule-aware tile choice for narrow-band rules.

    Local rules with small windows schedule a large multiple of the
    useful work at 1024-class tiles (measured 3.0x for the 2d w=8 bench
    case — the 27-33 TFLOP/s "low end" of rounds 1-3 was tile-granularity
    waste, not kernel slowness).  Candidates are ranked by
    ``scheduled_flops x measured size factors``.

    MEASURED NEGATIVE RESULT (round 4, tools/exp_frontier_r4.py): on the
    attached v5e even a 3.0x-waste case runs FASTER at (1024, 1024) than
    the 1.6x-waste (512, 512) pick (0.331 vs 0.353 ms) — per-segment
    overheads dominate when the live band per tile row is tiny, so the
    predicted win never materializes.  This pass is therefore OPT-IN
    (``FA_WASTE_AWARE=1``); the analysis stands as the root-cause record
    for the 2d local "low end" (it is pricing granularity, not kernel
    rate — the same case runs ~91 TFLOP/s in scheduled terms).
    """
    from .schedule import build_schedule

    def sched_flops(bq, bk):
        s = build_schedule(pack, rule, bq, bk)
        return bq * bk * int(s.live.sum())

    candidates = [(1024, 1024), (512, 1024), (1024, 512), (512, 512),
                  (256, 512), (512, 256), (256, 256)]
    best, best_cost, base_cost = None, None, None
    for bq, bk in candidates:
        if bq > q_cap or bk > k_cap:
            continue
        if cost_fn(bq, bk, d_pad, v_d_pad, itemsize) > vmem_budget:
            continue
        cost = sched_flops(bq, bk) * _BQ_FACTOR[bq] * _BK_FACTOR[bk]
        if base_cost is None:
            base_cost = cost  # first feasible candidate = default class
        if best_cost is None or cost < best_cost:
            best, best_cost = (bq, bk), cost
    if best is None or base_cost is None or best_cost > 0.8 * base_cost:
        return None
    return best


def choose_block_config(
    q_len: int,
    k_len: int,
    d_pad: int,
    v_d_pad: int,
    dtype,
    vmem_budget: int = DEFAULT_VMEM_BUDGET,
    pack=None,
    rule=None,
) -> BlockConfig:
    """Pick tile sizes: measured preference first, VMEM ladder fallback.

    Mirrors the role of the reference's smem solver: ``Br`` fixed by a
    hardware transaction size, ``Bc`` solved from the remaining budget
    (``flash_attention.cu:1977-2012``).  Here the measured-best frontier
    (docs/TUNING.md) is consulted first; the analytic ladder solve covers
    anything the budget or sequence caps exclude.  When ``pack``/``rule``
    are provided and the rule masks, a schedule-aware pass may choose
    smaller tiles for narrow-band rules (see ``_waste_aware_blocks``).
    """
    itemsize = jnp.dtype(dtype).itemsize
    q_cap = max(MIN_BLOCK, pad_to(min(q_len, 2048), LANE))
    k_cap = max(MIN_BLOCK, pad_to(min(k_len, 2048), LANE))

    def solve(cost_fn, pref):
        for bq, bk in pref:
            if (bq <= q_cap and bk <= k_cap
                    and cost_fn(bq, bk, d_pad, v_d_pad, itemsize) <= vmem_budget):
                return bq, bk
        best = (MIN_BLOCK, MIN_BLOCK)
        candidates = [1024, 512, 256, 128]
        for bq in candidates:
            if bq > q_cap:
                continue
            for bk in candidates:
                if bk > k_cap:
                    continue
                if cost_fn(bq, bk, d_pad, v_d_pad, itemsize) <= vmem_budget:
                    if bq * bk > best[0] * best[1] or (
                        bq * bk == best[0] * best[1] and bk > best[1]
                    ):
                        best = (bq, bk)
        return best

    fq, fk = solve(_fwd_vmem_bytes, _FWD_PREF)
    dq_q, dq_k = solve(_bwd_vmem_bytes, _DQ_PREF)
    dkv_q, dkv_k = solve(_bwd_vmem_bytes, _DKV_PREF)
    import os
    if (pack is not None and rule is not None and not rule.is_full
            and os.environ.get("FA_WASTE_AWARE")):
        waste = _waste_aware_blocks(pack, rule, q_len, k_len, q_cap, k_cap,
                                    _fwd_vmem_bytes, d_pad, v_d_pad,
                                    itemsize, vmem_budget)
        if waste is not None:
            fq, fk = waste
            dq_q, dq_k = waste
            dkv_q, dkv_k = waste[1], waste[0]
    return BlockConfig(
        block_q=fq, block_kv=fk,
        block_q_dq=dq_q, block_kv_dq=dq_k,
        block_q_dkv=dkv_q, block_kv_dkv=dkv_k,
    )
