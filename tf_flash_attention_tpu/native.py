"""ctypes bindings for the native C++ runtime (``csrc/``).

Loads ``libfa_native.so`` (building it with ``make`` on first use if a
toolchain is available) and exposes typed wrappers.  Every consumer keeps a
pure-Python fallback, so the package works without a compiler; the native
path removes the trace-time / serving-step Python cost.  Parity between the
two implementations is asserted in ``tests/test_native.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "native_tile_classes", "native_estimate_forward_flops",
           "NativeScheduler"]

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO = os.path.join(_CSRC, "libfa_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _configure(lib):
    i32 = ctypes.c_int32
    i64 = ctypes.c_int64
    p_i32 = ctypes.POINTER(i32)
    p_i64 = ctypes.POINTER(i64)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)

    lib.fa_build_tile_classes.restype = i32
    lib.fa_build_tile_classes.argtypes = [
        i32, p_i32, p_i32, p_i32, p_i32, p_i32, p_i32, p_i32,
        i32, i32, i32, i32, i32, i32, i32, i32,
        p_u8, p_u8, p_i32, p_i32,
    ]
    lib.fa_estimate_forward_flops.restype = ctypes.c_double
    lib.fa_estimate_forward_flops.argtypes = [
        p_u8, i32, i32, i64, i64, i32, i32, i32, i32, i64,
    ]
    lib.fa_sched_create.restype = ctypes.c_void_p
    lib.fa_sched_create.argtypes = [i32, i64, i32]
    lib.fa_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.fa_sched_enqueue.argtypes = [ctypes.c_void_p, i64, i64, i64]
    lib.fa_sched_enqueue_capped.argtypes = [ctypes.c_void_p, i64, i64, i64, i64]
    lib.fa_sched_queued.restype = i64
    lib.fa_sched_queued.argtypes = [ctypes.c_void_p]
    lib.fa_sched_admit.restype = i32
    lib.fa_sched_admit.argtypes = [ctypes.c_void_p, p_i64, p_i32, i32]
    lib.fa_sched_release.argtypes = [ctypes.c_void_p, i32, i64]
    lib.fa_sched_refund.argtypes = [ctypes.c_void_p, i64]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("FA_NO_NATIVE"):
            return None
        try:
            if not os.path.exists(_SO):
                subprocess.run(
                    ["make", "-s", "-C", _CSRC],
                    check=True, capture_output=True, timeout=120,
                )
            _lib = _configure(ctypes.CDLL(_SO))
        except Exception:
            _lib = None
        return _lib


def _as_i32(a):
    return np.ascontiguousarray(np.asarray(a, dtype=np.int32))


def native_tile_classes(pack, rule, block_q: int, block_kv: int):
    """Native tile classification; returns (live, partial) bool arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    from .mask_rules import CausalRule, FullRule, LocalRule
    from .sync_modes import ref_log2

    if isinstance(rule, FullRule):
        kind, window, log2s, causal = 0, 0, 0, 0
    elif isinstance(rule, CausalRule):
        kind, window, log2s, causal = 1, 0, 0, 0
    elif isinstance(rule, LocalRule):
        kind = 2
        window = rule.window_size
        log2s = rule.log2_stride_size
        causal = int(rule.is_causal)
    else:
        return None

    ndim = pack.ndim
    q_len = int(np.prod(pack.q.shape))
    k_len = int(np.prod(pack.k.shape))
    n_q = -(-q_len // block_q)
    n_k = -(-k_len // block_kv)
    live = np.zeros(n_q * n_k, dtype=np.uint8)
    partial = np.zeros(n_q * n_k, dtype=np.uint8)
    nq_out = ctypes.c_int32()
    nk_out = ctypes.c_int32()

    def p32(a):
        return _as_i32(a).ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    args = [
        ctypes.c_int32(ndim),
        p32(pack.q.shape), p32(pack.q.stride), p32(pack.q.offset),
        p32(pack.k.shape), p32(pack.k.stride), p32(pack.k.offset),
        p32(ref_log2(pack.reference_shape)),
        ctypes.c_int32(kind), ctypes.c_int32(window), ctypes.c_int32(log2s),
        ctypes.c_int32(causal),
        ctypes.c_int32(block_q), ctypes.c_int32(block_kv),
        ctypes.c_int32(int(q_len % block_q != 0)),
        ctypes.c_int32(int(k_len % block_kv != 0)),
        live.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        partial.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(nq_out), ctypes.byref(nk_out),
    ]
    # keep the temporary int32 arrays alive through the call
    holders = [_as_i32(x) for x in (
        pack.q.shape, pack.q.stride, pack.q.offset,
        pack.k.shape, pack.k.stride, pack.k.offset,
        ref_log2(pack.reference_shape))]
    args[1:8] = [h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for h in holders]
    if lib.fa_build_tile_classes(*args) != 0:
        return None
    assert nq_out.value == n_q and nk_out.value == n_k
    return (live.reshape(n_q, n_k).astype(bool),
            partial.reshape(n_q, n_k).astype(bool))


def native_estimate_forward_flops(live: np.ndarray, q_len: int, k_len: int,
                                  block_q: int, block_kv: int,
                                  d: int, v_d: int, batch: int):
    lib = get_lib()
    if lib is None:
        return None
    live_u8 = np.ascontiguousarray(live.astype(np.uint8))
    n_q, n_k = live_u8.shape
    return float(lib.fa_estimate_forward_flops(
        live_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(n_q), ctypes.c_int32(n_k),
        ctypes.c_int64(q_len), ctypes.c_int64(k_len),
        ctypes.c_int32(block_q), ctypes.c_int32(block_kv),
        ctypes.c_int32(d), ctypes.c_int32(v_d), ctypes.c_int64(batch),
    ))


class NativeScheduler:
    """ctypes wrapper over the C++ continuous-batching scheduler."""

    def __init__(self, max_seqs: int, n_pages: int, page_size: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.fa_sched_create(max_seqs, n_pages, page_size)
        self._max_seqs = max_seqs

    def enqueue(self, rid: int, prompt_len: int, max_new_tokens: int,
                pages_cap: int = -1) -> None:
        self._lib.fa_sched_enqueue_capped(
            self._h, rid, prompt_len, max_new_tokens, pages_cap)

    @property
    def queued(self) -> int:
        return int(self._lib.fa_sched_queued(self._h))

    def admit(self):
        rids = np.zeros(self._max_seqs, dtype=np.int64)
        slots = np.zeros(self._max_seqs, dtype=np.int32)
        n = self._lib.fa_sched_admit(
            self._h,
            rids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._max_seqs,
        )
        return [(int(rids[i]), int(slots[i])) for i in range(n)]

    def release(self, slot: int, pages_held: int) -> None:
        self._lib.fa_sched_release(self._h, slot, pages_held)

    def refund(self, n_pages: int) -> None:
        self._lib.fa_sched_refund(self._h, n_pages)

    def __del__(self):
        try:
            self._lib.fa_sched_destroy(self._h)
        except Exception:
            pass
