"""Native (C++) runtime parity tests.

The ctypes-bound components in ``csrc/fa_native.cc`` must agree exactly
with their pure-Python behavioural specs: tile classification (schedule
builder), the analytic FLOPs estimator, and the continuous-batching
scheduler.
"""

import numpy as np
import pytest

from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule, LocalRule
from tf_flash_attention_tpu.native import (
    NativeScheduler,
    get_lib,
    native_estimate_forward_flops,
    native_tile_classes,
)
from tf_flash_attention_tpu.schedule import _tile_classes_python
from tf_flash_attention_tpu.sync_modes import SYNC_MODES, make_sync_pack

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")

RULES = [
    FullRule(),
    CausalRule(),
    LocalRule(window_size=7),
    LocalRule(window_size=5, log2_stride_size=2),
    LocalRule(window_size=7, is_causal=True),
    LocalRule(window_size=3, log2_stride_size=1, is_causal=True),
]


@pytest.mark.parametrize("mode", SYNC_MODES)
@pytest.mark.parametrize("rule", RULES, ids=lambda r: repr(r)[:30])
@pytest.mark.parametrize("shapes", [((220,), (310,)), ((10, 22), (20, 11))],
                         ids=["1d", "2d"])
def test_tile_classes_match_python(mode, rule, shapes):
    pack = make_sync_pack(mode, *shapes)
    got = native_tile_classes(pack, rule, 16, 16)
    assert got is not None
    live_n, partial_n = got
    live_p, partial_p = _tile_classes_python(pack, rule, 16, 16)
    np.testing.assert_array_equal(live_n, live_p)
    np.testing.assert_array_equal(partial_n, partial_p)


def test_flops_estimator_matches_python():
    from tf_flash_attention_tpu.flops import estimate_forward_flops
    from tf_flash_attention_tpu.schedule import build_schedule

    pack = make_sync_pack("none_front", (300,), (500,))
    rule = CausalRule()
    sched = build_schedule(pack, rule, 128, 128)
    got = native_estimate_forward_flops(sched.live, 300, 500, 128, 128, 32, 16, 4)
    want = estimate_forward_flops(rule, "none_front", (300,), (500,), 32, 16, 4,
                                  block_q=128, block_kv=128)
    assert got == pytest.approx(want, rel=1e-12)


def test_native_scheduler_matches_python():
    from tf_flash_attention_tpu.serving.scheduler import Request, Scheduler

    py = Scheduler(max_seqs=3, n_pages=10, page_size=64)
    nat = NativeScheduler(max_seqs=3, n_pages=10, page_size=64)

    reqs = [(0, 100, 28), (1, 64, 0), (2, 600, 40), (3, 10, 10)]
    for rid, plen, mnew in reqs:
        py.enqueue(Request(rid, plen, mnew))
        nat.enqueue(rid, plen, mnew)

    py_admitted = [(r.rid, s) for r, s in py.admit()]
    nat_admitted = nat.admit()
    assert py_admitted == nat_admitted
    assert py.queued == nat.queued

    # release and admit again: both must unblock the same way
    for rid, slot in py_admitted:
        pages = -(-(dict((r, p + m) for r, p, m in reqs)[rid]) // 64)
        py.release(slot, pages)
        nat.release(slot, pages)
    assert [(r.rid, s) for r, s in py.admit()] == nat.admit()


def test_native_scheduler_refund_matches_python():
    """Early budget refunds (sliding-window eviction) unblock admission in
    both implementations identically."""
    from tf_flash_attention_tpu.serving.scheduler import Request, Scheduler

    py = Scheduler(max_seqs=2, n_pages=4, page_size=64)
    nat = NativeScheduler(max_seqs=2, n_pages=4, page_size=64)
    for rid, plen, mnew in ((0, 128, 64), (1, 64, 64)):  # 3 + 2 pages
        py.enqueue(Request(rid, plen, mnew))
        nat.enqueue(rid, plen, mnew)
    assert [(r.rid, s) for r, s in py.admit()] == nat.admit() != []
    # rid 1 blocked on budget (needs 2, only 1 left); refund 1 page
    assert py.admit() == [] and nat.admit() == []
    py.refund(1)
    nat.refund(1)
    assert [(r.rid, s) for r, s in py.admit()] == nat.admit() != []
