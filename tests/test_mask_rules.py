"""Mask-rule tests.

An independent brute-force mirror of the reference's ``Vanilla*Policy``
TF mask generators (``tests/test_base.py:33-67``) — the rule semantics are
specified twice, once in the framework and once here, and the tests assert
they agree (the same double-specification strategy the reference uses).
"""

import numpy as np
import pytest

from tf_flash_attention_tpu.mask_rules import CausalRule, FullRule, LocalRule, make_rule
from tf_flash_attention_tpu.ops.reference import build_mask
from tf_flash_attention_tpu.schedule import build_schedule, sequence_orders
from tf_flash_attention_tpu.sync_modes import SYNC_MODES, make_sync_pack


def brute_force_mask(pack, *, kind, window=None, stride=1, causal=False):
    """Independent dense mask from first principles (loops over coords)."""
    q_coords, q_flat = sequence_orders(pack.q, pack.reference_shape)
    k_coords, k_flat = sequence_orders(pack.k, pack.reference_shape)
    nq, nk = q_flat.size, k_flat.size
    mask = np.zeros((nq, nk), dtype=bool)
    for i in range(nq):
        for j in range(nk):
            if kind == "full":
                ok = True
            elif kind == "causal":
                ok = q_flat[i] >= k_flat[j]
            else:  # local
                ok = True
                for d in range(pack.ndim):
                    diff = abs(int(q_coords[d, i]) - int(k_coords[d, j]))
                    if diff % stride != 0 or diff // stride >= window:
                        ok = False
                if causal and q_flat[i] < k_flat[j]:
                    ok = False
            mask[i, j] = ok
    return mask


CASES = [
    dict(kind="full"),
    dict(kind="causal"),
    dict(kind="local", window=3, stride=1, causal=False),
    dict(kind="local", window=4, stride=2, causal=False),
    dict(kind="local", window=3, stride=1, causal=True),
    dict(kind="local", window=2, stride=4, causal=True),
]


def rule_for(case):
    if case["kind"] == "local":
        return LocalRule(
            window_size=case["window"],
            log2_stride_size=int(np.log2(case["stride"])),
            is_causal=case["causal"],
        )
    return make_rule(case["kind"])


@pytest.mark.parametrize("mode", SYNC_MODES)
@pytest.mark.parametrize("case", CASES, ids=lambda c: "-".join(str(v) for v in c.values()))
@pytest.mark.parametrize("shapes", [((14,), (25,)), ((25,), (14,)), ((6, 9), (12, 5))],
                         ids=["1d-qlt", "1d-qgt", "2d"])
def test_rule_mask_matches_brute_force(mode, case, shapes):
    q_seq, k_seq = shapes
    pack = make_sync_pack(mode, q_seq, k_seq)
    rule = rule_for(case)
    got = build_mask(pack, rule).reshape(int(np.prod(q_seq)), int(np.prod(k_seq)))
    want = brute_force_mask(pack, **case)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", SYNC_MODES)
@pytest.mark.parametrize("case", CASES, ids=lambda c: "-".join(str(v) for v in c.values()))
def test_schedule_is_conservative(mode, case):
    """Every visible (q, k) element pair must live in a live tile pair."""
    q_seq, k_seq = (40,), (70,)
    pack = make_sync_pack(mode, q_seq, k_seq)
    rule = rule_for(case)
    block_q, block_kv = 16, 16
    sched = build_schedule(pack, rule, block_q, block_kv)
    mask = build_mask(pack, rule)
    nq, nk = mask.shape
    for i in range(nq):
        for j in range(nk):
            if mask[i, j]:
                assert sched.live[i // block_q, j // block_kv], (i, j)
    # table/counts consistent with live matrix
    for qi in range(sched.num_q_blocks):
        live_idx = np.flatnonzero(sched.live[qi])
        assert sched.kv_counts[qi] == live_idx.size
        np.testing.assert_array_equal(sched.kv_table[qi, : live_idx.size], live_idx)
    # transpose round-trips
    np.testing.assert_array_equal(sched.transpose().live, sched.live.T)


def test_local_rule_validation():
    with pytest.raises(ValueError):
        LocalRule(window_size=0)
    with pytest.raises(ValueError):
        LocalRule(window_size=1, log2_stride_size=31)


def test_full_rule_never_skips():
    pack = make_sync_pack("none_front", (40,), (40,))
    sched = build_schedule(pack, FullRule(), 16, 16)
    assert sched.live.all()


def test_causal_skips_upper_triangle_tiles():
    pack = make_sync_pack("none_front", (64,), (64,))
    sched = build_schedule(pack, CausalRule(), 16, 16)
    # strictly-above-diagonal tiles are dead
    for qi in range(4):
        for kj in range(4):
            assert sched.live[qi, kj] == (kj <= qi)


def test_banded_segments_routing():
    """The banded resident-KV fast path must engage exactly for schedules
    whose live sets are contiguous bands.  1d rules — causal, local,
    even strided-local (dilation spreads *elements*, but the position
    span |q-k| < w<<s stays one contiguous interval) — are all banded;
    2d local windows flatten to multiple stripes (one per window row)
    and must fall back to the table kernel."""
    from tf_flash_attention_tpu.schedule import build_schedule
    from tf_flash_attention_tpu.sync_modes import make_sync_pack

    pack = make_sync_pack("none_front", (1024,), (1024,))
    assert build_schedule(pack, CausalRule(), 128, 128).banded_segments() is not None
    assert build_schedule(pack, FullRule(), 128, 128).banded_segments() is not None
    assert build_schedule(
        pack, LocalRule(window_size=3, log2_stride_size=0, is_causal=True),
        128, 128).banded_segments() is not None
    # 1d strided-local is still one contiguous position band -> banded
    strided = build_schedule(
        pack, LocalRule(window_size=4, log2_stride_size=3, is_causal=False),
        128, 128)
    assert strided.banded_segments() is not None
    # 2d local flattens to one stripe per window row; once the row
    # stride (dim1) is wide enough that inter-stripe gaps exceed a tile,
    # the holes force the table-kernel fallback
    pack2d = make_sync_pack("none_front", (8, 1024), (8, 1024))
    twod = build_schedule(
        pack2d, LocalRule(window_size=2, log2_stride_size=0, is_causal=False),
        128, 128)
    assert twod.banded_segments() is None
    # scale modes keep contiguity
    pack2 = make_sync_pack("scale_front", (512,), (1024,))
    assert build_schedule(pack2, CausalRule(), 128, 128).banded_segments() is not None
    # segments are consistent with the table: per-row [start, end) spans
    sched = build_schedule(pack, CausalRule(), 128, 128)
    seg = sched.banded_segments()
    for r in range(sched.num_q_blocks):
        import numpy as np
        live = np.flatnonzero(sched.live[r])
        assert seg[r, 0] == live[0] and seg[r, 3] == live[-1] + 1
