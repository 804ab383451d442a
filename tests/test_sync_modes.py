"""Sync-mode engine tests.

The expected alignments are the worked examples from the reference module
docstring (``flash_attention/flash_attention.py:28-69``) plus the
location-generator semantics the reference tests mirror in TF
(``tests/test_1d.py:9-50``, ``tests/test_2d.py:11-78``).
"""

import numpy as np
import pytest

from tf_flash_attention_tpu.sync_modes import (
    SYNC_MODES,
    flatten_orders,
    make_sync_pack,
    order_coords,
    ref_log2,
    unflatten_order,
)
from tf_flash_attention_tpu.schedule import sequence_orders


def flat_orders(pack, desc):
    return sequence_orders(desc, pack.reference_shape)[1]


class TestReferenceDocstringExamples:
    def test_1d_none_front(self):
        pack = make_sync_pack("none_front", (6,), (3,))
        assert list(flat_orders(pack, pack.q)) == [0, 1, 2, 3, 4, 5]
        assert list(flat_orders(pack, pack.k)) == [0, 1, 2]

    def test_1d_scale_front(self):
        pack = make_sync_pack("scale_front", (6,), (3,))
        assert list(flat_orders(pack, pack.k)) == [0, 2, 4]

    def test_1d_scale_end(self):
        pack = make_sync_pack("scale_end", (6,), (3,))
        assert list(flat_orders(pack, pack.k)) == [1, 3, 5]

    def test_2d_none_front(self):
        pack = make_sync_pack("none_front", (4, 4), (2, 2))
        assert list(flat_orders(pack, pack.q)) == list(range(16))
        assert list(flat_orders(pack, pack.k)) == [0, 1, 4, 5]

    def test_2d_scale_front(self):
        pack = make_sync_pack("scale_front", (4, 4), (2, 2))
        assert list(flat_orders(pack, pack.k)) == [0, 2, 8, 10]

    def test_2d_scale_end(self):
        pack = make_sync_pack("scale_end", (4, 4), (2, 2))
        assert list(flat_orders(pack, pack.k)) == [5, 7, 13, 15]


class TestPack:
    def test_reference_shape_is_next_pow2(self):
        pack = make_sync_pack("none_front", (300,), (500,))
        assert pack.reference_shape == (512,)
        pack = make_sync_pack("none_front", (256,), (256,))
        assert pack.reference_shape == (256,)
        pack = make_sync_pack("none_front", (12, 20), (24, 10))
        assert pack.reference_shape == (32, 32)

    def test_strides_match_tf_location_generators(self):
        # scale modes use max_dim // dim (integer), per tests/test_1d.py:27-48
        pack = make_sync_pack("scale_front", (8,), (20,))
        assert pack.q.stride == (20 // 8,)
        assert pack.k.stride == (1,)
        pack = make_sync_pack("scale_end", (8,), (20,))
        assert pack.q.offset == (20 // 8 - 1,)
        assert pack.k.offset == (0,)

    def test_rank_mismatch_raises(self):
        with pytest.raises(ValueError):
            make_sync_pack("none_front", (4, 4), (4,))

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            make_sync_pack("mystery", (4,), (4,))


class TestOrderCodec:
    @pytest.mark.parametrize("mode", SYNC_MODES)
    def test_flatten_unflatten_roundtrip(self, mode):
        pack = make_sync_pack(mode, (12, 20), (24, 10))
        per_dim = order_coords(pack.q)
        flat = flatten_orders(pack.reference_shape, per_dim)
        coords = unflatten_order(pack.reference_shape, flat)
        grid = np.meshgrid(*per_dim, indexing="ij")
        for d in range(2):
            np.testing.assert_array_equal(coords[d], grid[d])

    def test_flatten_is_row_major(self):
        # order == y * ref_width + x for 2d (flash_attention.h:27-41 with
        # power-of-two shifts)
        pack = make_sync_pack("none_front", (3, 5), (3, 5))
        logs = ref_log2(pack.reference_shape)
        assert logs == (2, 3)
        per_dim = order_coords(pack.q)
        flat = flatten_orders(pack.reference_shape, per_dim)
        expect = per_dim[0][:, None] * 8 + per_dim[1][None, :]
        np.testing.assert_array_equal(flat, expect)

    def test_orders_monotone_in_flattened_index(self):
        # tile min/max = first/last element relies on this
        for mode in SYNC_MODES:
            pack = make_sync_pack(mode, (12, 20), (24, 10))
            for desc in (pack.q, pack.k):
                _, flat = sequence_orders(desc, pack.reference_shape)
                assert np.all(np.diff(flat) > 0)
