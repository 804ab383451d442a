"""Smoke tests for the reference-style TestGroup CLI (``testing.py``)."""

import os

import pytest

from tf_flash_attention_tpu import testing


def test_list(capsys):
    testing.cmd_list(1)
    out = capsys.readouterr().out
    assert "FullAttentionSyncModeNoneFront" in out
    assert "LocalStrideAndCausalAttentionSyncModeScaleEnd" in out


def test_single_case_verify(monkeypatch, capsys):
    monkeypatch.setenv("TESTCASE", "CausalAttentionSyncModeScaleFront")
    monkeypatch.setenv("FA_RUNS", "1")
    monkeypatch.setenv("FA_SEED", "7")
    rc = testing.cmd_verify(1)
    out = capsys.readouterr().out
    assert rc == 0
    assert "OK" in out
    assert "CausalAttentionSyncModeScaleFront" in out


def test_case_matrix_matches_reference():
    # 16 enabled cases: full only under none_front; 5 masked families x 3
    # sync modes (test_base.py:364-385 enables 15 + causal/none_front which
    # the reference constructs but omits; we enable it for extra coverage)
    names = set(testing._CASES)
    assert len(names) == 16
    assert "FullAttentionSyncModeNoneFront" in names
    assert "FullAttentionSyncModeScaleEnd" not in names
