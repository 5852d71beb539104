"""Unit coverage for the full-model parity harness (scripts/parity_check.py).

The heavyweight path (loading the torch reference with real weights) cannot
run in CI — these tests pin the comparison semantics and the fail-loud
behavior so the harness itself is trustworthy when weights are present.
"""

import numpy as np
import pytest

from scripts.parity_check import compare_logits, main


def test_compare_logits_pass_and_metrics():
    rng = np.random.RandomState(0)
    ref = rng.randn(1, 7, 32).astype(np.float32)
    ours = ref + rng.uniform(-5e-3, 5e-3, ref.shape).astype(np.float32)
    r = compare_logits(ref, ours, threshold=1e-2)
    assert r["pass"] and r["logit_max_abs_delta"] <= 1e-2
    assert r["greedy_argmax_agreement"] <= 1.0


def test_compare_logits_fail_above_threshold():
    ref = np.zeros((1, 4, 16), np.float32)
    ours = ref.copy()
    ours[0, 2, 5] = 0.02
    r = compare_logits(ref, ours, threshold=1e-2)
    assert not r["pass"] and r["logit_max_abs_delta"] == pytest.approx(0.02)


def test_compare_logits_vocab_padding_overlap():
    # padded-vocab mismatch (multiple-of-64 resize, reference llama2.py:74-76):
    # compare over the overlap only
    ref = np.random.RandomState(1).randn(1, 3, 64).astype(np.float32)
    ours = np.concatenate([ref, np.full((1, 3, 8), 99.0, np.float32)], axis=-1)
    r = compare_logits(ref, ours, threshold=1e-2)
    assert r["pass"]


def test_compare_logits_rejects_seq_mismatch():
    with pytest.raises(AssertionError, match="sequence mismatch"):
        compare_logits(np.zeros((1, 4, 8), np.float32), np.zeros((1, 5, 8), np.float32), 1e-2)


def test_main_exits_2_without_reference(monkeypatch, tmp_path):
    """No reference mount -> exit 2 (never silently 'passes')."""
    monkeypatch.setattr(
        "sys.argv",
        ["parity_check.py", "--run_dir", str(tmp_path), "--reference_root", str(tmp_path / "nope")],
    )
    assert main() == 2


def test_main_exits_2_when_reference_weights_missing(monkeypatch, tmp_path):
    """Reference mounted but its model can't load (no weights) -> exit 2,
    NOT a random-init comparison."""
    (tmp_path / "merv").mkdir()
    monkeypatch.setattr(
        "sys.argv",
        ["parity_check.py", "--run_dir", str(tmp_path), "--reference_root", str(tmp_path), "--max_frames", "4"],
    )
    import scripts.parity_check as pc

    def boom(args, frames, prompt):
        raise FileNotFoundError("no weights")

    monkeypatch.setattr(pc, "_reference_logits", boom)
    assert pc.main() == 2
