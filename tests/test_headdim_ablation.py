"""Smoke test for the head-split quality ablation harness
(tools/headdim_ablation.py): both arms run end-to-end from shared
init params on shared batches, and the harness reports the delta."""

import numpy as np

from avion_tpu.tools.headdim_ablation import run, synth_concepts
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


def test_synth_concepts_shapes():
    rng = np.random.RandomState(0)
    protos, captions = synth_concepts(rng, 4, 2, 32)
    assert protos.shape == (4, 2, 32, 32, 3)
    assert protos.dtype == np.uint8
    assert len(captions) == 4
    # block-constant: an 8x8 block is a single value
    assert (protos[0, 0, :8, :8, 0] == protos[0, 0, 0, 0, 0]).all()


def test_ablation_two_arms(capsys):
    summary = run(steps=6, batch=8, concepts=4, width=64, layers=2,
                  frames=2, size=32, patch=16, heads=(4, 2),
                  heldout_per_concept=2, sigma=10.0, seed=0)
    assert summary["metric"] == "headdim_ablation"
    assert [a["heads"] for a in summary["arms"]] == [4, 2]
    assert summary["arms"][0]["head_dim"] == 16
    assert summary["arms"][1]["head_dim"] == 32
    for a in summary["arms"]:
        assert np.isfinite(a["final_loss"])
        assert 0.0 <= a["heldout_top1"] <= 1.0
    assert len(summary["top1_delta_vs_first"]) == 1
    # both arms started from identical params on identical batches:
    # the first logged loss (step 0, pre-update forward differs only in
    # head split) must be close between arms
    d0 = abs(summary["arms"][0]["first_loss"]
             - summary["arms"][1]["first_loss"])
    assert d0 < 1.0, d0


def test_overlap_shrinks_between_concept_signal():
    rng = np.random.RandomState(0)
    p0, _ = synth_concepts(rng, 6, 2, 32, overlap=0.0)
    rng = np.random.RandomState(0)
    p9, _ = synth_concepts(rng, 6, 2, 32, overlap=0.9)
    spread = lambda p: np.abs(
        p.astype(np.int32)[:, None] - p.astype(np.int32)[None, :]).mean()
    assert spread(p9) < spread(p0) * 0.5


def test_run_multi_aggregates(capsys):
    from avion_tpu.tools.headdim_ablation import run_multi

    s = run_multi([0, 1], steps=4, batch=8, concepts=4, width=64,
                  layers=2, frames=2, size=32, patch=16, heads=(4, 2),
                  heldout_per_concept=2, sigma=40.0, overlap=0.5)
    assert s["metric"] == "headdim_ablation_multi"
    assert len(s["runs"]) == 2
    assert len(s["top1_delta_mean"]) == 1
    assert len(s["top1_delta_std"]) == 1
    assert s["top1_by_arm_mean"][0] <= 1.0


def test_eval_sigma_curve(capsys):
    s = run(steps=4, batch=8, concepts=4, width=64, layers=2,
            frames=2, size=32, patch=16, heads=(4, 2),
            heldout_per_concept=2, sigma=10.0,
            eval_sigma=[10.0, 120.0, 240.0])
    for a in s["arms"]:
        curve = a["top1_by_sigma"]
        assert set(curve) == {"10", "120", "240"}
        assert a["heldout_top1"] == curve["10"]
    assert len(s["top1_delta_by_sigma_vs_first"]) == 1


def test_run_multi_sigma_aggregation(capsys):
    from avion_tpu.tools.headdim_ablation import run_multi

    s = run_multi([0, 1], steps=3, batch=8, concepts=4, width=64,
                  layers=2, frames=2, size=32, patch=16, heads=(4, 2),
                  heldout_per_concept=2, sigma=10.0,
                  eval_sigma=[10.0, 240.0])
    assert len(s["top1_by_sigma_arm_mean"]) == 2
    assert set(s["top1_delta_by_sigma_mean"][0]) == {"10", "240"}
    assert set(s["top1_delta_by_sigma_std"][0]) == {"10", "240"}
