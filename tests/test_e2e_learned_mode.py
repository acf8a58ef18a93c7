"""Learned-registration-mode end-to-end coverage: the amortized network
pathway (the reference's VoxelMorph alternative,
deepwmh/external_tools/VxM_group_registration.py:84-397) must feed the SAME
downstream pipeline the per-pair svf mode does — template construction,
network training, per-pair lift/warp artifacts, label propagation, and the
stage-1 NLL analysis — and the resulting pseudo-labels must find the
lesions.

The learned mode's registration QUALITY is gated non-circularly by
tests/test_registration_quality.py (label overlap on distinct anatomies)
and its full-loop Dice is measured on the real chip (docs/PERF.md
"Registration at scale"); this test pins the INTEGRATION: a forced
--registration-mode learned run producing stage-1 labels through the exact
cli/train.py artifact contract, scaled for the CPU backend.

initseg-only: stages 2/3 consume pseudo-labels identically for both
registration modes, and are covered by tests/test_e2e_accuracy.py.
"""

import pytest

from deepwmh_tpu.eval.e2e import run_e2e_accuracy
from deepwmh_tpu.pipeline.multistage import StageBudget
from deepwmh_tpu.registration.learned import LearnedRegConfig


@pytest.mark.slow
def test_stage1_with_learned_registration(tmp_path):
    budget = StageBudget(
        stage2_epochs=1, stage3_epochs=1, batches_per_epoch=1,
        batch_size=2, voxel_budget=24**3,
    )
    res = run_e2e_accuracy(
        str(tmp_path),
        shape=(48, 56, 48),
        # n_ref=4 matches the svf gate's cohort (test_e2e_accuracy.py) —
        # reference count is the measured accuracy lever of the stage-1 NLL
        n_ref=4, n_train=2, n_test=0,
        budget=budget, run_stages="initseg",
        registration_mode="learned",
        # CPU-sized network training; the production 300-step config is
        # exercised on hardware (docs/PERF.md)
        learned_reg_cfg=LearnedRegConfig(steps=120),
    )
    # same stage-1 bar as the isotropic svf gate (test_e2e_accuracy.py):
    # pseudo-labels must find the lesions; precision is stage 2/3's job
    assert res["stage1_dice"], "no stage-1 outputs scored"
    assert min(res["stage1_dice"].values()) > 0.3, res["stage1_dice"]
