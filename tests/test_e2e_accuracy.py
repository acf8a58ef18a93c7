"""End-to-end accuracy floor: the full annotation-free loop must SEGMENT
WELL, not merely run.

Runs DeepWMH_train (N4 -> group registration -> label propagation -> all 3
self-training stages -> release) on a phantom cohort with exact lesion
ground truth, installs the released model, predicts a HELD-OUT patient with
DeepWMH_predict, and gates the final voxel Dice — the executable proxy for
the reference's OASIS-3 Dice-vs-expert-raters protocol
(experiments/010_OASIS3/run_Siemens_Biograph_mMR.py:266-300).

Config calibrated on the CPU backend (narrow 16->128-feature net, 24^3
patches — width measured NOT to be the accuracy lever at this cohort
scale): measured heldout Dice 0.902 (precision 0.854 / recall 0.955),
trainfit 0.87-0.89, ~15 min wall. Floors leave a 0.2 margin: a breach is a
real accuracy regression somewhere in the pipeline, not noise. The full
production-width configuration is measured on real hardware every round by
bench.py's e2e_dice_synthetic section (0.931 heldout on a TPU v5e).
"""

import json

import numpy as np
import pytest

from deepwmh_tpu.eval.e2e import run_e2e_accuracy
from deepwmh_tpu.pipeline.multistage import StageBudget


@pytest.mark.slow
def test_e2e_heldout_dice_floor(tmp_path):
    budget = StageBudget(
        stage2_epochs=6, stage3_epochs=14, batches_per_epoch=12,
        batch_size=2, voxel_budget=24**3,
        base_features=16, max_features=128,
    )
    res = run_e2e_accuracy(
        str(tmp_path), shape=(48, 56, 48), n_ref=4, n_train=2, n_test=1,
        budget=budget, run_stages="full",
    )
    print(json.dumps(res))

    # stage-1 pseudo-labels must find every lesion (the analysis is
    # deliberately permissive; precision is stage 2/3's job)
    assert min(res["stage1_dice"].values()) > 0.3, res["stage1_dice"]

    # the FINAL released model, on a patient the pipeline never saw
    assert res["dice"] >= 0.70, (
        "held-out Dice regressed: %.3f (measured 0.902 at this config)"
        % res["dice"]
    )
    for case, (p, r) in res["heldout_pr"].items():
        assert r >= 0.80, "held-out recall regressed (%s): %.3f" % (case, r)

    # and it must fit its own training cohort
    assert float(np.mean(list(res["trainfit_dice"].values()))) >= 0.70, (
        res["trainfit_dice"]
    )
