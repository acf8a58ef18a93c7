"""Anisotropic-geometry end-to-end coverage: the registration + stage-1
analysis path on thick-slice clinical FLAIR geometry (2x2x4 mm).

Everything mm-based in the pipeline must keep working when the three voxel
axes have different physical sizes: N4's field resolution, affine+SVF
registration driven by per-axis spacing, label propagation through the
composed warp, the NLL analysis's 50 mm alignment grid
(lesion_analysis.py:176-184 semantics) and the 3 mm^3 spark removal. The
isotropic e2e gate (tests/test_e2e_accuracy.py) cannot catch a bug that
cancels out when all axes share one zoom — e.g. a spacing index swapped
between the D/H/W axis conventions.

initseg-only (registration + analysis are the geometry-sensitive stages;
stage 2/3 train on resampled patches and are covered isotropically).
"""

import pytest

from deepwmh_tpu.eval.e2e import run_e2e_accuracy
from deepwmh_tpu.pipeline.multistage import StageBudget


@pytest.mark.slow
def test_stage1_on_thick_slice_geometry(tmp_path):
    budget = StageBudget(
        stage2_epochs=1, stage3_epochs=1, batches_per_epoch=1,
        batch_size=2, voxel_budget=24**3,
    )
    res = run_e2e_accuracy(
        str(tmp_path),
        shape=(64, 72, 32),
        spacing=(2.0, 2.0, 4.0),  # thick-slice axial FLAIR geometry
        n_ref=3, n_train=2, n_test=0,
        budget=budget, run_stages="initseg",
    )
    # same stage-1 bar as the isotropic gate: pseudo-labels must find the
    # lesions (permissive precision is by design; stages 2/3 clean it up)
    assert res["stage1_dice"], "no stage-1 outputs scored"
    assert min(res["stage1_dice"].values()) > 0.3, res["stage1_dice"]
