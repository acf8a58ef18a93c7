"""End-to-end loop on a HETEROGENEOUS cohort: every subject its own volume
size and voxel spacing — the reference's normal operating regime (it
prepares per-case geometry in deepwmh/pipeline/DCNN_multistage.py:39-93).
This framework's answer is pad-and-bucket (unet/preprocess.padded_shape,
infer.patch_positions) plus per-geometry grouping in the NLL analysis
(pipeline/analysis.py) — this test drives the FULL train -> release ->
install -> predict loop across three geometries (including one thick-slice
protocol) and gates both ACCURACY and COMPILE SCALING:

1. held-out Dice floor on a mixed-geometry test patient;
2. the number of fused case programs built grows with the number of
   DISTINCT geometries, not with the number of subjects — cases sharing a
   protocol share compiled programs.

Geometries keep the PHYSICAL field of view matched (~96x112x96 mm): the
phantom synthesizes anatomy in normalized volume coordinates, so equal
physical extents give registrable heads across protocols.

Measured at this config (CPU backend): held-out Dice 0.877, stage-1
pseudo-label Dice 0.42-0.63, 12 new case programs for 10 case predictions
over 3 geometries (vs 30 without sharing). PERF.md "Mixed-geometry
cohorts" carries the measured row.
"""

import json

import numpy as np
import pytest

from deepwmh_tpu.eval.e2e import run_e2e_accuracy
from deepwmh_tpu.pipeline.multistage import StageBudget

# 3 protocols, matched ~96x112x96 mm FOV; the third is a thick-slice
# (4 mm inferior-superior) acquisition
SHAPES = [(48, 56, 48), (54, 64, 54), (24, 56, 48)]
SPACINGS = [(2.0, 2.0, 2.0), (1.8, 1.75, 1.8), (4.0, 2.0, 2.0)]


@pytest.mark.slow
def test_e2e_mixed_geometry_heldout_dice(tmp_path):
    from deepwmh_tpu.unet.infer import _shared_case_cache

    cache = _shared_case_cache()
    keys_before = set(cache.keys())

    budget = StageBudget(
        stage2_epochs=6, stage3_epochs=14, batches_per_epoch=12,
        batch_size=2, voxel_budget=24**3,
        base_features=16, max_features=128,
    )
    res = run_e2e_accuracy(
        str(tmp_path), n_ref=4, n_train=2, n_test=1,
        shapes=SHAPES, spacings=SPACINGS,
        budget=budget, run_stages="full",
    )
    new_keys = set(cache.keys()) - keys_before
    res["new_case_programs"] = len(new_keys)
    print(json.dumps(res))

    # stage-1 pseudo-labels must find the lesions on every protocol
    assert min(res["stage1_dice"].values()) > 0.3, res["stage1_dice"]

    # the released model on a held-out patient (geometry cycles back to
    # protocol 0 at cohort position n_ref+n_train=6)
    assert res["dice"] >= 0.70, (
        "mixed-geometry held-out Dice regressed: %.3f" % res["dice"]
    )
    for case, (p, r) in res["heldout_pr"].items():
        assert r >= 0.80, "held-out recall regressed (%s): %.3f" % (case, r)
    assert float(np.mean(list(res["trainfit_dice"].values()))) >= 0.70, (
        res["trainfit_dice"]
    )

    # compile scaling: case programs are keyed by (model config, geometry),
    # so subjects sharing a protocol share programs. The loop predicts
    # every training patient at 2+ pipeline points plus the held-out case;
    # without sharing that is >= one program per (subject, pipeline point).
    # With 3 distinct geometries the count must stay a small per-geometry
    # constant (kinds: patch/fullvol x n4 on/off), NOT scale with subjects.
    n_geo = len(set(zip(SHAPES, SPACINGS)))
    assert len(new_keys) <= n_geo * 4, (
        "case-program count scales with subjects, not geometries: %d new "
        "programs for %d geometries" % (len(new_keys), n_geo)
    )
