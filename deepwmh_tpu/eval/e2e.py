"""End-to-end accuracy harness: full DeepWMH_train -> DeepWMH_predict on a
synthetic cohort with known lesion ground truth.

This is the framework's accuracy north star in an environment without real
OASIS-3 data — the proxy for the reference's Dice-vs-expert-raters protocol
(experiments/010_OASIS3/run_Siemens_Biograph_mMR.py:266-300): the FULL
annotation-free loop (N4 -> group registration -> label propagation -> 3-stage
self-training -> release -> install -> predict) runs on a phantom cohort
(eval/phantom.py), and the released stage-3 model is scored with voxel Dice
(deepwmh/analysis/metrics.py:26-32) against exact synthetic lesion masks —
both training-fit and on HELD-OUT patients the pipeline never saw.

Used by tests/test_e2e_accuracy.py (Dice floor gate) and bench.py's
e2e_dice_synthetic section (driver-tracked accuracy every round).
"""

from __future__ import annotations

import os

import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.eval.metrics import hard_dice_binary, voxel_precision_recall
from deepwmh_tpu.eval.phantom import cohort_geometry, make_subject, write_cohort


def default_e2e_budget():
    """Scaled-down stage budgets for the phantom cohort: same pipeline
    semantics as the reference's 50/100-epoch x 150-batch recipe
    (DCNN_multistage.py:193-216), sized so the full loop fits a benchmark
    slice. Patch = 32^3 voxel budget at 2 mm spacing."""
    from deepwmh_tpu.pipeline.multistage import StageBudget

    return StageBudget(
        stage2_epochs=15,
        stage3_epochs=25,
        batches_per_epoch=20,
        batch_size=2,
        voxel_budget=32 * 32 * 32,
    )


def run_e2e_accuracy(
    work_dir,
    shape=(64, 80, 64),
    spacing=(2.0, 2.0, 2.0),
    n_ref=3,
    n_train=4,
    n_test=2,
    seed=0,
    budget=None,
    run_stages="full",
    skip_bfc=False,
    mesh=None,
    registration_mode="auto",
    learned_reg_cfg=None,
    shapes=None,
    spacings=None,
):
    """Run the full training loop on a phantom cohort and score it.

    registration_mode/learned_reg_cfg pass through to run_train, so the
    SAME accuracy protocol scores either registration pathway (svf per-pair
    optimization or the amortized learned network) through the full loop.

    shapes/spacings (optional per-subject cycles, phantom.cohort_geometry)
    make the cohort HETEROGENEOUS — every subject its own volume size and
    voxel spacing, the reference's normal operating regime
    (deepwmh/pipeline/DCNN_multistage.py:39-93). Held-out patients cycle
    the same lists (offset by their cohort position) so the test geometry
    is mixed too.

    Returns a dict:
      stage1_dice      {case: dice of the stage-1 pseudo-label vs GT}
      trainfit_dice    {case: dice of the stage-3 training fit vs GT}
      heldout_dice     {case: dice of released-model predictions on held-out
                        patients vs GT}  (run_stages == 'full' only)
      heldout_pr       {case: (precision, recall)}
      dice             mean held-out dice (the headline number)

    Re-entrant: artifacts under work_dir resume exactly like production runs.
    """
    from deepwmh_tpu.cli.predict import run_predict
    from deepwmh_tpu.cli.train import run_train
    from deepwmh_tpu.unet.release import install_model

    os.makedirs(work_dir, exist_ok=True)
    data_dir = os.path.join(work_dir, "data")
    ref_csv, train_csv, gt_paths = write_cohort(
        data_dir, shape=shape, spacing=spacing, n_ref=n_ref, n_train=n_train,
        seed=seed, shapes=shapes, spacings=spacings,
    )

    # held-out patients: same generator family, seeds disjoint from the
    # cohort (training patients use seed+1000+i)
    test_cases, test_gt = [], {}
    for i in range(n_test):
        sh, sp = cohort_geometry(
            shape, spacing, shapes, spacings, n_ref + n_train + i
        )
        hdr = nifti.NiftiHeader()
        hdr.set_shape(sh)
        hdr.set_zooms(sp)
        sub = make_subject(sh, seed=seed + 2000 + i, lesion=True)
        case = "TEST%02d" % i
        fp = os.path.join(data_dir, "%s_flair.nii.gz" % case)
        gp = os.path.join(data_dir, "%s_lesion_gt.nii.gz" % case)
        # probe BOTH artifacts: a crash between the two saves must re-save
        # on resume, never leave the GT permanently missing behind a
        # loadable flair (the CLAUDE.md idempotency contract)
        if not (nifti.try_load_nifti(fp) and nifti.try_load_nifti(gp)):
            nifti.save_nifti(sub["flair"], hdr, fp)
            nifti.save_nifti(sub["lesion_gt"].astype(np.float32), hdr, gp)
        test_cases.append((case, fp))
        test_gt[case] = gp

    out_dir = os.path.join(work_dir, "train_out")
    core = run_train(
        ref_csv, train_csv, out_dir,
        skip_bfc=skip_bfc,
        budget=budget or default_e2e_budget(),
        run_stages=run_stages,
        mesh=mesh,
        registration_mode=registration_mode,
        learned_reg_cfg=learned_reg_cfg,
    )

    result = {"stage1_dice": {}, "trainfit_dice": {}, "heldout_dice": {},
              "heldout_pr": {}}
    for case, gp in gt_paths.items():
        gt = nifti.load_nifti_simple(gp)
        s1 = os.path.join(core, "Stage_1_initial_segmentation", case,
                          "segmentation_pp.nii.gz")
        if os.path.isfile(s1):
            result["stage1_dice"][case] = float(
                hard_dice_binary(nifti.load_nifti_simple(s1), gt)
            )
        fit = os.path.join(core, "Stage_3_DCNN_training", "002_training_fit",
                           "3mm_postproc", "%s.nii.gz" % case)
        if os.path.isfile(fit):
            result["trainfit_dice"][case] = float(
                hard_dice_binary(nifti.load_nifti_simple(fit), gt)
            )

    if run_stages == "full":
        tarball = os.path.join(core, "Model_release", "model_release.tar.gz")
        model_dir = os.path.join(work_dir, "installed_model")
        # always (re-)extract: installation is sub-second, overwrites in
        # place, and ends in validate_model_dir — a resume after a crash
        # mid-extraction must never accept a half-installed package just
        # because the directory is non-empty
        install_model(tarball, model_dir)
        pred_dir = os.path.join(work_dir, "predict_out")
        run_predict(
            [p for _, p in test_cases], [c for c, _ in test_cases],
            model_dir, pred_dir, skip_bfc=skip_bfc, make_previews=False,
            mesh=mesh,
        )
        for case, _ in test_cases:
            pred = nifti.load_nifti_simple(
                os.path.join(pred_dir, "002_Segmentations", "003_postproc_fov",
                             "%s.nii.gz" % case)
            )
            gt = nifti.load_nifti_simple(test_gt[case])
            result["heldout_dice"][case] = float(hard_dice_binary(pred, gt))
            p, r = voxel_precision_recall(pred, gt)
            result["heldout_pr"][case] = (float(p), float(r))
        result["dice"] = float(np.mean(list(result["heldout_dice"].values())))
    return result
