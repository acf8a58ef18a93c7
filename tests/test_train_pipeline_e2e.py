"""Micro end-to-end DeepWMH_train: N4(skipped) -> group registration ->
label propagation -> 3-stage self-training -> release, on a synthetic
cohort. The SURVEY.md §4 'integration test on tiny synthetic volumes'."""

import os

import numpy as np
import pytest

from deepwmh_tpu.core import nifti
from deepwmh_tpu.core.manifests import write_csv_simple
from deepwmh_tpu.pipeline.multistage import StageBudget


def _head(shape, seed, lesion=False):
    rng = np.random.RandomState(seed)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    brain = (r < 0.8).astype(np.float32)
    vol = brain * (200 + 30 * np.cos(3 * g[0]) + 8 * rng.randn(*shape))
    les = np.zeros(shape, np.float32)
    if lesion:
        les[10:14, 10:14, 8:12] = 1.0
        les *= brain
        vol = vol + 160 * les
    return vol.astype(np.float32), brain, les


@pytest.mark.slow
def test_full_training_pipeline(tmp_path):
    from deepwmh_tpu.cli.train import run_train

    shape = (24, 24, 20)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))

    data_dir = tmp_path / "data"
    os.makedirs(data_dir)

    ref_rows = {"case": [], "desc": [], "flair": [], "label1": [], "label2": []}
    for i in range(2):
        vol, brain, _ = _head(shape, seed=i)
        fp = str(data_dir / ("ref%d.nii.gz" % i))
        l1 = str(data_dir / ("ref%d_l1.nii.gz" % i))
        l2 = str(data_dir / ("ref%d_l2.nii.gz" % i))
        nifti.save_nifti(vol, hdr, fp)
        nifti.save_nifti(brain, hdr, l1)
        nifti.save_nifti(brain, hdr, l2)  # tissue class 1 == cerebrum
        ref_rows["case"].append("REF%d" % i)
        ref_rows["desc"].append("healthy")
        ref_rows["flair"].append(fp)
        ref_rows["label1"].append(l1)
        ref_rows["label2"].append(l2)

    train_rows = {"case": [], "desc": [], "flair": []}
    lesions = {}
    for i in range(2):
        vol, _, les = _head(shape, seed=10 + i, lesion=True)
        fp = str(data_dir / ("sub%d.nii.gz" % i))
        nifti.save_nifti(vol, hdr, fp)
        train_rows["case"].append("SUB%d" % i)
        train_rows["desc"].append("patient")
        train_rows["flair"].append(fp)
        lesions["SUB%d" % i] = les

    ref_csv = str(tmp_path / "reference.csv")
    train_csv = str(tmp_path / "training.csv")
    write_csv_simple(ref_csv, ref_rows)
    write_csv_simple(train_csv, train_rows)

    out = str(tmp_path / "out")
    budget = StageBudget(
        stage2_epochs=2,
        stage3_epochs=2,
        batches_per_epoch=2,
        batch_size=2,
        voxel_budget=16 * 16 * 16,
    )
    core = run_train(
        ref_csv,
        train_csv,
        out,
        skip_bfc=True,
        quick_registration=True,
        budget=budget,
        run_stages="full",
    )

    # registration artifacts
    assert nifti.try_load_nifti(
        os.path.join(out, "002_Registration", "REF0_to_SUB0.nii.gz")
    )
    assert nifti.try_load_nifti(
        os.path.join(out, "003_Transformed", "REF1_to_SUB1", "label1.nii.gz")
    )

    # stage-1 pseudo-labels detect the synthetic lesion
    seg = nifti.load_nifti_simple(
        os.path.join(core, "Stage_1_initial_segmentation", "SUB0", "segmentation_pp.nii.gz")
    )
    les = lesions["SUB0"]
    inter = ((seg > 0.5) & (les > 0.5)).sum()
    recall = inter / max((les > 0.5).sum(), 1)
    dice = 2 * inter / max((seg > 0.5).sum() + (les > 0.5).sum(), 1)
    # with only K=2 synthetic references the auto-threshold is permissive
    # (boundary FPs), so require full lesion recall + a loose dice
    assert recall > 0.9, "stage-1 recall too low: %.3f" % recall
    assert dice > 0.15, "stage-1 dice too low: %.3f" % dice

    # stage-2 refined labels exist
    assert nifti.try_load_nifti(
        os.path.join(core, "Stage_2_label_denoising", "005_refined_label", "SUB0", "label_ensembled.nii.gz")
    )
    # stage-3 split + fit + release
    assert os.path.isfile(
        os.path.join(core, "Stage_3_DCNN_training", "001_data_partitions", "split.json")
    )
    assert os.path.isfile(
        os.path.join(core, "Model_release", "model_release.tar.gz")
    )
    assert os.path.isfile(
        os.path.join(core, "Checkpoints", "PIPELINE_TRAINING_COMPLETE")
    )

    # resume: rerun is a cheap no-op
    import time

    t0 = time.time()
    run_train(
        ref_csv, train_csv, out,
        skip_bfc=True, budget=budget, run_stages="full",
    )
    assert time.time() - t0 < 120
