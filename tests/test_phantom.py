"""Synthetic cohort generator invariants (eval/phantom.py) — the accuracy
north-star proxy's data contract."""

import numpy as np

from deepwmh_tpu.eval.phantom import (
    base_tissue,
    make_subject,
    write_cohort,
)

SHAPE = (40, 48, 40)


def test_base_tissue_topology():
    tissue, csf = base_tissue(SHAPE)
    # all four reference classes present (FreeSurfer_aseg.py:84-92 remap)
    assert set(np.unique(tissue)) == {0, 1, 2, 3}
    assert csf.sum() > 0
    # CSF sits inside the cerebrum class
    assert np.all(tissue[csf] == 1)
    # cortex is a shell: strictly more boundary-adjacent than cerebrum
    brain = tissue > 0
    interior = brain & np.roll(brain, 1, 0) & np.roll(brain, -1, 0)
    assert (tissue == 1).sum() > 0 and (tissue == 2).sum() > 0


def test_subject_determinism_and_distinctness():
    a1 = make_subject(SHAPE, seed=3)
    a2 = make_subject(SHAPE, seed=3)
    b = make_subject(SHAPE, seed=4)
    assert np.array_equal(a1["flair"], a2["flair"])
    assert np.array_equal(a1["label2"], a2["label2"])
    # distinct seeds produce genuinely different anatomy (not just noise):
    # the tissue label maps must disagree on a substantial voxel fraction
    diff = (a1["label2"] != b["label2"]).mean()
    assert diff > 0.01, "diffeomorphism too weak: %.4f label disagreement" % diff


def test_lesions_in_wm_and_hyperintense():
    sub = make_subject(SHAPE, seed=7, lesion=True)
    gt = sub["lesion_gt"] > 0
    assert gt.sum() > 0
    # lesions live in cerebral WM (class 1)
    assert np.all(sub["label2"][gt] == 1)
    # and are hyperintense relative to the subject's own WM
    wm = (sub["label2"] == 1) & ~gt
    assert sub["flair"][gt].mean() > sub["flair"][wm].mean() + 50
    # healthy subject has no lesion
    assert make_subject(SHAPE, seed=7, lesion=False)["lesion_gt"].sum() == 0


def test_label1_is_brain_mask():
    sub = make_subject(SHAPE, seed=5)
    assert np.array_equal(sub["label1"] > 0, sub["label2"] > 0)
    assert sub["flair"].min() >= 0.0
    assert sub["flair"].dtype == np.float32


def test_write_cohort_contract(tmp_path):
    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.core.manifests import check_dataset, load_csv_simple

    ref_csv, train_csv, gt = write_cohort(
        str(tmp_path), shape=SHAPE, n_ref=2, n_train=2, seed=0
    )
    refs = load_csv_simple(
        ref_csv, key_names=["case", "desc", "flair", "label1", "label2"]
    )
    train = load_csv_simple(train_csv, key_names=["case", "desc", "flair"])
    assert check_dataset(refs) and check_dataset(train)
    assert len(refs["case"]) == 2 and len(train["case"]) == 2
    assert set(gt.keys()) == set(train["case"])
    for p in gt.values():
        assert nifti.try_load_nifti(p)
    # spacing round-trips through the NIfTI header
    assert tuple(nifti.get_nifti_pixdim(refs["flair"][0])) == (2.0, 2.0, 2.0)
