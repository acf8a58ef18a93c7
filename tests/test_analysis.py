import os

import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.pipeline.analysis import (
    LesionAnalyzer,
    patch_size_from_voxel,
)


def make_cohort(tmp_path, K=4, shape=(24, 24, 20), seed=0):
    """Synthetic 'registered' cohort: shared brain + per-subject noise;
    the target has a bright lesion blob."""
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, shape[0]),
        np.linspace(-1, 1, shape[1]),
        np.linspace(-1, 1, shape[2]),
        indexing="ij",
    )
    r = np.sqrt(zz**2 + yy**2 + xx**2)
    brain = (r < 0.8).astype(np.float32)
    base = brain * (200 + 40 * np.cos(3 * zz))

    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))

    refs, l1s, l2s = [], [], []
    for i in range(K):
        ref = base + 8 * rng.randn(*shape).astype(np.float32) * brain
        p = str(tmp_path / ("ref%d.nii.gz" % i))
        nifti.save_nifti(ref, hdr, p)
        refs.append(p)
        p1 = str(tmp_path / ("l1_%d.nii.gz" % i))
        nifti.save_nifti(brain, hdr, p1)
        l1s.append(p1)
        # label2: tissue classes, cerebrum=1 everywhere in brain
        p2 = str(tmp_path / ("l2_%d.nii.gz" % i))
        nifti.save_nifti(brain, hdr, p2)
        l2s.append(p2)

    target = base + 8 * rng.randn(*shape).astype(np.float32) * brain
    lesion = np.zeros(shape, np.float32)
    lesion[10:15, 10:15, 8:12] = 1.0
    lesion *= brain
    target = target + 150 * lesion
    tpath = str(tmp_path / "target.nii.gz")
    nifti.save_nifti(target, hdr, tpath)
    return tpath, refs, l1s, l2s, lesion


def test_patch_size_from_voxel():
    assert patch_size_from_voxel([1.0, 1.0, 1.0]) == (50, 50, 50)
    assert patch_size_from_voxel([2.0, 1.0, 5.0]) == (25, 50, 10)


def test_lesion_analyzer_end_to_end(tmp_path):
    tpath, refs, l1s, l2s, lesion = make_cohort(tmp_path)
    out = str(tmp_path / "stage1")
    an = LesionAnalyzer(out)
    an.add_case("case1", tpath, refs, l1s, l2s)
    an.analyze_and_do_segmentation(intensity_prior="+")

    case_dir = os.path.join(out, "case1")
    for f in [
        "anomaly_score.nii.gz",
        "valid_mask.nii.gz",
        "normalized_input.nii.gz",
        "segmentation.nii.gz",
        "segmentation_pp.nii.gz",
        "summary.json",
        "segmentation.txt",
        "preprocessed_image.nii.gz",
    ]:
        assert os.path.isfile(os.path.join(case_dir, f)), f

    seg = nifti.load_nifti_simple(os.path.join(case_dir, "segmentation_pp.nii.gz"))
    inter = ((seg > 0.5) & (lesion > 0.5)).sum()
    dice = 2 * inter / max((seg > 0.5).sum() + (lesion > 0.5).sum(), 1)
    assert dice > 0.5, "lesion not detected (dice=%.3f)" % dice

    # anomaly is high inside the lesion, low in healthy tissue
    anomaly = nifti.load_nifti_simple(os.path.join(case_dir, "anomaly_score.nii.gz"))
    assert anomaly[lesion > 0.5].mean() > 5 * max(anomaly[lesion < 0.5].mean(), 1e-6)

    # idempotent: second run must not recompute (mtime unchanged)
    m1 = os.path.getmtime(os.path.join(case_dir, "anomaly_score.nii.gz"))
    an.analyze_and_do_segmentation(intensity_prior="+")
    m2 = os.path.getmtime(os.path.join(case_dir, "anomaly_score.nii.gz"))
    assert m1 == m2


def test_debug_intermediates(tmp_path):
    """debug=True saves the back-solved per-voxel intensity threshold and
    the other visualization intermediates (reference
    lesion_analysis.py:245-277)."""
    tpath, refs, l1s, l2s, _ = make_cohort(tmp_path / "data_dbg")
    out = str(tmp_path / "out_dbg")
    an = LesionAnalyzer(out)
    an.add_case("caseD", tpath, refs, l1s, l2s)
    an.analyze_and_do_segmentation(intensity_prior="+", debug=True)

    case_dir = os.path.join(out, "caseD")
    for f in ("intensity_thr", "rough_brain", "local_mean", "mean_value",
              "std_value"):
        assert nifti.try_load_nifti(os.path.join(case_dir, f + ".nii.gz")), f
    for k in range(len(refs)):
        assert nifti.try_load_nifti(
            os.path.join(case_dir, "references", "ref%02d.nii.gz" % k))
        assert nifti.try_load_nifti(
            os.path.join(case_dir, "references", "ref%02d_anomaly.nii.gz" % k))

    # the back-solve invariant: NLL evaluated AT the intensity threshold
    # equals the anomaly threshold wherever the threshold is finite
    import json

    with open(os.path.join(case_dir, "summary.json")) as f:
        thr = json.load(f)["autoseg_threshold"]
    x_thr = nifti.load_nifti_simple(os.path.join(case_dir, "intensity_thr.nii.gz"))
    mu = nifti.load_nifti_simple(os.path.join(case_dir, "mean_value.nii.gz"))
    sd = nifti.load_nifti_simple(os.path.join(case_dir, "std_value.nii.gz"))
    ok = np.isfinite(x_thr) & (sd > 1e-6) & (x_thr != 0)
    assert ok.sum() > 100
    nll_at_thr = (x_thr[ok] - mu[ok]) ** 2 / (2 * sd[ok] ** 2) + np.log(
        sd[ok] * 2.506
    )
    np.testing.assert_allclose(nll_at_thr, thr, rtol=1e-3, atol=1e-3)


def _multi_case_cohort(tmp_path, n_cases=3, K=3, shape=(20, 20, 16)):
    cases = []
    for i in range(n_cases):
        t, refs, l1s, l2s, _ = make_cohort(
            tmp_path / ("c%d" % i), K=K, shape=shape, seed=17 + i
        )
        cases.append(("case%d" % i, t, refs, l1s, l2s))
    return cases


def test_batched_nll_matches_per_case(tmp_path):
    """Same-geometry cases fused into one vmapped program produce the same
    artifacts as the per-case path (bitwise up to float reassociation)."""
    from deepwmh_tpu.pipeline.analysis import LesionAnalyzer

    cases = _multi_case_cohort(tmp_path)

    out_a = str(tmp_path / "per_case")
    a = LesionAnalyzer(out_a)
    for c in cases:
        a.add_case(*c)
    a.analyze_and_do_segmentation(batch_cases=1)

    out_b = str(tmp_path / "batched")
    b = LesionAnalyzer(out_b)
    for c in cases:
        b.add_case(*c)
    b.analyze_and_do_segmentation(batch_cases=3)

    import json

    for name, _, _, _, _ in cases:
        an_a = nifti.load_nifti_simple(os.path.join(out_a, name, "anomaly_score.nii.gz"))
        an_b = nifti.load_nifti_simple(os.path.join(out_b, name, "anomaly_score.nii.gz"))
        np.testing.assert_allclose(an_a, an_b, rtol=1e-3, atol=1e-3)
        ta = json.load(open(os.path.join(out_a, name, "summary.json")))["autoseg_threshold"]
        tb = json.load(open(os.path.join(out_b, name, "summary.json")))["autoseg_threshold"]
        np.testing.assert_allclose(ta, tb, rtol=1e-4)
        sa = nifti.load_nifti_simple(os.path.join(out_a, name, "segmentation_pp.nii.gz"))
        sb = nifti.load_nifti_simple(os.path.join(out_b, name, "segmentation_pp.nii.gz"))
        assert (sa == sb).mean() > 0.999


def test_batched_nll_mesh_sharded(tmp_path):
    """The case batch shards across a device mesh (batch 3 on 8 devices:
    padded with a repeated case, results stripped)."""
    import jax

    from deepwmh_tpu.parallel.mesh import make_mesh
    from deepwmh_tpu.pipeline.analysis import LesionAnalyzer

    if jax.device_count() < 2:
        import pytest

        pytest.skip("needs multiple devices")
    cases = _multi_case_cohort(tmp_path)
    out_a = str(tmp_path / "nomesh")
    a = LesionAnalyzer(out_a)
    for c in cases:
        a.add_case(*c)
    a.analyze_and_do_segmentation(batch_cases=3)

    out_m = str(tmp_path / "mesh")
    m = LesionAnalyzer(out_m)
    for c in cases:
        m.add_case(*c)
    m.analyze_and_do_segmentation(batch_cases=3, mesh=make_mesh())

    for name, _, _, _, _ in cases:
        an_a = nifti.load_nifti_simple(os.path.join(out_a, name, "anomaly_score.nii.gz"))
        an_m = nifti.load_nifti_simple(os.path.join(out_m, name, "anomaly_score.nii.gz"))
        np.testing.assert_allclose(an_a, an_m, rtol=1e-3, atol=1e-3)
