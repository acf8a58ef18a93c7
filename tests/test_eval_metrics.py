import numpy as np

from deepwmh_tpu.eval.metrics import (
    PairedEvaluation,
    binary_component_dice,
    hard_dice_binary,
    instance_confusion,
    instance_f1,
    summarize,
    voxel_precision_recall,
)


def test_hard_dice():
    a = np.zeros((8, 8, 8))
    b = np.zeros((8, 8, 8))
    a[:4] = 1
    b[:4] = 1
    assert hard_dice_binary(a, b) == 1.0
    b[:] = 0
    b[2:6] = 1
    np.testing.assert_allclose(hard_dice_binary(a, b), 0.5)
    assert hard_dice_binary(np.zeros((4, 4, 4)), np.zeros((4, 4, 4))) == 1.0


def test_precision_recall():
    t = np.zeros((8, 8, 8))
    t[:4] = 1
    p = np.zeros((8, 8, 8))
    p[2:6] = 1
    prec, rec = voxel_precision_recall(p, t)
    np.testing.assert_allclose(prec, 0.5)
    np.testing.assert_allclose(rec, 0.5)


def test_instance_metrics():
    t = np.zeros((12, 12, 12))
    t[1:3, 1:3, 1:3] = 1  # lesion A
    t[8:10, 8:10, 8:10] = 1  # lesion B
    p = np.zeros((12, 12, 12))
    p[1:3, 1:3, 1:3] = 1  # hits A
    p[5:6, 5:6, 5:6] = 1  # false positive
    tp, fp, fn = instance_confusion(p, t)
    assert (tp, fp, fn) == (1, 1, 1)
    np.testing.assert_allclose(instance_f1(p, t), 2 * 1 / (2 * 1 + 1 + 1))


def test_component_dice():
    t = np.zeros((10, 10, 10))
    t[1:4, 1:4, 1:4] = 1
    p = t.copy()
    out = binary_component_dice(p, t)
    assert len(out) == 1
    size, dice = out[0]
    assert size == 27 and dice == 1.0


def test_paired_evaluation(tmp_path, rng):
    from deepwmh_tpu.core import nifti

    a = (rng.rand(8, 8, 8) > 0.5).astype(np.float32)
    b = (rng.rand(8, 8, 8) > 0.5).astype(np.float32)
    pa = str(tmp_path / "a.nii.gz")
    pb = str(tmp_path / "b.nii.gz")
    nifti.save_nifti_simple(a, pa)
    nifti.save_nifti_simple(b, pb)
    ev = PairedEvaluation()
    ev.add_pair("c1", pa, pb)
    ev.add_pair("c2", pa, pa)
    res = ev.run(metrics=("dice", "precision_recall"))
    assert res["c2"]["dice"] == 1.0
    assert 0 <= res["c1"]["dice"] <= 1
    s = summarize(res)
    assert s["dice"]["n"] == 2


def test_priors_remap():
    from deepwmh_tpu.registration.priors import convert_freesurfer_aseg

    aseg = np.array([[0, 2, 3], [7, 15, 42]], np.float32)
    out = convert_freesurfer_aseg(aseg)
    np.testing.assert_allclose(out, [[0, 1, 3], [2, 2, 3]])


def test_template_construction(rng):
    from deepwmh_tpu.registration.template import build_affine_template
    from deepwmh_tpu.registration.affine import AffineConfig

    g = np.meshgrid(*[np.linspace(-1, 1, 20)] * 3, indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    base = np.where(r < 0.7, 200.0, 0.0).astype(np.float32)
    base[4:8, 10:14, 6:10] += 150
    imgs = [
        np.roll(base, shift, axis=0) + 5 * rng.rand(20, 20, 20).astype(np.float32)
        for shift in (-2, 0, 2)
    ]
    cfg = AffineConfig(shrinks=(2,), iters=(60,), do_affine=False)
    template, mats = build_affine_template(
        imgs, iterations=1, cfg=cfg, verbose=False, out_spacing=(1, 1, 1)
    )
    assert template.shape == (20, 20, 20)
    assert len(mats) == 3
    # template should correlate with the unshifted base better than a naive mean
    naive = np.mean(np.stack(imgs), axis=0)
    m = base > 50
    cc_t = np.corrcoef(template[m], base[m])[0, 1]
    cc_n = np.corrcoef(naive[m], base[m])[0, 1]
    assert cc_t > cc_n - 0.02  # at minimum not worse; usually clearly better
