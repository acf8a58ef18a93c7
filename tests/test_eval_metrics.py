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


def test_component_dice_oversegmentation_counts_against():
    """The prediction's FULL component extent enters the per-lesion Dice
    (reference metrics.py:304-325) — over-segmentation is penalized."""
    t = np.zeros((12, 12, 12))
    t[4:6, 4:6, 4:6] = 1  # 8-voxel lesion
    p = np.zeros_like(t)
    p[2:8, 2:8, 2:8] = 1  # 216-voxel blob fully covering it
    ((size, dice),) = binary_component_dice(p, t)
    assert size == 8
    np.testing.assert_allclose(dice, 2 * 8 / (8 + 216))


def _golden_component_dice(y_true, y_pred):
    """Independent slow golden model of the reference semantics
    (metrics.py:304-325), written set-wise: per truth lesion L, the
    prediction operand is the union of every predicted component that
    touches L, with voxels of OTHER truth lesions excluded; score is
    Dice(L, that union)."""
    from scipy import ndimage

    truth_fg = np.asarray(y_true) > 0.5
    pred_fg = np.asarray(y_pred) > 0.5
    truth_lbl, n_truth = ndimage.label(truth_fg)
    pred_lbl, _ = ndimage.label(pred_fg)
    results = []
    for lesion_id in range(1, n_truth + 1):
        lesion = truth_lbl == lesion_id
        touching = set(np.unique(pred_lbl[lesion])) - {0}
        union = np.zeros_like(pred_fg)
        for pid in touching:
            union |= pred_lbl == pid
        union &= ~(truth_fg & ~lesion)  # other lesions' voxels drop out
        overlap = int(np.count_nonzero(lesion & union))
        total = int(np.count_nonzero(lesion)) + int(np.count_nonzero(union))
        results.append(
            (int(np.count_nonzero(lesion)),
             2.0 * overlap / total if total else 1.0))
    return sorted(results, key=lambda e: e[0])


def test_component_dice_matches_reference_golden(rng):
    for trial in range(5):
        t = (rng.rand(14, 14, 14) > 0.8).astype(np.float32)
        p = (rng.rand(14, 14, 14) > 0.8).astype(np.float32)
        got = binary_component_dice(p, t)
        want = _golden_component_dice(t, p)
        assert len(got) == len(want)
        # sizes must match exactly; pair dices by sorting (equal-size
        # components may legitimately order differently)
        for (gs, gd), (ws, wd) in zip(
            sorted(got), sorted(want)
        ):
            assert gs == ws
            np.testing.assert_allclose(gd, wd, atol=1e-12)


def test_summarize_component_dice_lists():
    """summarize() aggregates list-valued component_dice rows over all
    lesions instead of crashing on ragged case lists (review regression)."""
    from deepwmh_tpu.eval.metrics import summarize

    res = {
        "c1": {"dice": 0.5, "component_dice": [(10, 1.0), (5, 0.5)]},
        "c2": {"dice": 0.7, "component_dice": [(3, 0.0)]},
    }
    out = summarize(res)
    np.testing.assert_allclose(out["dice"]["mean"], 0.6)
    np.testing.assert_allclose(out["component_dice"]["mean"], 0.5)
    assert out["component_dice"]["n"] == 3
    assert summarize({"c": {"component_dice": []}})["component_dice"]["n"] == 0


def test_method_evaluation_subclasses(tmp_path, rng):
    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.eval.metrics import (
        BinaryComponentDiceEvaluation,
        InstanceF1Evaluation,
        InstancePrecisionRecallEvaluation,
        VoxelPrecisionRecallEvaluation,
    )

    t = np.zeros((10, 10, 10), np.float32)
    t[1:4, 1:4, 1:4] = 1
    p = np.zeros_like(t)
    p[1:4, 1:4, 1:4] = 1
    p[6:8, 6:8, 6:8] = 1  # false-positive lesion
    pt = str(tmp_path / "t.nii.gz")
    pp = str(tmp_path / "p.nii.gz")
    nifti.save_nifti_simple(t, pt)
    nifti.save_nifti_simple(p, pp)

    def mk(ev_cls):
        ev = ev_cls(["s1"])
        ev.add_method("truth", lambda c: pt)
        ev.add_method("pred", lambda c: pp)
        ev.add_method("missing", lambda c: None)
        return ev

    (pr,) = mk(VoxelPrecisionRecallEvaluation).run_eval("truth", "pred",
                                                        num_workers=1)
    np.testing.assert_allclose(pr, (27 / 35, 1.0))  # precision, recall
    (conf,) = mk(InstancePrecisionRecallEvaluation).run_eval(
        "truth", "pred", num_workers=1)
    assert conf == (1, 1, 0)  # tp, fp, fn
    (f1,) = mk(InstanceF1Evaluation).run_eval("truth", "pred", num_workers=1)
    np.testing.assert_allclose(f1, 2 / 3)
    (cd,) = mk(BinaryComponentDiceEvaluation).run_eval("truth", "pred",
                                                       num_workers=1)
    assert cd == [(27, 1.0)]
    # allow_null: a None file evaluates as all-background
    import pytest

    ev = mk(InstanceF1Evaluation)
    with pytest.raises(RuntimeError, match="NULL"):
        ev.run_eval("truth", "missing", num_workers=1)
    (f1n,) = ev.run_eval("truth", "missing", num_workers=1, allow_null=True)
    np.testing.assert_allclose(f1n, 0.0)


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
