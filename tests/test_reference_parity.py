"""Numerical parity against the REFERENCE implementation itself.

Runs the reference's own numpy stage-1 functions (mounted read-only at
/root/reference) through the exact nll_analysis compute sequence
(deepwmh/analysis/lesion_analysis.py:140-246, file IO stripped) on a
synthetic cohort, and asserts the TPU nll_analysis_core produces matching
anomaly maps / valid masks / auto-thresholds. Skips cleanly when the
reference tree is absent.

The reference's heavy external deps (nibabel, skimage, xlsxwriter, imageio,
openpyxl) are shimmed at module level — the pure functions under test never
touch them; skimage.threshold_otsu is recreated with its published 256-bin
inter-class-variance semantics so the Otsu masks are comparable.
"""

import os
import sys
import types
import warnings

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "deepwmh")),
    reason="reference tree not mounted",
)


def _shim_threshold_otsu(image, nbins=256):
    counts, bin_edges = np.histogram(np.asarray(image).ravel(), nbins)
    bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2
    counts = counts.astype(float)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * bin_centers) / np.maximum(w1, 1e-12)
    m2 = (
        np.cumsum((counts * bin_centers)[::-1]) / np.maximum(w2[::-1], 1e-12)
    )[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return bin_centers[:-1][np.argmax(var12)]


@pytest.fixture(scope="module")
def ref_modules():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import matplotlib

    matplotlib.use("Agg")
    # submodules the reference imports at module level (from X import Y)
    shims = (
        "nibabel", "nibabel.processing", "xlsxwriter", "xlsxwriter.format",
        "imageio", "openpyxl", "psutil",
    )
    for name in shims:
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                sys.modules[name] = mod
                if "." in name:
                    parent, child = name.rsplit(".", 1)
                    setattr(sys.modules[parent], child, mod)
    if not hasattr(sys.modules["xlsxwriter.format"], "Format"):
        sys.modules["xlsxwriter.format"].Format = type("Format", (), {})
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skf = types.ModuleType("skimage.filters")
        skf.threshold_otsu = _shim_threshold_otsu
        sk.filters = skf
        sys.modules["skimage"] = sk
        sys.modules["skimage.filters"] = skf

    # the reference's own code emits a SyntaxWarning at import
    # (misc.py's '-\|/' progress-animation literal) — not ours to fix
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        from deepwmh.analysis import image_ops as ref_ops  # noqa: E402
        from deepwmh.analysis import lesion_analysis as ref_la  # noqa: E402

    return ref_ops, ref_la


def make_cohort(shape=(32, 32, 24), K=3, seed=0):
    rng = np.random.RandomState(seed)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    brain = (r < 0.8).astype(np.float32)
    x = brain * (200 + 25 * np.cos(3 * g[0]) + 6 * rng.randn(*shape))
    x[14:19, 14:19, 10:14] += 150 * brain[14:19, 14:19, 10:14]  # lesion
    refs = np.stack(
        [
            brain * (200 + 25 * np.cos(3 * g[0]) + 6 * rng.randn(*shape))
            for _ in range(K)
        ]
    ).astype(np.float32)
    label1 = np.stack([brain] * K)
    label2 = np.stack([brain] * K)  # tissue class 1 = cerebrum
    return x.astype(np.float32), refs, label1, label2


def reference_nll_analysis(ref_ops, ref_la, x_raw, refs_raw, label1s, label2s,
                           patch, voxel):
    """The reference's nll_analysis compute sequence
    (lesion_analysis.py:140-246) on in-memory arrays, using ONLY the
    reference's own functions."""
    K = refs_raw.shape[0]
    m_i = [(l > 0.5).astype("float32") for l in label1s]
    m_rough = (ref_ops.group_mean(m_i) > 0.5).astype("int")

    x = ref_ops.z_score(x_raw.copy(), mask=m_rough)
    otsu_thr = _shim_threshold_otsu(np.where(m_rough < 0.5, x.min(), x))
    m_otsu = np.where(x > otsu_thr, 1, 0)
    m_valid = m_rough * m_otsu

    tissue_min = np.ma.masked_array(x, mask=1 - m_rough).min()
    x = np.where(m_rough < 0.5, tissue_min, x)

    x_i = []
    for i in range(K):
        t = ref_ops.z_score(refs_raw[i].copy(), mask=m_rough)
        tmin = np.ma.masked_array(t, mask=1 - m_rough).min()
        x_i.append(np.where(m_rough < 0.5, tmin, t))

    x_mu, _ = ref_ops.mean_std_grid(x, patch, mask=m_valid)
    for i in range(K):
        r_mu, _ = ref_ops.mean_std_grid(x_i[i], patch, mask=m_valid)
        x_i[i] = x_i[i] - r_mu + x_mu

    anomaly, x_mean, x_std = ref_la.nll(
        x, x_i, min_std=0.03, side="+", return_all=True
    )
    anomaly = anomaly * ref_ops.component_filtering(m_valid, voxel)

    anomaly_refs = [
        ref_la.nll(s, x_i, min_std=0.03, side="+") * m_valid for s in x_i
    ]
    curve_x, curve_y, curve_r, curve_rs = ref_la.histogram_analysis(
        anomaly, anomaly_refs, mask=m_valid
    )
    crossings = []
    for i in range(len(curve_rs)):
        for j in range(len(curve_rs[i]) - 1, 0, -1):
            if curve_rs[i][j] > 0.01:
                crossings.append(curve_x[j])
                break
    threshold = float(np.median(np.sort(crossings)))

    y_i = [l for l in label2s]
    averaged_label = ref_ops.average_contiguous_labels(y_i)
    anomaly = anomaly * (averaged_label > 0.5).astype("float32")
    cb_mask = ((1.5 < averaged_label) * (averaged_label < 2.5)).astype("float32")
    anomaly_cb = ref_ops.median_3mm(anomaly, voxel)
    anomaly = np.where(cb_mask > 0.5, anomaly_cb, anomaly)
    tissue_sum = np.zeros(m_valid.shape, "float32")
    for t in y_i:
        tissue_sum += (t > 0.5).astype("float32")
    anomaly = anomaly * (tissue_sum > (K / 2)).astype("float32")
    return anomaly, m_valid.astype(np.float32), threshold


def test_nll_analysis_matches_reference(ref_modules):
    import jax.numpy as jnp

    from deepwmh_tpu.pipeline.analysis import nll_analysis_core

    ref_ops, ref_la = ref_modules
    x, refs, l1, l2 = make_cohort()
    voxel = (2.0, 2.0, 2.0)
    patch = [25, 25, 25]  # ceil(50mm / 2mm)

    ref_anomaly, ref_valid, ref_thr = reference_nll_analysis(
        ref_ops, ref_la, x, refs, l1, l2, patch, voxel
    )

    out = nll_analysis_core(
        jnp.asarray(x), jnp.asarray(refs), jnp.asarray(l1), jnp.asarray(l2),
        patch_size=tuple(patch), voxel_size=voxel, num_label_classes=4,
        side="+", apply_otsu=True, mean_correction=True,
    )
    got_anomaly = np.asarray(out[0])
    got_valid = np.asarray(out[1])
    got_thr = float(out[8])

    # valid masks: Otsu bin edges may disagree on a handful of boundary
    # voxels between the two implementations
    agree = (got_valid > 0.5) == (ref_valid > 0.5)
    assert agree.mean() > 0.995, "valid masks diverge: %.4f" % agree.mean()

    # anomaly maps on voxels where both masks agree
    both = (got_valid > 0.5) & (ref_valid > 0.5)
    a, b = got_anomaly[both], ref_anomaly[both]
    denom = np.abs(b).max() + 1e-6
    rel_err = np.abs(a - b).max() / denom
    assert rel_err < 5e-3, "anomaly maps diverge: rel max err %.4g" % rel_err
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, "anomaly correlation %.5f" % corr

    # auto-threshold within one histogram bin
    bin_w = np.abs(np.diff(np.asarray(out[4]))).max() + 1e-6
    assert abs(got_thr - ref_thr) <= bin_w + 1e-6, (
        "threshold %.4f vs reference %.4f" % (got_thr, ref_thr)
    )

    # the lesion is detected by BOTH at the shared threshold
    seg_got = got_anomaly > got_thr
    seg_ref = ref_anomaly > ref_thr
    lesion = np.zeros_like(seg_got)
    lesion[14:19, 14:19, 10:14] = True
    assert (seg_got & lesion).sum() / lesion.sum() > 0.5
    inter = (seg_got & seg_ref).sum()
    dice = 2 * inter / max(seg_got.sum() + seg_ref.sum(), 1)
    assert dice > 0.95, "segmentations diverge: dice %.4f" % dice


def test_pure_ops_match_reference(ref_modules):
    """Direct golden checks of the hot pure functions vs the reference."""
    ref_ops, ref_la = ref_modules
    rng = np.random.RandomState(1)
    x = rng.rand(20, 22, 18).astype(np.float32) * 100
    mask = (rng.rand(20, 22, 18) > 0.3).astype(np.float32)

    from deepwmh_tpu.ops.stats import z_score as tpu_z
    got = np.asarray(tpu_z(x, mask=mask))
    want = ref_ops.z_score(x.copy(), mask=mask)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    from deepwmh_tpu.ops.grid import mean_std_grid as tpu_grid
    gm, gs = tpu_grid(x, (7, 7, 7), mask=mask)
    wm, ws = ref_ops.mean_std_grid(x, [7, 7, 7], mask=mask)
    np.testing.assert_allclose(np.asarray(gm), wm, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs), ws, rtol=1e-3, atol=2e-3)

    from deepwmh_tpu.ops.nll import nll as tpu_nll
    refs = [rng.rand(20, 22, 18).astype(np.float32) for _ in range(4)]
    got = np.asarray(tpu_nll(x, np.stack(refs), min_std=0.03, side="+"))
    want = ref_la.nll(x, refs, min_std=0.03, side="+")
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_morphology_ops_match_reference(ref_modules):
    """Golden checks of the remaining pure image ops vs the reference
    implementations themselves (image_ops.py:23-421)."""
    ref_ops, _ = ref_modules
    rng = np.random.RandomState(2)
    mask = (rng.rand(18, 20, 16) > 0.72).astype(np.float32)

    from deepwmh_tpu.ops.components import (
        average_contiguous_labels,
        component_filtering,
        remove_3mm_sparks,
        remove_sparks,
    )

    got = np.asarray(remove_sparks(mask, min_volume=3))
    want = ref_ops.remove_sparks(mask.copy(), min_volume=3)
    np.testing.assert_array_equal(got, want)

    for voxel in [(1.0, 1.0, 1.0), (0.9, 0.9, 6.0)]:  # iso + thick-slice
        got = np.asarray(remove_3mm_sparks(mask, voxel))
        want = ref_ops.remove_3mm_sparks(mask.copy(), list(voxel))
        np.testing.assert_array_equal(got, want, err_msg=str(voxel))

    from deepwmh_tpu.ops.filters import median_3mm

    data = (rng.rand(14, 15, 13) * 50).astype(np.float32)
    for voxel in [(2.0, 2.0, 2.0), (1.0, 1.0, 5.0)]:
        got = np.asarray(median_3mm(data, voxel))
        want = ref_ops.median_3mm(data.copy(), list(voxel))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(voxel))

    # brain-shaped blob + speckle: per-slice largest-component cleanup
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in (20, 22, 18)], indexing="ij")
    brain = (np.sqrt(sum(a**2 for a in g)) < 0.75).astype(np.float32)
    speckle = (rng.rand(20, 22, 18) > 0.97).astype(np.float32)
    noisy = np.clip(brain + speckle, 0, 1)
    for voxel in [(1.0, 1.0, 1.0), (1.0, 1.0, 4.0)]:
        got = np.asarray(component_filtering(noisy, voxel))
        want = ref_ops.component_filtering(noisy.copy(), list(voxel))
        np.testing.assert_array_equal(got, want, err_msg=str(voxel))

    labels = [
        rng.randint(0, 4, (10, 11, 9)).astype(np.float32) for _ in range(5)
    ]
    got = np.asarray(average_contiguous_labels(np.stack(labels), num_classes=4))
    want = ref_ops.average_contiguous_labels([l.copy() for l in labels])
    np.testing.assert_array_equal(got, want)

    from deepwmh_tpu.ops.stats import group_mean, group_std

    stack = [rng.rand(9, 8, 7).astype(np.float32) * 10 for _ in range(4)]
    masks = [(rng.rand(9, 8, 7) > 0.3).astype(np.float32) for _ in range(4)]
    np.testing.assert_allclose(
        np.asarray(group_mean(np.stack(stack), np.stack(masks))),
        ref_ops.group_mean([s.copy() for s in stack], masks=[m.copy() for m in masks]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(group_std(np.stack(stack), np.stack(masks))),
        ref_ops.group_std([s.copy() for s in stack], masks=[m.copy() for m in masks]),
        rtol=1e-4, atol=1e-4,
    )


def test_metric_formulas_match_reference():
    """hard_dice_binary and voxel_precision_recall are pure formulas
    (reference metrics.py:26-44) — compare without importing the module
    (its top-level imports need statsmodels): the formulas are asserted
    against a literal re-statement here, then our implementations against
    that. The reference's inst_confusion_matrix (metrics.py:46-76) loops
    component ids 0..max-1 (including background, excluding the last
    component); ours implements the stated semantics instead, so only the
    voxel-level metrics are compared exactly."""
    rng = np.random.RandomState(3)
    t = (rng.rand(15, 14, 13) > 0.8).astype(np.float32)
    p = (rng.rand(15, 14, 13) > 0.8).astype(np.float32)

    from deepwmh_tpu.eval.metrics import hard_dice_binary, voxel_precision_recall

    want_dice = 2 * np.sum(t * p) / (np.sum(t) + np.sum(p) + 0.000001)
    assert abs(hard_dice_binary(t, p) - want_dice) < 1e-6

    tp = np.sum((t > 0.5) & (p > 0.5))
    fp = np.sum(~(t > 0.5) & (p > 0.5))
    fn = np.sum((t > 0.5) & ~(p > 0.5))
    ppv, tpr = voxel_precision_recall(p, t)
    assert abs(ppv - tp / (tp + fp)) < 1e-6
    assert abs(tpr - tp / (tp + fn)) < 1e-6
