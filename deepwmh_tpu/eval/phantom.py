"""Realistic synthetic FLAIR cohort generator — the accuracy north-star proxy.

The reference validates end-to-end accuracy on real OASIS-3 cohorts (voxel
Dice vs two expert raters, experiments/010_OASIS3/run_Siemens_Biograph_mMR.py
:266-300, deepwmh/analysis/metrics.py:26-32). Real MRI data is not available
in this environment, so this module provides the closest honest stand-in:

  - ONE base head with the reference's 4-class tissue topology
    (0 background, 1 cerebrum, 2 cerebellum+brainstem, 3 cortex — the exact
    aseg remap of deepwmh/external_tools/FreeSurfer_aseg.py:84-92) plus
    CSF-dark ventricles,
  - per-subject DISTINCT anatomy: a smooth random diffeomorphism (low-res
    gaussian velocity integrated by scaling-and-squaring) composed with a
    small random affine — so inter-subject registration is a genuine
    anatomy-matching problem, not self-recovery,
  - per-subject multiplicative bias field, global gain jitter and noise
    (what N4 + z-scoring must absorb),
  - graded hyperintense WM lesions with soft boundaries and known binary
    ground truth (what the 3-stage pipeline must segment).

Used by tests/test_e2e_accuracy.py (train->predict Dice floor), bench.py's
e2e_dice_synthetic section, and the non-circular registration quality
benchmark (two distinct anatomies with shared label topology).

Everything is deterministic given (shape, seed).
"""

from __future__ import annotations

import contextlib
import os

import numpy as np


def _host_compute():
    """Pin phantom synthesis to the host CPU backend when one exists.

    Subject generation is a handful of SMALL jax programs (smooth-noise
    fields, scaling-and-squaring, two nearest-neighbor warps) dispatched
    many times per subject; on a remote-attached TPU the per-dispatch
    round-trips dominate — measured 217 s of an 879 s end-to-end run was
    cohort generation alone. The CPU backend runs the same programs in
    milliseconds and frees the TPU queue for the pipeline under test."""
    try:
        import jax

        return jax.default_device(jax.devices("cpu")[0])
    except Exception:  # CPU platform unavailable: run wherever default is
        return contextlib.nullcontext()

# FLAIR-like mean intensities per structure. CSF is dark (FLAIR nulls it),
# cortex/GM brighter than WM, lesions hyperintense ABOVE cortex so the
# one-sided '+' NLL prior applies (deepwmh/analysis/lesion_analysis.py:183)
INTENSITY = {
    "wm": 300.0,
    "cortex": 360.0,
    "cerebellum": 330.0,
    "csf": 110.0,
    "lesion_amp": 170.0,  # additive at lesion core
}


def _norm_grid(shape):
    return np.meshgrid(
        *[np.linspace(-1.0, 1.0, s, dtype=np.float32) for s in shape],
        indexing="ij",
    )


def base_tissue(shape):
    """The base head: (tissue uint8 [D,H,W] in {0,1,2,3}, csf mask bool).

    Axis 0 = inferior->superior, axis 1 = posterior->anterior, axis 2 =
    left->right. CSF ventricles are inside class 1 (aseg ids {4,43} remap to
    cerebrum in the reference, FreeSurfer_aseg.py:84-92) but dark on FLAIR.
    """
    g = _norm_grid(shape)
    # brain ellipsoid, slightly prolate along the AP axis
    r = np.sqrt((g[0] / 0.78) ** 2 + (g[1] / 0.88) ** 2 + (g[2] / 0.74) ** 2)
    brain = r < 1.0
    cortex = (r >= 0.82) & brain

    # cerebellum + brainstem: inferior-posterior ellipsoid
    rc = np.sqrt(
        ((g[0] + 0.52) / 0.34) ** 2
        + ((g[1] + 0.42) / 0.40) ** 2
        + (g[2] / 0.46) ** 2
    )
    cereb = (rc < 1.0) & brain

    # lateral ventricles: two small CSF ellipsoids inside the cerebrum
    csf = np.zeros(shape, bool)
    for sx in (-0.14, 0.14):
        rv = np.sqrt(
            ((g[0] - 0.08) / 0.30) ** 2
            + ((g[1] - 0.05) / 0.22) ** 2
            + ((g[2] - sx) / 0.09) ** 2
        )
        csf |= rv < 1.0
    csf &= brain & ~cortex & ~cereb

    tissue = np.zeros(shape, np.uint8)
    tissue[brain] = 1
    tissue[cortex] = 3
    tissue[cereb] = 2
    return tissue, csf


def _smooth_noise(shape, rng, down=6, sigma=1.2):
    """Smooth random scalar field ~N(0,1) at full resolution: low-res
    gaussian noise, gaussian-smoothed, linearly upsampled, renormalized."""
    import jax.numpy as jnp

    from deepwmh_tpu.ops.grid import _linear_resize_axis
    from deepwmh_tpu.registration.svf import _smooth3

    lo = [max(s // down, 4) for s in shape]
    f = rng.randn(*lo).astype(np.float32)
    f = np.asarray(_smooth3(jnp.asarray(f)[None].repeat(3, 0), sigma))[0]
    x = jnp.asarray(f)
    for ax in range(3):
        x = _linear_resize_axis(x, ax, int(shape[ax]))
    x = np.asarray(x)
    return (x - x.mean()) / max(x.std(), 1e-6)


def random_diffeo(shape, rng, max_disp_vox=5.0):
    """Smooth random diffeomorphic displacement [3,D,H,W] (voxel units):
    random low-res velocity, integrated with scaling-and-squaring — the same
    transform family the SVF registration estimates, but generated
    independently of any image."""
    import jax.numpy as jnp

    from deepwmh_tpu.registration.svf import scaling_and_squaring

    v = np.stack([_smooth_noise(shape, rng) for _ in range(3)])
    mag = np.sqrt((v**2).sum(0)).max()
    v = v * (max_disp_vox / max(mag, 1e-6))
    disp = scaling_and_squaring(jnp.asarray(v), n=4)
    return np.asarray(disp)


def random_affine(rng, shape, max_rot_deg=5.0, max_scale=0.05, max_shift_vox=3.0):
    """Small random rigid+scale matrix [3,4] in voxel coordinates, applied
    about the volume center (the rotation is baked into the translation:
    input = A(o - c) + c + t)."""
    import jax.numpy as jnp

    from deepwmh_tpu.ops.warp import rotation_matrix

    ang = np.deg2rad(rng.uniform(-max_rot_deg, max_rot_deg, 3)).astype(np.float32)
    R = np.asarray(rotation_matrix(jnp.asarray(ang)))
    S = np.diag(1.0 + rng.uniform(-max_scale, max_scale, 3)).astype(np.float32)
    A = (R @ S).astype(np.float32)
    t = rng.uniform(-max_shift_vox, max_shift_vox, 3).astype(np.float32)
    c = (np.asarray(shape, np.float32) - 1.0) / 2.0
    t_centered = c - A @ c + t
    return np.concatenate([A, t_centered[:, None]], axis=1).astype(np.float32)


def _erode(mask, r):
    """r-step 6-neighborhood erosion via np.roll (small volumes only)."""
    out = mask.copy()
    for _ in range(r):
        nxt = out.copy()
        for ax in range(3):
            nxt &= np.roll(out, 1, ax) & np.roll(out, -1, ax)
        out = nxt
    return out


def make_lesions(tissue, csf, rng, n_lesions=(2, 5), radius_vox=(2.0, 4.5)):
    """Graded hyperintense WM lesions: (additive intensity field, binary GT).

    Centers are sampled inside eroded cerebral WM (class 1, non-CSF) so every
    lesion is fully surrounded by WM; each lesion is a gaussian profile whose
    half-maximum isosurface is the ground-truth boundary (soft edges, like
    real WMH halos)."""
    shape = tissue.shape
    wm = (tissue == 1) & ~csf
    n = rng.randint(n_lesions[0], n_lesions[1] + 1)
    add = np.zeros(shape, np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    placed = 0
    seed_region = _erode(wm, 5)
    idx = np.argwhere(seed_region)
    if len(idx) == 0:
        seed_region = _erode(wm, 2)
        idx = np.argwhere(seed_region)
    while placed < n and len(idx) > 0:
        c = idx[rng.randint(len(idx))]
        rad = rng.uniform(*radius_vox)
        d = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
        # sigmoid radial profile: value 0.5 exactly at d = rad with a
        # <1-voxel soft edge — real WMH are sharply demarcated on FLAIR.
        # A wider profile leaks above-noise intensity OUTSIDE the
        # half-maximum ground-truth boundary (measured: a 0.7-width edge
        # leaves a +32 ring one voxel out, and every pipeline FP was that
        # halo), which penalizes the pipeline for segmenting exactly what
        # the image shows; 0.4 puts the first outside voxel at +13,
        # below the +-15 texture noise
        prof = 1.0 / (1.0 + np.exp(-(rad - d) / 0.4))
        add = np.maximum(add, prof.astype(np.float32))
        placed += 1
    gt = (add > 0.5) & wm
    return add * INTENSITY["lesion_amp"] * wm, gt.astype(np.uint8)


def make_subject(shape, seed, lesion=False, max_disp_vox=5.0, bias_amp=0.15,
                 noise_sigma=8.0):
    """One synthetic subject. Returns a dict:

      flair      float32 [D,H,W]
      label1     uint8 brain mask   (the reference's label1 contract)
      label2     uint8 tissue class (0 bg, 1 cerebrum, 2 cereb+stem, 3 cortex)
      lesion_gt  uint8 ground-truth lesion mask (zeros when lesion=False)

    Anatomy = base head warped by a per-subject random diffeo composed with a
    small random affine; labels are warped nearest-neighbor FIRST and the
    intensity image is synthesized from the warped labels, so tissue edges
    stay crisp and the GT is exact.

    All device compute runs on the host CPU backend (_host_compute): the
    warp chain is a few small programs where dispatch latency, not FLOPs,
    dominates on a remote accelerator."""
    with _host_compute():
        return _make_subject_impl(shape, seed, lesion, max_disp_vox,
                                  bias_amp, noise_sigma)


def _make_subject_impl(shape, seed, lesion, max_disp_vox, bias_amp,
                       noise_sigma):
    import jax.numpy as jnp

    from deepwmh_tpu.ops.warp import compose_affine_then_disp, sample_volume

    rng = np.random.RandomState(seed)
    tissue, csf = base_tissue(shape)

    disp = random_diffeo(shape, rng, max_disp_vox=max_disp_vox)
    mat = random_affine(rng, shape)
    # compose_affine_then_disp returns pull-back COORDS [3,D,H,W]
    coords = compose_affine_then_disp(jnp.asarray(mat), jnp.asarray(disp))

    t_w = np.asarray(
        sample_volume(jnp.asarray(tissue.astype(np.float32)), coords, order=0)
    ).astype(np.uint8)
    csf_w = np.asarray(
        sample_volume(jnp.asarray(csf.astype(np.float32)), coords, order=0)
    ) > 0.5

    flair = np.zeros(shape, np.float32)
    flair[(t_w == 1) & ~csf_w] = INTENSITY["wm"]
    flair[t_w == 2] = INTENSITY["cerebellum"]
    flair[t_w == 3] = INTENSITY["cortex"]
    flair[csf_w] = INTENSITY["csf"]

    # smooth intra-tissue texture + per-subject bias field + gain + noise
    flair += 15.0 * _smooth_noise(shape, rng) * (t_w > 0)

    lesion_gt = np.zeros(shape, np.uint8)
    if lesion:
        add, lesion_gt = make_lesions(t_w, csf_w, rng)
        flair += add

    bias = np.exp(bias_amp * _smooth_noise(shape, rng, down=10, sigma=2.0))
    gain = rng.uniform(0.9, 1.1)
    flair = flair * bias.astype(np.float32) * gain
    flair += noise_sigma * rng.randn(*shape).astype(np.float32)
    flair = np.maximum(flair, 0.0)

    return {
        "flair": flair.astype(np.float32),
        "label1": (t_w > 0).astype(np.uint8),
        "label2": t_w,
        "lesion_gt": lesion_gt,
    }


def cohort_geometry(shape, spacing, shapes, spacings, index):
    """Per-subject (shape, spacing) for cohort position `index`.

    `shapes`/`spacings` are optional per-subject cycles: subject i gets
    shapes[i % len(shapes)] and spacings[i % len(spacings)] — the
    reference's normal operating regime, where every scan in a cohort has
    its own volume size and voxel spacing (the reference prepares per-case
    geometry in deepwmh/pipeline/DCNN_multistage.py:39-93; this framework's
    answer is pad-and-bucket, unet/preprocess.padded_shape). None falls
    back to the homogeneous (shape, spacing)."""
    sh = tuple(shapes[index % len(shapes)]) if shapes else tuple(shape)
    sp = tuple(spacings[index % len(spacings)]) if spacings else tuple(spacing)
    return sh, sp


def write_cohort(out_dir, shape=(64, 80, 64), spacing=(2.0, 2.0, 2.0),
                 n_ref=3, n_train=3, seed=0, max_disp_vox=5.0,
                 shapes=None, spacings=None):
    """Write a full train-ready cohort. Returns
    (reference_csv, training_csv, {case: lesion_gt_path}).

    CSV columns follow the DeepWMH_train contract
    (deepwmh/main/train.py:66-106; examples/Example_reference.csv):
    reference = healthy subjects with label1/label2, training = patients.

    `shapes`/`spacings` (optional lists) make the cohort HETEROGENEOUS:
    subject i (references first, then patients, one running index) gets
    shapes[i % len], spacings[i % len] — see cohort_geometry."""
    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.core.manifests import write_csv_simple

    os.makedirs(out_dir, exist_ok=True)

    def _hdr(sh, sp):
        hdr = nifti.NiftiHeader()
        hdr.set_shape(sh)
        hdr.set_zooms(sp)
        return hdr

    ref_rows = {"case": [], "desc": [], "flair": [], "label1": [], "label2": []}
    for i in range(n_ref):
        sh, sp = cohort_geometry(shape, spacing, shapes, spacings, i)
        sub = make_subject(sh, seed=seed + i, lesion=False,
                           max_disp_vox=max_disp_vox)
        case = "REF%02d" % i
        paths = {
            k: os.path.join(out_dir, "%s_%s.nii.gz" % (case, k))
            for k in ("flair", "label1", "label2")
        }
        for k, p in paths.items():
            nifti.save_nifti(sub[k].astype(np.float32), _hdr(sh, sp), p)
        ref_rows["case"].append(case)
        ref_rows["desc"].append("healthy")
        for k in ("flair", "label1", "label2"):
            ref_rows[k].append(paths[k])

    train_rows = {"case": [], "desc": [], "flair": []}
    gt_paths = {}
    for i in range(n_train):
        sh, sp = cohort_geometry(shape, spacing, shapes, spacings, n_ref + i)
        sub = make_subject(sh, seed=seed + 1000 + i, lesion=True,
                           max_disp_vox=max_disp_vox)
        case = "SUB%02d" % i
        fp = os.path.join(out_dir, "%s_flair.nii.gz" % case)
        gp = os.path.join(out_dir, "%s_lesion_gt.nii.gz" % case)
        nifti.save_nifti(sub["flair"], _hdr(sh, sp), fp)
        nifti.save_nifti(sub["lesion_gt"].astype(np.float32), _hdr(sh, sp), gp)
        train_rows["case"].append(case)
        train_rows["desc"].append("patient")
        train_rows["flair"].append(fp)
        gt_paths[case] = gp

    ref_csv = os.path.join(out_dir, "reference.csv")
    train_csv = os.path.join(out_dir, "training.csv")
    write_csv_simple(ref_csv, ref_rows)
    write_csv_simple(train_csv, train_rows)
    return ref_csv, train_csv, gt_paths
