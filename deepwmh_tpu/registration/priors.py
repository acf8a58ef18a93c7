"""Anatomical tissue priors by atlas propagation.

Replaces the FreeSurfer `recon-all` aseg pathway the reference experiments
use to build per-subject tissue priors (~3.5 h/subject,
deepwmh/external_tools/FreeSurfer_aseg.py:26-94; SURVEY.md §2.1): register a
labeled atlas (the 4-class scheme of examples/Brain_label.nii.gz —
0 background, 1 cerebrum, 2 cerebellum+brainstem, 3 cortex) to each subject
with the framework's own affine+SVF registration and warp the labels across
(nearest neighbor). Runs in seconds per subject on TPU.

Also provides the exact FreeSurfer-aseg id remap of convert_FreeSurfer_aseg
(FreeSurfer_aseg.py:84-92) for users who already have aseg volumes.
"""

from __future__ import annotations

import numpy as np

# FreeSurfer aseg ids -> the 4-class scheme (FreeSurfer_aseg.py:84-92)
ASEG_CEREBELLUM_BRAINSTEM = (7, 8, 46, 47, 15, 16)
ASEG_CORTEX = (3, 42)


def convert_freesurfer_aseg(aseg: np.ndarray) -> np.ndarray:
    """aseg parcellation -> {0 bg, 1 cerebrum, 2 cerebellum+brainstem,
    3 cortex}."""
    aseg = np.around(np.asarray(aseg)).astype(np.int32)
    out = np.zeros_like(aseg)
    out[aseg > 0] = 1
    for i in ASEG_CEREBELLUM_BRAINSTEM:
        out[aseg == i] = 2
    for i in ASEG_CORTEX:
        out[aseg == i] = 3
    return out


def propagate_atlas(
    atlas_image,
    atlas_label,
    subject_image,
    atlas_spacing=(1.0, 1.0, 1.0),
    subject_spacing=(1.0, 1.0, 1.0),
    quick: bool = False,
    deformable: bool = True,
):
    """Register atlas -> subject; returns (label_on_subject, brain_mask).

    label_on_subject follows the atlas' class scheme (nearest neighbor);
    brain_mask = label > 0.
    """
    import jax.numpy as jnp

    from deepwmh_tpu.registration.affine import (
        AffineConfig,
        apply_affine,
        register_affine,
    )
    from deepwmh_tpu.registration.svf import SVFConfig, apply_affine_svf, register_svf

    if quick:
        a_cfg = AffineConfig(shrinks=(8, 4), iters=(100, 50))
        s_cfg = SVFConfig(shrinks=(4,), iters=(80,))
    else:
        a_cfg = AffineConfig()
        s_cfg = SVFConfig()

    fixed = np.asarray(subject_image, np.float32)
    moving = np.asarray(atlas_image, np.float32)
    matrix, _ = register_affine(
        fixed, moving, subject_spacing, atlas_spacing, cfg=a_cfg
    )
    if deformable:
        moving_on_fixed = np.asarray(
            apply_affine(moving, matrix, fixed.shape, subject_spacing, atlas_spacing)
        )
        disp, _ = register_svf(fixed, moving_on_fixed, cfg=s_cfg)
        label = np.asarray(
            apply_affine_svf(
                jnp.asarray(atlas_label, jnp.float32), matrix, disp,
                fixed.shape, subject_spacing, atlas_spacing, order=0,
            )
        )
    else:
        label = np.asarray(
            apply_affine(
                np.asarray(atlas_label, np.float32), matrix, fixed.shape,
                subject_spacing, atlas_spacing, order=0,
            )
        )
    brain_mask = (label > 0.5).astype(np.float32)
    return label, brain_mask


def synthetic_atlas(shape=(96, 112, 96), spacing=(2.0, 2.0, 2.0), seed=0):
    """Procedural 4-class brain atlas (image, label) in the scheme the
    reference documents for its priors contract
    (examples/Brain_labels.txt:1-6: 0 background, 1 cerebrum, 2 cerebellum
    + brainstem, 3 cerebral cortex).

    Geometry: an ellipsoidal head; the outer ~15% shell of the brain is
    cortex (3); a lower-posterior lobe plus a central-inferior stem form
    class 2; the interior remainder is cerebrum (1). The intensity image
    gives each tissue a distinct T2-FLAIR-like level plus smooth spatial
    modulation, which is what the affine+SVF registration keys on. It is a
    *stand-in*: it makes the priors pipeline runnable (and testable) from
    repo contents alone; for production use build the atlas from a real
    labeled subject (DeepWMH_priors --make-atlas --from-aseg)."""
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(
        *[np.linspace(-1.0, 1.0, s) for s in shape], indexing="ij"
    )
    # head ellipsoid (slightly anisotropic axes)
    r = np.sqrt((zz / 0.82) ** 2 + (yy / 0.92) ** 2 + (xx / 0.78) ** 2)
    brain = r < 1.0
    label = np.zeros(shape, np.int16)
    label[brain] = 1
    # cortex: outer shell
    label[brain & (r > 0.85)] = 3
    # cerebellum: posterior-inferior lobe
    cb = (
        np.sqrt(((zz + 0.45) / 0.38) ** 2 + ((yy + 0.55) / 0.42) ** 2
                + (xx / 0.5) ** 2) < 1.0
    )
    # brainstem: central-inferior column
    bs = (np.sqrt((yy * 0.0 + xx) ** 2 + (yy + 0.35) ** 2) < 0.14) & (
        zz > 0.1
    ) & (zz < 0.75)
    label[brain & (cb | bs)] = 2

    levels = {0: 0.0, 1: 210.0, 2: 190.0, 3: 160.0}
    image = np.zeros(shape, np.float32)
    for k, v in levels.items():
        image[label == k] = v
    # smooth modulation + light noise so similarity metrics have texture
    image *= 1.0 + 0.12 * np.cos(2.5 * zz) * np.cos(1.8 * yy)
    image += (rng.rand(*shape).astype(np.float32) - 0.5) * 6.0 * (label > 0)
    return image.astype(np.float32), label.astype(np.float32)
