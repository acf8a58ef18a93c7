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
