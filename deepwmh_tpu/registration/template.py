"""Groupwise affine template construction.

Replaces ANTs `antsMultivariateTemplateConstruction2.sh` as used by the
reference's VoxelMorph pathway (deepwmh/external_tools/
VxM_group_registration.py:229-253: rigid init, affine template, 0 SyN
refinement iterations): iteratively affine-register every cohort image to
the current template and average the warped images, starting from the
cohort mean on a common grid.
"""

from __future__ import annotations

import numpy as np

from deepwmh_tpu.registration.affine import AffineConfig, apply_affine, register_affine


def build_affine_template(
    images,
    spacings=None,
    out_shape=None,
    out_spacing=(1.0, 1.0, 1.0),
    iterations: int = 3,
    cfg: AffineConfig = None,
    verbose: bool = True,
):
    """images: list of [D,H,W] arrays. Returns (template, matrices).

    matrices[i] maps template physical coords -> image i physical coords
    (the resampling transforms that produced the final average).
    """
    cfg = cfg or AffineConfig(shrinks=(4, 2), iters=(100, 50))
    n = len(images)
    spacings = spacings or [(1.0, 1.0, 1.0)] * n
    if out_shape is None:
        out_shape = tuple(
            int(np.median([im.shape[a] * spacings[i][a] / out_spacing[a]
                           for i, im in enumerate(images)]))
            for a in range(3)
        )

    # init: resample everything onto the template grid (identity transform)
    eye = np.eye(3, 4, dtype=np.float32)
    warped = [
        np.asarray(apply_affine(im, eye, out_shape, out_spacing, spacings[i]))
        for i, im in enumerate(images)
    ]
    template = np.mean(np.stack(warped), axis=0)

    matrices = [eye.copy() for _ in range(n)]
    for it in range(iterations):
        warped = []
        for i, im in enumerate(images):
            mat, loss = register_affine(
                template, im, out_spacing, spacings[i], cfg=cfg
            )
            matrices[i] = np.asarray(mat)
            warped.append(
                np.asarray(apply_affine(im, mat, out_shape, out_spacing, spacings[i]))
            )
            if verbose:
                print("template iter %d: image %d loss %.4f" % (it, i, loss), flush=True)
        template = np.mean(np.stack(warped), axis=0)
    return template, matrices
