"""Component selection and misc voxel utilities.

Rebuild of the reference's ComponentSelection class and leftovers of
image_ops (deepwmh/analysis/image_ops.py:369-377 gaussian_noise_2x2x2,
:423-489 ComponentSelection, :491-499 binarize_image). Selection runs on
device: label once, compute per-component overlap statistics with
scatter-adds, and keep components by the chosen rule — no per-component
Python loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from deepwmh_tpu.ops.components import label_components

SELECT_METHODS = ("window", "crossing", "masking")


def select_components(mask, selection, method: str = "crossing"):
    """Select connected components of `mask` using a `selection` mask.

    window:   keep components entirely inside the selection
    crossing: keep components overlapping the selection anywhere
    masking:  plain voxelwise mask
    (reference image_ops.py:445-456)
    """
    assert method in SELECT_METHODS, method
    m = mask > 0.5
    sel = (selection > 0.5).astype(jnp.float32)
    if method == "masking":
        return (m & (sel > 0.5)).astype(jnp.float32)

    N = int(m.size)
    lbl = label_components(m)
    flat = lbl.reshape(-1)
    fg = (flat < N).astype(jnp.float32)
    # per-component voxel count and in-selection count
    total = jnp.zeros((N + 1,), jnp.float32).at[flat].add(fg)
    inside = jnp.zeros((N + 1,), jnp.float32).at[flat].add(fg * sel.reshape(-1))
    tot_v = total[jnp.minimum(flat, N)].reshape(m.shape)
    ins_v = inside[jnp.minimum(flat, N)].reshape(m.shape)
    if method == "window":
        keep = (ins_v == tot_v) & m
    else:  # crossing
        keep = (ins_v > 0) & m
    return keep.astype(jnp.float32)


def gaussian_noise_2x2x2(shape, noise_std, seed: int = None, rng=None):
    """2 mm-blocky Gaussian noise: sample at full resolution, then replicate
    in 2x2x2 blocks (reference image_ops.py:369-377).

    Like the reference, each unseeded call draws FRESH noise (augmentation
    must vary per call); pass seed or rng for reproducibility."""
    if rng is None:
        rng = np.random.RandomState(seed) if seed is not None else np.random
    noise = rng.normal(0, noise_std, shape).astype(np.float32)
    up = np.repeat(np.repeat(np.repeat(noise, 2, 0), 2, 1), 2, 2)
    return up[: shape[0], : shape[1], : shape[2]]


def binarize_image(nii_file, threshold, save_file=None, as_type="float32"):
    """Threshold a NIfTI file (reference image_ops.py:491-499)."""
    from deepwmh_tpu.core import nifti

    data, header = nifti.load_nifti(nii_file)
    data = (data > threshold).astype(as_type)
    if save_file:
        nifti.save_nifti(data, header, save_file)
    return data
