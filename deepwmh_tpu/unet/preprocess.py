"""Case preprocessing for the U-Net engine: resample to plan spacing,
intensity-normalize, pad/bucket to static shapes.

Replaces the nnU-Net fork's preprocessing stage (resampling + per-case
z-score) invoked by the reference via `nnUNet_plan_and_preprocess`
(deepwmh/pipeline/DCNN_multistage.py:281). All resampling is separable
endpoint-aligned linear/nearest interpolation expressed as XLA gathers.

Static-shape strategy (SURVEY.md §7 hard part (e)): every volume entering a
jitted program is padded up to a multiple of SHAPE_BUCKET per axis, so the
number of distinct compiled shapes stays small across a cohort.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from deepwmh_tpu.ops.grid import _linear_resize_axis, _nearest_resize_axis

SHAPE_BUCKET = 32


def resample_volume(data, in_spacing, out_spacing, order: int = 1):
    """Resample [D,H,W] to a new spacing. Output shape =
    round(shape * in/out) per axis. order 0=nearest, 1=linear."""
    data = jnp.asarray(data, jnp.float32)
    out = data
    for ax in range(3):
        n_new = int(round(data.shape[ax] * float(in_spacing[ax]) / float(out_spacing[ax])))
        n_new = max(n_new, 1)
        if order == 0:
            out = _nearest_resize_axis(out, ax, n_new)
        else:
            out = _linear_resize_axis(out, ax, n_new)
    return out


def resample_to_shape(data, shape, order: int = 1):
    out = jnp.asarray(data, jnp.float32)
    for ax in range(3):
        if order == 0:
            out = _nearest_resize_axis(out, ax, int(shape[ax]))
        else:
            out = _linear_resize_axis(out, ax, int(shape[ax]))
    return out


def normalize_zscore(data):
    """Whole-volume z-score (nnU-Net's MRI normalization scheme)."""
    mu = jnp.mean(data)
    sd = jnp.maximum(jnp.std(data), 1e-8)
    return (data - mu) / sd


def padded_shape(shape, patch_size, bucket: int = SHAPE_BUCKET):
    """Static padded shape: at least the patch size, rounded up to the
    bucket multiple so recompiles stay rare across a cohort."""
    out = []
    for s, p in zip(shape, patch_size):
        s2 = max(int(s), int(p))
        out.append(int(math.ceil(s2 / bucket) * bucket))
    return tuple(out)


def pad_to(data, shape, value=0.0):
    pads = [(0, t - s) for s, t in zip(data.shape, shape)]
    return jnp.pad(data, pads, constant_values=value)


def preprocess_case(data, spacing, plan, normalize: bool = True):
    """Full preprocessing: resample to plan.target_spacing (linear) then
    z-score. Returns the preprocessed volume — the caller keeps `spacing`
    and the input shape to map predictions back."""
    vol = resample_volume(data, spacing, plan.target_spacing, order=1)
    if normalize:
        vol = normalize_zscore(vol)
    return vol


def fingerprint_dataset(shapes_spacings):
    """[(shape, spacing)] -> (shapes array, spacings array) for plan_experiment."""
    shapes = np.array([list(s) for s, _ in shapes_spacings], dtype=np.float64)
    spacings = np.array([list(sp) for _, sp in shapes_spacings], dtype=np.float64)
    return shapes, spacings
