"""Masked / cohort statistics as fused XLA ops.

TPU-native rebuild of the numpy voxel statistics in the reference
(deepwmh/analysis/image_ops.py:13-21,172-179,197-231). The cohort ("group")
ops take a stacked [K, D, H, W] array instead of a Python list of volumes so
the whole reduction is one XLA program; the reference's NaN-masking protocol
(mask<0.5 -> excluded, all-excluded -> NaN) is preserved exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_STD = 1e-5  # reference avoids div-by-zero with max(std, 0.00001)


def masked_mean(data, mask):
    """Mean over voxels where mask > 0.5 (reference image_ops.py:13-16)."""
    m = (mask > 0.5).astype(data.dtype)
    cnt = jnp.sum(m)
    return jnp.sum(data * m) / jnp.maximum(cnt, 1.0)


def masked_std(data, mask):
    """Population std over voxels where mask > 0.5
    (reference image_ops.py:18-21)."""
    m = (mask > 0.5).astype(data.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mu = jnp.sum(data * m) / cnt
    var = jnp.sum(jnp.square(data - mu) * m) / cnt
    return jnp.sqrt(jnp.maximum(var, 0.0))


def z_score(data, mask=None):
    """Z-score normalization, optionally over a mask
    (reference image_ops.py:172-179)."""
    if mask is None:
        mu = jnp.mean(data)
        sd = jnp.std(data)
    else:
        mu = masked_mean(data, mask)
        sd = masked_std(data, mask)
    sd = jnp.maximum(sd, EPS_STD)
    return (data - mu) / sd


def _group_moments(stack, masks):
    """Shared helper: per-voxel count/mean/var across the leading K axis with
    the reference's NaN-mask protocol (image_ops.py:197-231)."""
    x = stack.astype(jnp.float32)
    if masks is None:
        valid = jnp.ones_like(x)
    else:
        valid = (masks > 0.5).astype(jnp.float32)
    # NaNs already present in the input are also excluded, like np.nanmean
    finite = jnp.isfinite(x)
    valid = valid * finite.astype(jnp.float32)
    x = jnp.where(finite, x, 0.0)
    cnt = jnp.sum(valid, axis=0)
    s = jnp.sum(x * valid, axis=0)
    mean = s / jnp.maximum(cnt, 1.0)
    var = jnp.sum(jnp.square(x - mean) * valid, axis=0) / jnp.maximum(cnt, 1.0)
    nan = jnp.float32(jnp.nan)
    mean = jnp.where(cnt > 0, mean, nan)
    var = jnp.where(cnt > 0, var, nan)
    return cnt, mean, var


def group_mean(stack, masks=None):
    """Voxelwise mean across a [K, ...] cohort; masked-out voxels excluded,
    all-masked voxels produce NaN (reference image_ops.py:215-231)."""
    _, mean, _ = _group_moments(stack, masks)
    return mean


def group_std(stack, masks=None):
    """Voxelwise population std across a [K, ...] cohort
    (reference image_ops.py:197-213)."""
    _, _, var = _group_moments(stack, masks)
    return jnp.sqrt(var)
