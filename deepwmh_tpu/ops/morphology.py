"""Binary morphology with scipy-default structuring elements.

scipy.ndimage.binary_erosion's default is a connectivity-1 cross with
border_value=0 (used by the reference's component_filtering,
deepwmh/analysis/image_ops.py:289-303). Erosion = min over the cross,
dilation = max; both are cheap VPU shift-compares.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(a, delta, axis, fill):
    n = a.shape[axis]
    if delta == 1:
        sl = jnp.take(a, jnp.arange(1, n), axis=axis)
        pad = jnp.full_like(jnp.take(a, jnp.arange(0, 1), axis=axis), fill)
        return jnp.concatenate([sl, pad], axis=axis)
    else:
        sl = jnp.take(a, jnp.arange(0, n - 1), axis=axis)
        pad = jnp.full_like(jnp.take(a, jnp.arange(0, 1), axis=axis), fill)
        return jnp.concatenate([pad, sl], axis=axis)


def _erode(m, axes):
    out = m
    for ax in axes:
        out = out & _shift(m, 1, ax, False) & _shift(m, -1, ax, False)
    return out


def _dilate(m, axes):
    out = m
    for ax in axes:
        out = out | _shift(m, 1, ax, False) | _shift(m, -1, ax, False)
    return out


def binary_erosion_2d(mask, slice_axis: int, iterations: int = 1):
    """Erode every 2D slice perpendicular to `slice_axis` with the 2D cross
    structure, zero border — all slices in parallel."""
    m = mask > 0.5
    axes = tuple(a for a in range(mask.ndim) if a != slice_axis)
    for _ in range(iterations):
        m = _erode(m, axes)
    return m.astype(jnp.float32)


def binary_dilation_2d(mask, slice_axis: int, iterations: int = 1):
    m = mask > 0.5
    axes = tuple(a for a in range(mask.ndim) if a != slice_axis)
    for _ in range(iterations):
        m = _dilate(m, axes)
    return m.astype(jnp.float32)


def binary_erosion_3d(mask, iterations: int = 1):
    m = mask > 0.5
    for _ in range(iterations):
        m = _erode(m, (0, 1, 2))
    return m.astype(jnp.float32)


def binary_dilation_3d(mask, iterations: int = 1):
    m = mask > 0.5
    for _ in range(iterations):
        m = _dilate(m, (0, 1, 2))
    return m.astype(jnp.float32)
