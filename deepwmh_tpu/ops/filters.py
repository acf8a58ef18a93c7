"""Sliding-window rank/mean filters with zero (constant-0) boundary.

Rebuilds scipy.ndimage.{median,uniform,minimum,maximum}_filter with
mode='constant', cval=0 as used by the reference
(deepwmh/analysis/image_ops.py:181-195,379-421). min/max/mean use
lax.reduce_window over a zero-padded volume (VPU-friendly); median stacks
the window into a leading axis and reduces with jnp.median, matching
numpy's even-count averaging semantics.

scipy window placement: for size k the window spans [i - k//2, i + (k-1)//2]
(even k leans left), i.e. pad k//2 on the left and (k-1)//2 on the right.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def _norm_ksize(kernel_size, ndim):
    if isinstance(kernel_size, int):
        return (kernel_size,) * ndim
    return tuple(int(k) for k in kernel_size)


def _pad_for_window(data, ks, value=0.0):
    pads = [(k // 2, (k - 1) // 2) for k in ks]
    return jnp.pad(data, pads, constant_values=value)


def _reduce_filter(data, kernel_size, init, op):
    ks = _norm_ksize(kernel_size, data.ndim)
    padded = _pad_for_window(data.astype(jnp.float32), ks)
    return lax.reduce_window(padded, init, op, ks, (1,) * data.ndim, "VALID")


def min_filter(data, kernel_size):
    """scipy minimum_filter, constant-0 boundary (image_ops.py:189-191)."""
    ks = _norm_ksize(kernel_size, data.ndim)
    padded = _pad_for_window(data.astype(jnp.float32), ks, value=0.0)
    return lax.reduce_window(padded, jnp.inf, lax.min, ks, (1,) * data.ndim, "VALID")


def max_filter(data, kernel_size):
    """scipy maximum_filter, constant-0 boundary (image_ops.py:193-195)."""
    ks = _norm_ksize(kernel_size, data.ndim)
    padded = _pad_for_window(data.astype(jnp.float32), ks, value=0.0)
    return lax.reduce_window(padded, -jnp.inf, lax.max, ks, (1,) * data.ndim, "VALID")


def mean_filter(data, kernel_size):
    """scipy uniform_filter, constant-0 boundary (image_ops.py:185-187)."""
    import math

    ks = _norm_ksize(kernel_size, data.ndim)
    s = _reduce_filter(data, ks, 0.0, lax.add)
    return s / float(math.prod(ks))


def _stack_from_padded(padded, ks, out_shape):
    """Window stack from an already-padded array: leading axis prod(ks)."""
    import itertools

    slices = []
    for off in itertools.product(*[range(k) for k in ks]):
        idx = tuple(slice(o, o + s) for o, s in zip(off, out_shape))
        slices.append(padded[idx])
    return jnp.stack(slices, axis=0)


def window_stack(data, kernel_size, pad_value=0.0):
    """Stack every window element into a leading axis of size prod(k)."""
    ks = _norm_ksize(kernel_size, data.ndim)
    padded = _pad_for_window(data.astype(jnp.float32), ks, value=pad_value)
    return _stack_from_padded(padded, ks, data.shape)


# Peak bytes the median's window stack may materialize at once. Above
# this the volume is processed in leading-axis slabs (lax.map serializes
# them, so peak memory is one slab's stack): a 6x6x6 kernel on a sub-mm
# 400^3 volume would otherwise stack 216 full-volume copies (~55 GB).
MEDIAN_STACK_BUDGET_BYTES = 2 * 1024**3


def median_filter(data, kernel_size, max_stack_bytes: int = None):
    """scipy median_filter, constant-0 boundary (image_ops.py:181-183).

    scipy is a RANK filter: it takes the single element at rank n//2, not
    the mean of the two middle ranks for even window sizes (verified:
    scipy size=2 on {0,1,4,5} -> 4, numpy median -> 2.5). Sort + take
    matches scipy for both parities."""
    import math

    ks = _norm_ksize(kernel_size, data.ndim)
    n = math.prod(ks)
    budget = MEDIAN_STACK_BUDGET_BYTES if max_stack_bytes is None else max_stack_bytes
    if data.ndim != 3 or n * data.size * 4 <= budget:
        win = window_stack(data, ks, pad_value=0.0)
        return jnp.sort(win, axis=0)[n // 2]

    # slab the leading axis; each slab's windows need k0-1 extra rows
    k0 = ks[0]
    D = data.shape[0]
    plane = data.shape[1] * data.shape[2]
    rows = max(int(budget // (n * 4 * plane)), 1)
    nslab = -(-D // rows)
    padded = _pad_for_window(data.astype(jnp.float32), ks, value=0.0)
    # extend axis 0 so the last slab's slice stays in bounds
    extra = nslab * rows - D
    if extra:
        padded = jnp.pad(padded, [(0, extra), (0, 0), (0, 0)])

    def one_slab(start):
        sl = lax.dynamic_slice_in_dim(padded, start, rows + k0 - 1, axis=0)
        win = _stack_from_padded(sl, ks, (rows,) + data.shape[1:])
        return jnp.sort(win, axis=0)[n // 2]

    out = lax.map(one_slab, jnp.arange(nslab, dtype=jnp.int32) * rows)
    return out.reshape(nslab * rows, *data.shape[1:])[:D]


def median_3mm(data, physical_voxel_size):
    """3 mm median smoothing, anisotropy-aware (image_ops.py:379-421).

    `physical_voxel_size` is a static host-side list of 3 floats. For
    anisotropic data (max/min > 4) a 2D kernel is applied slice-by-slice
    perpendicular to the thick axis; otherwise a 3D kernel is used. Kernel
    sizes are int(3mm / pixdim) clamped to >= 3 per axis, like the reference.
    """
    import numpy as np

    pv = [float(v) for v in physical_voxel_size]
    maxl, minl = max(pv), min(pv)
    if maxl / minl > 4.0:
        max_axis = int(np.argmax(pv))
        planar = [pv[i] for i in range(3) if i != max_axis]
        k2 = [max(int(3.0 / planar[0]), 3), max(int(3.0 / planar[1]), 3)]
        ks = [1, 1, 1]
        j = 0
        for i in range(3):
            if i != max_axis:
                ks[i] = k2[j]
                j += 1
        return median_filter(data, tuple(ks))
    ks = tuple(max(int(3.0 / v), 3) for v in pv)
    return median_filter(data, ks)
