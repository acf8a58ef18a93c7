"""Overlapping-patch local mean/std grid with trilinear upsampling.

TPU-first rebuild of the reference's `mean_std_grid`
(deepwmh/analysis/image_ops.py:56-170), the local-intensity alignment step of
the NLL analysis. The reference walks a triple-nested Python loop over
overlapping 50 mm patches; here the same statistic is computed as a single
fused XLA program:

- the volume is zero-padded to a multiple of the (even-ified) patch size,
- per-cell sums/square-sums/counts are computed by a reshape-reduce over
  half-patch cells,
- overlapping patch stats are the sum of two adjacent cells per axis
  (separable shift-adds; the final patch on each axis covers one cell,
  matching numpy's clipped slice),
- the coarse grid is zero-bordered and upsampled with endpoint-aligned
  (scipy.ndimage.zoom-compatible) separable linear interpolation, then
  cropped by the half-step offset back to the input shape.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _shift_add(a, axis):
    """a[i] + a[i+1] along `axis`, zero past the end (last patch = one cell)."""
    n = a.shape[axis]
    nxt = jnp.concatenate(
        [
            jnp.take(a, jnp.arange(1, n), axis=axis),
            jnp.zeros_like(jnp.take(a, jnp.arange(0, 1), axis=axis)),
        ],
        axis=axis,
    )
    return a + nxt


def _linear_resize_axis(a, axis, n_out):
    """Endpoint-aligned separable linear interpolation (zoom order=1)."""
    n_in = a.shape[axis]
    if n_in == n_out:
        return a
    if n_in == 1:
        return jnp.take(a, jnp.zeros(n_out, jnp.int32), axis=axis)
    x = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
    lo = jnp.floor(x).astype(jnp.int32)
    lo = jnp.clip(lo, 0, n_in - 2)
    w = x - lo.astype(jnp.float32)
    shape = [1] * a.ndim
    shape[axis] = n_out
    w = w.reshape(shape)
    return jnp.take(a, lo, axis=axis) * (1 - w) + jnp.take(a, lo + 1, axis=axis) * w


def _nearest_resize_axis(a, axis, n_out):
    n_in = a.shape[axis]
    if n_in == n_out:
        return a
    x = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / max(n_out - 1, 1))
    idx = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, n_in - 1)
    return jnp.take(a, idx, axis=axis)


def mean_std_grid(data, patch_size, mask=None, order: int = 1):
    """Coarse local mean/std estimate, upsampled to the input shape.

    `patch_size` is a static list of 3 ints (voxels); odd sizes are rounded
    up to even like the reference (image_ops.py:106). With `mask`, only
    mask>0.5 voxels count; empty patches get (mu, sigma) = (0, 1e-5).
    Returns (mean_interp, std_interp), both shaped like `data`.
    """
    data = data.astype(jnp.float32)
    shape = data.shape
    p = [2 * int(math.ceil(s / 2)) for s in patch_size]
    step = [pi // 2 for pi in p]
    padded = [pi * int(math.ceil(sh / pi)) for pi, sh in zip(p, shape)]

    pad_width = [(0, ps - sh) for ps, sh in zip(padded, shape)]
    dpad = jnp.pad(data, pad_width)
    if mask is not None:
        mpad = jnp.pad((mask > 0.5).astype(jnp.float32), pad_width)

    G = [padded[i] // step[i] for i in range(3)]
    if mask is not None:
        mview = mpad.reshape(G[0], step[0], G[1], step[1], G[2], step[2])
        cell_cnt = mview.sum(axis=(1, 3, 5))
        dview = (dpad * mpad).reshape(
            G[0], step[0], G[1], step[1], G[2], step[2]
        )
    else:
        cell_cnt = jnp.full(G, float(step[0] * step[1] * step[2]), jnp.float32)
        dview = dpad.reshape(G[0], step[0], G[1], step[1], G[2], step[2])
    cell_sum = dview.sum(axis=(1, 3, 5))
    cell_sq = jnp.square(dview).sum(axis=(1, 3, 5))

    psum, psq, pcnt = cell_sum, cell_sq, cell_cnt
    for ax in range(3):
        psum = _shift_add(psum, ax)
        psq = _shift_add(psq, ax)
        pcnt = _shift_add(pcnt, ax)

    cnt_safe = jnp.maximum(pcnt, 1.0)
    mu = psum / cnt_safe
    var = psq / cnt_safe - jnp.square(mu)
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    if mask is not None:
        empty = pcnt < 0.5
        mu = jnp.where(empty, 0.0, mu)
        sigma = jnp.where(empty, 1e-5, sigma)
    else:
        sigma = jnp.maximum(sigma, 1e-5)

    def upsample(grid):
        out = jnp.pad(grid, [(1, 1)] * 3)  # zero border (image_ops.py:150-153)
        for ax in range(3):
            n_out = (G[ax] + 2) * step[ax]
            if order == 0:
                out = _nearest_resize_axis(out, ax, n_out)
            else:
                out = _linear_resize_axis(out, ax, n_out)
        off = [s // 2 for s in step]
        out = out[
            off[0] : off[0] + G[0] * step[0],
            off[1] : off[1] + G[1] * step[1],
            off[2] : off[2] + G[2] * step[2],
        ]
        return out[: shape[0], : shape[1], : shape[2]]

    return upsample(mu), upsample(sigma)
