"""Differentiable registration similarity metrics.

Replaces the metric kernels inside ANTs `antsRegistration` that the
reference configures (deepwmh/external_tools/ANTs_group_registration.py:
85-119): Mattes-style mutual information with 32 bins for the rigid/affine
stages, and local normalized cross-correlation (radius-4 CC) for the
deformable stage. Both are pure JAX — MI uses a soft (triangular-kernel)
joint histogram built with scatter-adds so it is differentiable end-to-end;
LNCC uses box-filter local moments via cumulative sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def winsorize_rescale(x, lo_q=0.005, hi_q=0.995):
    """Clip to the [0.5%, 99.5%] intensity quantiles and rescale to [0,1]
    (the reference's --winsorize-image-intensities [0.005,0.995])."""
    lo = jnp.quantile(x, lo_q)
    hi = jnp.quantile(x, hi_q)
    hi = jnp.where(hi > lo, hi, lo + 1.0)
    return jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)


def soft_joint_histogram(a, b, nbins: int = 32, mask=None, chunk: int = 1 << 21):
    """Differentiable joint histogram of two [0,1] volumes.

    Each sample contributes linearly to its two nearest bins per image
    (triangular Parzen window), so gradients flow to the intensities.
    Returns p_ab [nbins, nbins] (normalized).

    Binning is DENSE compare-reduce, not scatter-add: the triangular weight
    of sample n in bin k is relu(1 - |p_n - k|) (identical to the two-bin
    linear split), so the histogram is W_a @ W_b^T — one [nbins, N] x
    [N, nbins] matmul that maps onto the MXU and vmaps to a batched matmul.
    Scatter-adds lower poorly on TPU, catastrophically so under vmap
    (measured 0.67x batched-vs-sequential in round 1). Samples are chunked
    (scan + remat) so the [nbins, N] weight matrices stay bounded in HBM.
    """
    a = a.reshape(-1)
    b = b.reshape(-1)
    w = jnp.ones_like(a) if mask is None else mask.reshape(-1).astype(jnp.float32)

    pa = jnp.clip(a, 0.0, 1.0) * (nbins - 1)
    pb = jnp.clip(b, 0.0, 1.0) * (nbins - 1)
    bins = jnp.arange(nbins, dtype=jnp.float32)

    def hist_chunk(pa_c, pb_c, w_c):
        wa = jnp.maximum(0.0, 1.0 - jnp.abs(pa_c[None, :] - bins[:, None]))
        wb = jnp.maximum(0.0, 1.0 - jnp.abs(pb_c[None, :] - bins[:, None]))
        return wa @ (wb * w_c[None, :]).T

    n = pa.shape[0]
    if n <= chunk:
        hist = hist_chunk(pa, pb, w)
    else:
        pad = (-n) % chunk
        pa_p = jnp.pad(pa, (0, pad)).reshape(-1, chunk)
        pb_p = jnp.pad(pb, (0, pad)).reshape(-1, chunk)
        w_p = jnp.pad(w, (0, pad)).reshape(-1, chunk)  # pad weight 0 = no-op

        def body(h, xs):
            return h + jax.checkpoint(hist_chunk)(*xs), None

        hist, _ = jax.lax.scan(
            body, jnp.zeros((nbins, nbins), jnp.float32), (pa_p, pb_p, w_p)
        )
    total = jnp.maximum(jnp.sum(hist), 1e-8)
    return hist / total


def mutual_information(a, b, nbins: int = 32, mask=None):
    """MI(a, b) >= 0, higher = better aligned."""
    p_ab = soft_joint_histogram(a, b, nbins, mask)
    p_a = jnp.sum(p_ab, axis=1, keepdims=True)
    p_b = jnp.sum(p_ab, axis=0, keepdims=True)
    eps = 1e-10
    return jnp.sum(p_ab * (jnp.log(p_ab + eps) - jnp.log(p_a + eps) - jnp.log(p_b + eps)))


def _box_sum(x, radius: int):
    """Separable box-filter sum with zero boundary (window = 2r+1).

    One reduce_window HLO per axis (SAME padding pads with the init value 0,
    i.e. the zero boundary): far fewer ops than the cumsum/take formulation
    and it lowers to the TPU's native windowed reduction, forward and grad.
    """
    k = 2 * radius + 1
    for ax in range(x.ndim):
        dims = [1] * x.ndim
        dims[ax] = k
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, tuple(dims), (1,) * x.ndim, "SAME"
        )
    return x


def lncc(a, b, radius: int = 4, eps: float = 1e-5):
    """Local normalized cross-correlation (ANTs CC metric, radius 4).

    Returns the mean of squared local correlation, in [0, 1]; higher =
    better aligned.
    """
    ones = jnp.ones_like(a)
    n = _box_sum(ones, radius)
    sa = _box_sum(a, radius)
    sb = _box_sum(b, radius)
    saa = _box_sum(a * a, radius)
    sbb = _box_sum(b * b, radius)
    sab = _box_sum(a * b, radius)
    ma = sa / n
    mb = sb / n
    cross = sab - mb * sa - ma * sb + ma * mb * n
    var_a = saa - 2 * ma * sa + ma * ma * n
    var_b = sbb - 2 * mb * sb + mb * mb * n
    cc = (cross * cross) / (var_a * var_b + eps)
    return jnp.mean(cc)


def downsample_mean(x, factor: int):
    """Mean-pool a [D,H,W] volume by an integer factor (zero-padding the
    remainder) — the pyramid shrink shared by the affine and SVF stages."""
    if factor <= 1:
        return x
    s = factor
    pad = [(0, (-x.shape[a]) % s) for a in range(3)]
    xp = jnp.pad(x, pad)
    return xp.reshape(
        xp.shape[0] // s, s, xp.shape[1] // s, s, xp.shape[2] // s, s
    ).mean(axis=(1, 3, 5))


def grad_sq(v):
    """Bending-ish regularizer: mean squared forward differences over the
    spatial axes of a [3,D,H,W] (or [C,...]) field — shared by the SVF
    stage and the learned-registration loss."""
    total = 0.0
    for ax in range(1, 4):
        d = jnp.diff(v, axis=ax)
        total = total + jnp.mean(jnp.square(d))
    return total
