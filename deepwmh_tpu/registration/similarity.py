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

import jax.numpy as jnp


def winsorize_rescale(x, lo_q=0.005, hi_q=0.995):
    """Clip to the [0.5%, 99.5%] intensity quantiles and rescale to [0,1]
    (the reference's --winsorize-image-intensities [0.005,0.995])."""
    lo = jnp.quantile(x, lo_q)
    hi = jnp.quantile(x, hi_q)
    hi = jnp.where(hi > lo, hi, lo + 1.0)
    return jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)


def soft_joint_histogram(a, b, nbins: int = 32, mask=None):
    """Differentiable joint histogram of two [0,1] volumes.

    Each sample contributes linearly to its two nearest bins per image
    (triangular Parzen window), so gradients flow to the intensities.
    Returns p_ab [nbins, nbins] (normalized).
    """
    a = a.reshape(-1)
    b = b.reshape(-1)
    w = jnp.ones_like(a) if mask is None else mask.reshape(-1).astype(jnp.float32)

    pa = jnp.clip(a, 0.0, 1.0) * (nbins - 1)
    pb = jnp.clip(b, 0.0, 1.0) * (nbins - 1)
    ia = jnp.clip(jnp.floor(pa).astype(jnp.int32), 0, nbins - 2)
    ib = jnp.clip(jnp.floor(pb).astype(jnp.int32), 0, nbins - 2)
    # fractions re-derived from the CLIPPED base bin so exact-1.0 samples
    # land in bin nbins-1 (fa=1) instead of being folded into nbins-2
    fa = pa - ia.astype(jnp.float32)
    fb = pb - ib.astype(jnp.float32)

    hist = jnp.zeros((nbins, nbins), jnp.float32)
    for da, wa in ((0, 1 - fa), (1, fa)):
        for db, wb in ((0, 1 - fb), (1, fb)):
            hist = hist.at[ia + da, ib + db].add(w * wa * wb)
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
    """Separable box-filter sum with zero boundary (window = 2r+1)."""
    for ax in range(x.ndim):
        c = jnp.cumsum(x, axis=ax)
        n = x.shape[ax]
        idx_hi = jnp.clip(jnp.arange(n) + radius, 0, n - 1)
        idx_lo = jnp.arange(n) - radius - 1
        hi = jnp.take(c, idx_hi, axis=ax)
        lo = jnp.where(
            (idx_lo >= 0).reshape([-1 if a == ax else 1 for a in range(x.ndim)]),
            jnp.take(c, jnp.clip(idx_lo, 0, n - 1), axis=ax),
            0.0,
        )
        x = hi - lo
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
