"""Histogram ops: scatter-add histograms, Otsu thresholding, the reference's
log-histogram anomaly curves and auto-threshold search.

Rebuilds (TPU-first, as fused XLA programs):
- skimage.filters.threshold_otsu, used by the reference at
  deepwmh/analysis/lesion_analysis.py:145 and image_ops.py:310-323
- hist_curve / histogram_analysis (lesion_analysis.py:40-82)
- the zero-crossing auto-threshold search (lesion_analysis.py:201-215)

Histograms are computed with scatter-adds (TPU-supported) instead of
searchsorted gathers; bin geometry matches numpy's linspace-edge convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_histogram(x, lo, hi, nbins: int, weights=None):
    """Histogram of `x` over [lo, hi] with `nbins` uniform bins.

    Matches np.histogram semantics: values outside [lo, hi] are dropped,
    x == hi lands in the last bin. `weights` (e.g. a 0/1 mask) multiplies
    each sample's contribution. Returns float32 counts of shape [nbins].
    """
    x = x.reshape(-1).astype(jnp.float32)
    w = jnp.ones_like(x) if weights is None else weights.reshape(-1).astype(jnp.float32)
    width = (hi - lo) / nbins
    idx = jnp.floor((x - lo) / jnp.maximum(width, 1e-30)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, nbins - 1)
    in_range = (x >= lo) & (x <= hi)
    w = w * in_range.astype(jnp.float32)
    return jnp.zeros((nbins,), jnp.float32).at[idx].add(w)


def otsu_threshold(image, mask=None, nbins: int = 256):
    """Otsu threshold (skimage.threshold_otsu algorithm, 256 bins).

    With `mask`, only voxels where mask > 0.5 participate — the reference's
    otsu_thresholding (image_ops.py:310-323) passes the compressed masked
    array to skimage.
    """
    x = image.astype(jnp.float32)
    if mask is None:
        w = None
        lo = jnp.min(x)
        hi = jnp.max(x)
    else:
        m = (mask > 0.5)
        w = m.astype(jnp.float32)
        lo = jnp.min(jnp.where(m, x, jnp.inf))
        hi = jnp.max(jnp.where(m, x, -jnp.inf))
    hi = jnp.where(hi > lo, hi, lo + 1.0)  # degenerate constant image
    counts = masked_histogram(x, lo, hi, nbins, weights=w)
    edges = lo + (hi - lo) * jnp.arange(nbins + 1, dtype=jnp.float32) / nbins
    centers = (edges[:-1] + edges[1:]) / 2.0

    weight1 = jnp.cumsum(counts)
    weight2 = jnp.cumsum(counts[::-1])[::-1]
    csum = jnp.cumsum(counts * centers)
    mean1 = csum / jnp.maximum(weight1, 1e-30)
    csum2 = jnp.cumsum((counts * centers)[::-1])[::-1]
    mean2 = csum2 / jnp.maximum(weight2, 1e-30)
    variance12 = weight1[:-1] * weight2[1:] * jnp.square(mean1[:-1] - mean2[1:])
    idx = jnp.argmax(jnp.nan_to_num(variance12, nan=-jnp.inf))
    return centers[idx]


def hist_curve(data, lo, hi, nbins: int, log_y: bool = False, mask=None):
    """Histogram curve over uniform bins (reference lesion_analysis.py:40-50).

    Returns (bin_centers, hist). With log_y, zero counts are replaced by
    0.001 before log10 and negatives clamped to 0 — exactly the reference's
    log-scale transform.
    """
    w = None if mask is None else (mask > 0.5).astype(jnp.float32)
    hist = masked_histogram(data, lo, hi, nbins, weights=w)
    edges = lo + (hi - lo) * jnp.arange(nbins + 1, dtype=jnp.float32) / nbins
    centers = (edges[:-1] + edges[1:]) / 2.0
    if log_y:
        hist = jnp.where(hist == 0, 0.001, hist)
        hist = jnp.log10(hist)
        hist = jnp.where(hist < 0, 0.0, hist)
    return centers, hist


def histogram_analysis(a_prime, a_refs, mask, nbins: int = 400):
    """Anomaly-score histogram curves with auto-generated bins
    (reference lesion_analysis.py:52-82).

    bin_width = mean over refs of mean(a_ref[mask & a_ref>0]) / 4;
    bins span [0, nbins * bin_width]. Returns (x, y, r, rs) where rs is the
    stacked [K, nbins] per-reference log-curve.
    """
    m = (mask > 0.5)
    K = a_refs.shape[0]
    sel = m[None] & (a_refs > 0)
    cnt = jnp.sum(sel.astype(jnp.float32), axis=tuple(range(1, a_refs.ndim)))
    s = jnp.sum(jnp.where(sel, a_refs, 0.0), axis=tuple(range(1, a_refs.ndim)))
    ref_means = s / jnp.maximum(cnt, 1.0)
    bin_width = jnp.mean(ref_means) / 4.0
    lo = jnp.float32(0.0)
    hi = nbins * bin_width

    x, y = hist_curve(a_prime, lo, hi, nbins, log_y=True)
    rs = []
    for i in range(K):
        _, r0 = hist_curve(a_refs[i], lo, hi, nbins, log_y=True)
        rs.append(r0)
    rs = jnp.stack(rs)
    r = jnp.mean(rs, axis=0)
    return x, y, r, rs


def auto_threshold_from_curves(curve_x, curve_rs, cutoff: float = 0.01):
    """Segmentation threshold = median over references of the last bin whose
    log-curve exceeds `cutoff` (reference lesion_analysis.py:201-215).

    References whose curve never exceeds the cutoff are excluded, matching
    the reference's skip behavior.
    """
    nbins = curve_x.shape[0]
    iota = jnp.arange(nbins, dtype=jnp.int32)
    # bin 0 is never inspected (reference scans range(len-1, 0, -1),
    # lesion_analysis.py:205): a reference whose curve exceeds the cutoff
    # only in bin 0 is EXCLUDED from the median, not counted as ~0
    above = (curve_rs > cutoff) & (iota[None, :] > 0)  # [K, nbins]
    last_idx = jnp.max(jnp.where(above, iota[None, :], -1), axis=1)  # [K]
    crossing = jnp.where(last_idx >= 0, curve_x[jnp.maximum(last_idx, 0)], jnp.nan)
    return jnp.nanmedian(crossing)
