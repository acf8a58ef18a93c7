"""N4 bias-field correction as a single XLA program.

TPU-native replacement for ANTs `N4BiasFieldCorrection -d 3 -c [50x50x50,0.0]
-s 2` — the preprocessing step every reference workflow starts with
(deepwmh/main/predict.py:16-17, deepwmh/main/train.py:42-43).

Algorithm (Tustison et al. 2010, re-derived):
  1. work in the log domain at a shrink-factor-2 resolution,
  2. each iteration sharpens the intensity histogram by Wiener deconvolution
     with a Gaussian of FWHM 0.15 (200 bins, FFT-based) and maps every voxel
     to its expected "true" intensity E[u|v],
  3. the residual (current log intensity minus expectation) is fit with a
     smooth multiplicative field — here a masked cell-average control
     lattice interpolated with separable cubic B-splines, with the control
     spacing halving at each of the 3 resolution levels (the ITK B-spline
     fitting's mesh refinement),
  4. the accumulated log-bias is upsampled to full resolution and divided
     out.

Everything (histogram scatter-adds, FFT deconvolution, B-spline gathers,
50-iteration fori_loops) stays on device; volumes of any subject shape run
after a pad-to-bucket.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from deepwmh_tpu.ops.grid import _linear_resize_axis

NBINS = 200
FWHM = 0.15
WIENER_NOISE = 0.01


def _cubic_bspline_weights(t):
    """The four cubic B-spline basis values for fractional offset t in [0,1)."""
    t2, t3 = t * t, t * t * t
    w0 = (1 - t) ** 3 / 6.0
    w1 = (3 * t3 - 6 * t2 + 4) / 6.0
    w2 = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0
    w3 = t3 / 6.0
    return w0, w1, w2, w3


def _bspline_upsample_axis(c, axis, n_out):
    """Evaluate a cubic B-spline curve with control values `c` (spacing
    (n_c-1)/(n_out-1) grid-aligned at endpoints) at n_out points, separably
    along `axis`. Control points are clamped at the borders."""
    n_c = c.shape[axis]
    if n_c == 1:
        return jnp.take(c, jnp.zeros(n_out, jnp.int32), axis=axis)
    x = jnp.arange(n_out, dtype=jnp.float32) * ((n_c - 1) / max(n_out - 1, 1))
    k = jnp.floor(x).astype(jnp.int32)
    k = jnp.clip(k, 0, n_c - 2)
    t = x - k.astype(jnp.float32)
    w0, w1, w2, w3 = _cubic_bspline_weights(t)
    idx = [jnp.clip(k + d, 0, n_c - 1) for d in (-1, 0, 1, 2)]
    shape = [1] * c.ndim
    shape[axis] = n_out
    out = 0.0
    for w, i in zip((w0, w1, w2, w3), idx):
        out = out + w.reshape(shape) * jnp.take(c, i, axis=axis)
    return out


def _smooth_field(residual, mask, n_control):
    """Masked control-lattice fit + cubic B-spline interpolation: the
    smooth-field estimator standing in for ITK's B-spline least squares."""
    shape = residual.shape
    # masked average over control cells
    cells = []
    csizes = []
    for ax, n_c in enumerate(n_control):
        csizes.append(int(math.ceil(shape[ax] / n_c)))
    pad = [(0, csizes[a] * n_control[a] - shape[a]) for a in range(3)]
    r = jnp.pad(residual * mask, pad)
    m = jnp.pad(mask, pad)
    view = r.reshape(
        n_control[0], csizes[0], n_control[1], csizes[1], n_control[2], csizes[2]
    )
    mview = m.reshape(
        n_control[0], csizes[0], n_control[1], csizes[1], n_control[2], csizes[2]
    )
    s = view.sum(axis=(1, 3, 5))
    c = mview.sum(axis=(1, 3, 5))
    ctrl = s / jnp.maximum(c, 1.0)
    out = ctrl
    for ax in range(3):
        out = _bspline_upsample_axis(out, ax, shape[ax])
    return out


def _sharpen(v, mask, nbins=NBINS, fwhm=FWHM, noise=WIENER_NOISE,
             hist_stride: int = 4, psum_axis=None):
    """Histogram sharpening: returns E[u|v] per voxel (the expected
    bias-free log intensity).

    psum_axis: when run on a spatially sharded slab inside shard_map
    (parallel/spatial.py), the intensity range and the histogram are
    merged across shards over ICI; everything downstream of the (tiny)
    histogram is replicated identically on every device."""
    vmin = jnp.min(jnp.where(mask > 0.5, v, jnp.inf))
    vmax = jnp.max(jnp.where(mask > 0.5, v, -jnp.inf))
    if psum_axis is not None:
        vmin = jax.lax.pmin(vmin, psum_axis)
        vmax = jax.lax.pmax(vmax, psum_axis)
    vmax = jnp.where(vmax > vmin, vmax, vmin + 1.0)
    width = (vmax - vmin) / (nbins - 1)

    # triangular (linear) binning like ITK. Computed as a dense
    # compare-reduce rather than a scatter-add: 1M updates all colliding
    # into 200 bins serialize TPU scatters, while sum-over-voxels per bin
    # chunk is pure VPU work that XLA fuses without materializing [N, B].
    # The histogram is SAMPLED at every hist_stride-th voxel: at a working
    # resolution of ~1M voxels that still leaves >1000 samples per bin for
    # a Wiener-smoothed 200-bin density, and the binning (run 150 times) is
    # the dominant N4 cost — measured 2.7s -> ~1s per volume at stride 4
    # with no visible change to the corrected output.
    pos = (v - vmin) / jnp.maximum(width, 1e-30)
    pos = jnp.clip(pos, 0.0, float(nbins - 1))
    if pos.ndim == 3 and hist_stride == 4:
        # quarter-sample SPATIALLY (every other D row and H column, all of
        # W): a flat [::4] lowers to a serialized per-element gather on TPU
        # — profiled at ~4 ms x 150 iterations = 80% of the whole N4 —
        # while major-axis strided slices are pure addressing
        pos_flat = pos[::2, ::2, :].reshape(-1)
        w = mask[::2, ::2, :].reshape(-1)
    else:
        pos_flat = pos.reshape(-1)[::hist_stride]
        w = mask.reshape(-1)[::hist_stride]
    CHUNK = 25
    parts = []
    for b0 in range(0, nbins, CHUNK):
        centers_chunk = jnp.arange(b0, b0 + CHUNK, dtype=jnp.float32)
        tri = jnp.maximum(
            1.0 - jnp.abs(pos_flat[:, None] - centers_chunk[None, :]), 0.0
        )
        parts.append(jnp.sum(tri * w[:, None], axis=0))
    hist = jnp.concatenate(parts)
    if psum_axis is not None:
        hist = jax.lax.psum(hist, psum_axis)

    # Wiener deconvolution with a Gaussian of given FWHM (in bin units)
    pad_n = nbins * 2
    sigma_i = fwhm / (2.0 * jnp.sqrt(2.0 * jnp.log(2.0)))
    scale = width
    # gaussian kernel over intensity offsets, circularly centered at 0
    offs = (jnp.arange(pad_n, dtype=jnp.float32) + pad_n // 2) % pad_n - pad_n // 2
    g = jnp.exp(-0.5 * jnp.square(offs * scale / sigma_i))
    g = g / jnp.sum(g)
    F = jnp.fft.fft(jnp.pad(hist, (0, pad_n - nbins)))
    G = jnp.fft.fft(g)
    # sharpened (bias-free) distribution estimate
    Fu = F * jnp.conj(G) / (jnp.abs(G) ** 2 + noise)
    fu = jnp.real(jnp.fft.ifft(Fu))[:nbins]
    fu = jnp.maximum(fu, 0.0)

    # E[u|v] = conv(G, u * f_u)(v) / conv(G, f_u)(v)
    u_bins = vmin + jnp.arange(nbins, dtype=jnp.float32) * width
    fu_pad = jnp.pad(fu, (0, pad_n - nbins))
    ufu_pad = jnp.pad(fu * u_bins, (0, pad_n - nbins))
    num = jnp.real(jnp.fft.ifft(jnp.fft.fft(ufu_pad) * G))[:nbins]
    den = jnp.real(jnp.fft.ifft(jnp.fft.fft(fu_pad) * G))[:nbins]
    e_u = num / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
    # fall back to the identity map where the density vanishes — a SMOOTH
    # blend rather than a hard switch: the switch only fires in near-empty
    # tail bins, and a discontinuity there would make the Chebyshev
    # projection below ring across the whole map
    blend = jnp.clip(den / (1e-4 * jnp.max(den) + 1e-30), 0.0, 1.0)
    e_u = blend * e_u + (1.0 - blend) * u_bins

    # Map voxels through E[u|v]. A per-voxel table lookup (e_u[lo], e_u[hi])
    # is 2 gathers/voxel from a 200-entry table — measured 19 ms of the
    # ~21 ms N4 iteration on v5e (TPU gathers serialize). Instead the table
    # (a SMOOTH function of intensity: Wiener-reconvolved density ratio) is
    # least-squares projected onto a Chebyshev basis — one [K+1,nbins] @
    # [nbins] matmul per iteration with a precomputed pseudoinverse — and
    # evaluated per voxel with a fused Clenshaw recurrence: pure VPU FMAs,
    # zero gathers. K=24 tracks the exact interpolated map to ~2e-4 of the
    # intensity range at the median and ~2e-3 at the 99th percentile; the
    # max (~5e-3) sits at near-empty tail bins where the mapped value is
    # inconsequential (test_ops_n4_brain.py::test_sharpen_poly_map).
    K = 24
    xb = np.linspace(-1.0, 1.0, nbins)
    T = np.polynomial.chebyshev.chebvander(xb, K)  # [nbins, K+1]
    P = jnp.asarray(np.linalg.pinv(T), jnp.float32)  # [K+1, nbins] constant
    coef = P @ e_u

    xs = pos / (nbins - 1) * 2.0 - 1.0  # bin position -> [-1, 1]
    b1 = jnp.zeros_like(xs)
    b2 = jnp.zeros_like(xs)
    for k in range(K, 0, -1):
        b1, b2 = coef[k] + 2.0 * xs * b1 - b2, b1
    return coef[0] + xs * b1 - b2


@functools.partial(
    jax.jit, static_argnames=("levels", "iters_per_level", "base_control")
)
def _n4_core(v0, mask, levels: int, iters_per_level: int, base_control: int):
    """v0: log image at working resolution; returns the log bias field."""
    log_bias = jnp.zeros_like(v0)

    def make_level(level):
        n_c = tuple(
            min(base_control * (2**level) + 1, s) for s in v0.shape
        )

        def iter_body(_, carry):
            log_bias = carry
            v = v0 - log_bias
            e = _sharpen(v, mask)
            residual = (v - e) * mask
            delta = _smooth_field(residual, mask, n_c)
            return log_bias + delta

        return iter_body

    for level in range(levels):
        body = make_level(level)
        log_bias = jax.lax.fori_loop(0, iters_per_level, body, log_bias)
    return log_bias


def n4_bias_correction(
    data,
    mask=None,
    shrink: int = 2,
    levels: int = 3,
    iters_per_level: int = 50,
    base_control: int = 1,
    return_bias: bool = False,
):
    """Correct multiplicative bias. data: [D,H,W] positive intensities.

    Matches the reference's invocation semantics (-c [50x50x50,0.0] -s 2):
    3 levels x 50 iterations at shrink factor 2, control lattice refining
    2x per level. Returns the corrected volume (and optionally the bias
    field, normalized exp(log_bias))."""
    data = jnp.asarray(data, jnp.float32)
    eps = 1e-6
    if mask is None:
        mask_full = (data > 0).astype(jnp.float32)
    else:
        mask_full = (mask > 0.5).astype(jnp.float32)

    # shrink by averaging (cheap anti-aliased downsample)
    def shrink_vol(x):
        s = shrink
        pad = [(0, (-x.shape[a]) % s) for a in range(3)]
        xp = jnp.pad(x, pad)
        return xp.reshape(
            xp.shape[0] // s, s, xp.shape[1] // s, s, xp.shape[2] // s, s
        ).mean(axis=(1, 3, 5))

    if shrink > 1:
        small = shrink_vol(data)
        msmall = (shrink_vol(mask_full) > 0.5).astype(jnp.float32)
    else:
        small, msmall = data, mask_full

    v = jnp.log(jnp.maximum(small, eps)) * msmall
    log_bias_small = _n4_core(v, msmall, levels, iters_per_level, base_control)

    # upsample log bias to full resolution (linear; the field is smooth)
    lb = log_bias_small
    for ax in range(3):
        lb = _linear_resize_axis(lb, ax, data.shape[ax])
    bias = jnp.exp(lb)
    # normalize so the bias has unit geometric mean inside the mask
    log_mean = jnp.sum(lb * mask_full) / jnp.maximum(jnp.sum(mask_full), 1.0)
    bias = bias / jnp.exp(log_mean)
    corrected = data / jnp.maximum(bias, 1e-6)
    if return_bias:
        return corrected, bias
    return corrected


# volumes at/above this many voxels route to the slab-sharded N4 when more
# than one device is visible (parallel/spatial.py HaloShardedOps): the
# full-resolution arrays then never materialize on one chip
N4_SHARD_MIN_VOXELS = 64_000_000

_auto_ops = None


def n4_would_shard(shape) -> bool:
    """True when n4_bias_correction_auto would route this shape to the
    slab-sharded program. The fused-case gate (pipeline/inference._can_fuse)
    must agree with the auto router, so both call THIS predicate."""
    vox = 1
    for s in shape:
        vox *= int(s)
    # a select_device pin (-g/--device: one chip per process) must win over
    # auto-sharding: building a mesh over ALL devices from a pinned process
    # would trample the other processes' chips
    pinned = jax.config.jax_default_device is not None
    return vox >= N4_SHARD_MIN_VOXELS and jax.device_count() > 1 and not pinned


def n4_bias_correction_auto(data, **kwargs):
    """n4_bias_correction with automatic spatial sharding: big volumes
    (>= N4_SHARD_MIN_VOXELS) on a multi-device backend run slab-sharded
    over the mesh; everything else takes the single-device program."""
    global _auto_ops
    if n4_would_shard(np.shape(data)):
        if _auto_ops is None or _auto_ops.n != jax.device_count():
            from deepwmh_tpu.parallel.mesh import make_mesh
            from deepwmh_tpu.parallel.spatial import HaloShardedOps

            _auto_ops = HaloShardedOps(make_mesh())
        return _auto_ops.n4_bias_correction(data, **kwargs)
    return n4_bias_correction(data, **kwargs)
