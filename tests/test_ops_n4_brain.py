import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops.n4 import n4_bias_correction
from deepwmh_tpu.ops.brain import brain_extract, fill_holes


def make_biased_phantom(shape=(32, 32, 32), seed=0):
    """Piecewise-constant tissue phantom with a smooth multiplicative bias."""
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, shape[0]),
        np.linspace(-1, 1, shape[1]),
        np.linspace(-1, 1, shape[2]),
        indexing="ij",
    )
    r = np.sqrt(zz**2 + yy**2 + xx**2)
    tissue = np.where(r < 0.5, 300.0, np.where(r < 0.8, 150.0, 0.0)).astype(np.float32)
    tissue += 5.0 * rng.randn(*shape).astype(np.float32) * (tissue > 0)
    bias = np.exp(0.4 * zz + 0.3 * yy).astype(np.float32)  # smooth field, ~2.0x range
    return tissue, np.clip(tissue * bias, 0, None), bias


def _cv(x, m):
    sel = x[m]
    return sel.std() / max(sel.mean(), 1e-6)


def test_n4_reduces_intensity_cv():
    clean, biased, bias = make_biased_phantom()
    corrected = np.asarray(
        n4_bias_correction(jnp.asarray(biased), iters_per_level=25, levels=2)
    )
    # within-class coefficient of variation must drop substantially
    zz = np.linspace(-1, 1, 32)
    r = np.sqrt(zz[:, None, None] ** 2 + zz[None, :, None] ** 2 + zz[None, None, :] ** 2)
    inner = r < 0.5
    assert _cv(corrected, inner) < 0.6 * _cv(biased, inner)
    # and correlate better with the clean phantom
    mask = clean > 0
    cc_before = np.corrcoef(biased[mask], clean[mask])[0, 1]
    cc_after = np.corrcoef(corrected[mask], clean[mask])[0, 1]
    assert cc_after > cc_before


def test_n4_identity_on_unbiased():
    clean, _, _ = make_biased_phantom()
    corrected = np.asarray(
        n4_bias_correction(jnp.asarray(clean), iters_per_level=5, levels=1)
    )
    mask = clean > 0
    rel = np.abs(corrected[mask] - clean[mask]) / clean[mask]
    assert np.median(rel) < 0.1


def test_n4_returns_bias_field():
    _, biased, _ = make_biased_phantom()
    corrected, bias = n4_bias_correction(
        jnp.asarray(biased), iters_per_level=5, levels=1, return_bias=True
    )
    assert bias.shape == biased.shape
    assert float(jnp.min(bias)) > 0


def test_fill_holes():
    m = np.zeros((10, 10, 10), np.float32)
    m[2:8, 2:8, 2:8] = 1
    m[4:6, 4:6, 4:6] = 0  # interior cavity
    filled = np.asarray(fill_holes(jnp.asarray(m)))
    assert filled[5, 5, 5] == 1
    assert filled[0, 0, 0] == 0
    np.testing.assert_allclose(filled[2:8, 2:8, 2:8], 1)


def test_brain_extract_phantom():
    clean, biased, _ = make_biased_phantom()
    mask = np.asarray(brain_extract(jnp.asarray(clean), (1.0, 1.0, 1.0)))
    head = clean > 0
    # mask must cover most of the head and not leak far outside
    inter = (mask > 0.5) & head
    dice = 2 * inter.sum() / ((mask > 0.5).sum() + head.sum())
    assert dice > 0.8


def test_sharpen_poly_map():
    """The Chebyshev-projected E[u|v] map matches an exact numpy
    recomputation (histogram + Wiener sharpening + LINEAR table
    interpolation) to ~1e-3 of the intensity range."""
    import jax
    import jax.numpy as jnp

    from deepwmh_tpu.ops.n4 import FWHM, NBINS, WIENER_NOISE, _sharpen

    rng = np.random.RandomState(0)
    shape = (48, 56, 48)
    v = rng.randn(*shape).astype(np.float32) * 0.4 + 5.0
    mask = (rng.rand(*shape) > 0.2).astype(np.float32)

    got = np.asarray(jax.jit(_sharpen)(jnp.asarray(v), jnp.asarray(mask)))

    # exact numpy recomputation with gather-based linear interpolation
    nbins = NBINS
    vm = v[mask > 0.5]
    vmin, vmax = vm.min(), vm.max()
    width = (vmax - vmin) / (nbins - 1)
    pos = np.clip((v - vmin) / width, 0, nbins - 1)
    pos_s = pos.reshape(-1)[::4]
    w_s = mask.reshape(-1)[::4]
    centers = np.arange(nbins)
    tri = np.maximum(1 - np.abs(pos_s[:, None] - centers[None, :]), 0)
    hist = (tri * w_s[:, None]).sum(0)

    pad_n = nbins * 2
    sigma_i = FWHM / (2 * np.sqrt(2 * np.log(2)))
    offs = (np.arange(pad_n) + pad_n // 2) % pad_n - pad_n // 2
    g = np.exp(-0.5 * (offs * width / sigma_i) ** 2)
    g = g / g.sum()
    F = np.fft.fft(np.pad(hist, (0, pad_n - nbins)))
    G = np.fft.fft(g)
    fu = np.maximum(np.real(np.fft.ifft(F * np.conj(G) / (np.abs(G) ** 2 + WIENER_NOISE)))[:nbins], 0)
    u_bins = vmin + np.arange(nbins) * width
    num = np.real(np.fft.ifft(np.fft.fft(np.pad(fu * u_bins, (0, pad_n - nbins))) * G))[:nbins]
    den = np.real(np.fft.ifft(np.fft.fft(np.pad(fu, (0, pad_n - nbins))) * G))[:nbins]
    e_u = num / np.where(np.abs(den) > 1e-12, den, 1e-12)
    blend = np.clip(den / (1e-4 * den.max() + 1e-30), 0.0, 1.0)
    e_u = blend * e_u + (1.0 - blend) * u_bins
    lo = np.clip(np.floor(pos).astype(int), 0, nbins - 1)
    hi = np.clip(lo + 1, 0, nbins - 1)
    frac = pos - np.floor(pos)
    want = e_u[lo] * (1 - frac) + e_u[hi] * frac

    err = np.abs(got - want)[mask > 0.5] / (vmax - vmin)
    # the polynomial tracks the map tightly where the data lives; the max
    # sits at near-empty tail bins (<0.3% histogram mass) where the mapped
    # value barely matters (residuals are cell-averaged and iterated 150x)
    assert np.median(err) < 5e-4, "median %.2e" % np.median(err)
    assert np.quantile(err, 0.99) < 3e-3, "p99 %.2e" % np.quantile(err, 0.99)
    assert err.max() < 1.5e-2, "max %.2e" % err.max()
