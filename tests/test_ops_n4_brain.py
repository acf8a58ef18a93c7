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
