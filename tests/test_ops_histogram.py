import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops import histogram as H


def _numpy_otsu(image, nbins=256):
    """skimage.filters.threshold_otsu algorithm, re-derived."""
    counts, edges = np.histogram(image.ravel(), bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    counts = counts.astype(float)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / np.maximum(w1, 1e-30)
    m2 = (np.cumsum((counts * centers)[::-1]) / np.maximum(w2[::-1], 1e-30))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return centers[:-1][np.argmax(var12)]


def test_masked_histogram_matches_numpy(rng):
    x = rng.rand(1000).astype(np.float32) * 10
    got = np.asarray(H.masked_histogram(jnp.asarray(x), 0.0, 10.0, 50))
    want, _ = np.histogram(x, bins=np.linspace(0, 10, 51))
    np.testing.assert_allclose(got, want)


def test_masked_histogram_excludes_out_of_range(rng):
    x = np.array([-1.0, 0.5, 1.5, 3.0, 7.0], np.float32)
    got = np.asarray(H.masked_histogram(jnp.asarray(x), 0.0, 2.0, 4))
    want, _ = np.histogram(x, bins=np.linspace(0, 2, 5))
    np.testing.assert_allclose(got, want)


def test_otsu_bimodal(rng):
    a = rng.normal(0.0, 1.0, 4000)
    b = rng.normal(10.0, 1.0, 4000)
    x = np.concatenate([a, b]).astype(np.float32)
    got = float(H.otsu_threshold(jnp.asarray(x)))
    want = _numpy_otsu(x)
    assert abs(got - want) < 0.2
    assert 3.0 < got < 7.0


def test_otsu_masked(rng):
    x = np.concatenate(
        [rng.normal(0, 1, 3000), rng.normal(8, 1, 3000), rng.normal(100, 1, 500)]
    ).astype(np.float32)
    m = np.ones_like(x)
    m[-500:] = 0  # outliers masked out
    got = float(H.otsu_threshold(jnp.asarray(x), mask=jnp.asarray(m)))
    want = _numpy_otsu(x[:-500])
    assert abs(got - want) < 0.3


def test_hist_curve_log_transform(rng):
    x = rng.rand(500).astype(np.float32) * 4
    cx, cy = H.hist_curve(jnp.asarray(x), 0.0, 4.0, 8, log_y=True)
    counts, edges = np.histogram(x, bins=np.linspace(0, 4, 9))
    want = counts.astype(float)
    want = np.where(want == 0, 0.001, want)
    want = np.log10(want)
    want = np.where(want < 0, 0, want)
    np.testing.assert_allclose(np.asarray(cy), want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cx), (edges[:-1] + edges[1:]) / 2, rtol=1e-4)


def test_auto_threshold_from_curves():
    x = jnp.linspace(0.0, 10.0, 100)
    # three refs whose last bin above 0.01 sits at index 30 / 50 / 70
    rs = np.zeros((3, 100), np.float32)
    rs[0, :31] = 1.0
    rs[1, :51] = 1.0
    rs[2, :71] = 1.0
    thr = float(H.auto_threshold_from_curves(x, jnp.asarray(rs)))
    np.testing.assert_allclose(thr, float(x[50]), rtol=1e-6)


def test_histogram_analysis_bins(rng):
    mask = np.ones((6, 6, 6), np.float32)
    refs = rng.rand(3, 6, 6, 6).astype(np.float32) * 8
    a = rng.rand(6, 6, 6).astype(np.float32) * 8
    x, y, r, rs = H.histogram_analysis(jnp.asarray(a), jnp.asarray(refs), jnp.asarray(mask))
    assert x.shape == (400,)
    assert rs.shape == (3, 400)
    # bin width = mean over refs of mean(positive in-mask values) / 4
    means = [refs[i][refs[i] > 0].mean() for i in range(3)]
    want_width = np.mean(means) / 4
    got_width = float(x[1] - x[0])
    np.testing.assert_allclose(got_width, want_width, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(r), np.asarray(rs).mean(axis=0), rtol=1e-5)
