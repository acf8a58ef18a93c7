import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from deepwmh_tpu.ops import filters as F


def test_median_filter_odd(rng):
    x = rng.rand(9, 10, 8).astype(np.float32)
    got = np.asarray(F.median_filter(jnp.asarray(x), 3))
    want = ndi.median_filter(x, size=3, mode="constant", cval=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_median_filter_2d_kernel(rng):
    x = rng.rand(4, 12, 11).astype(np.float32)
    got = np.asarray(F.median_filter(jnp.asarray(x), (1, 3, 5)))
    want = ndi.median_filter(x, size=(1, 3, 5), mode="constant", cval=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mean_filter(rng):
    x = rng.rand(8, 9, 7).astype(np.float32)
    got = np.asarray(F.mean_filter(jnp.asarray(x), 3))
    want = ndi.uniform_filter(x, size=3, mode="constant", cval=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_min_max_filter(rng):
    x = rng.rand(7, 8, 6).astype(np.float32)
    got_min = np.asarray(F.min_filter(jnp.asarray(x), 3))
    got_max = np.asarray(F.max_filter(jnp.asarray(x), 3))
    want_min = ndi.minimum_filter(x, size=3, mode="constant", cval=0)
    want_max = ndi.maximum_filter(x, size=3, mode="constant", cval=0)
    np.testing.assert_allclose(got_min, want_min)
    np.testing.assert_allclose(got_max, want_max)


def test_even_kernel_placement(rng):
    x = rng.rand(10, 10, 10).astype(np.float32)
    got = np.asarray(F.max_filter(jnp.asarray(x), 4))
    want = ndi.maximum_filter(x, size=4, mode="constant", cval=0)
    np.testing.assert_allclose(got, want)


def test_median_3mm_isotropic(rng):
    x = rng.rand(9, 9, 9).astype(np.float32)
    got = np.asarray(F.median_3mm(jnp.asarray(x), [1.0, 1.0, 1.0]))
    want = ndi.median_filter(x, size=3, mode="constant", cval=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_median_3mm_anisotropic(rng):
    # 5mm thick slices along axis 2 -> per-slice 2D 3x3 kernel
    x = rng.rand(12, 12, 5).astype(np.float32)
    got = np.asarray(F.median_3mm(jnp.asarray(x), [1.0, 1.0, 5.0]))
    want = np.zeros_like(x)
    for s in range(x.shape[2]):
        want[:, :, s] = ndi.median_filter(x[:, :, s], size=(3, 3), mode="constant", cval=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_median_filter_even_kernel_rank_semantics(rng):
    """scipy is a rank filter (element n//2), NOT numpy's two-middle mean."""
    x = rng.rand(6, 7, 8).astype(np.float32)
    got = np.asarray(F.median_filter(jnp.asarray(x), 2))
    want = ndi.median_filter(x, size=2, mode="constant", cval=0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got4 = np.asarray(F.median_filter(jnp.asarray(x), (1, 4, 3)))
    want4 = ndi.median_filter(x, size=(1, 4, 3), mode="constant", cval=0)
    np.testing.assert_allclose(got4, want4, rtol=1e-6)


def test_median_filter_slabbed_matches_direct(rng):
    """Above the stack budget the median runs in leading-axis slabs
    (bounded memory); results are identical to the one-shot stack."""
    from deepwmh_tpu.ops.filters import median_filter

    vol = jnp.asarray(rng.rand(13, 9, 11).astype(np.float32))
    for k in [(3, 3, 3), (2, 4, 3), (5, 3, 3)]:
        direct = np.asarray(median_filter(vol, k))
        # force slabbing with a tiny budget (a few rows per slab)
        prod_k = int(np.prod(k))
        slabbed = np.asarray(
            median_filter(vol, k, max_stack_bytes=prod_k * 4 * 9 * 11 * 2)
        )
        np.testing.assert_array_equal(direct, slabbed)
        # degenerate budget: one row per slab
        slab1 = np.asarray(median_filter(vol, k, max_stack_bytes=1))
        np.testing.assert_array_equal(direct, slab1)
