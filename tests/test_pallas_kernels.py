import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from deepwmh_tpu.ops.pallas_kernels import median3_pallas


def test_median3_pallas_matches_scipy(rng):
    x = rng.rand(6, 16, 16).astype(np.float32)
    got = np.asarray(median3_pallas(jnp.asarray(x), interpret=True))
    want = ndi.median_filter(x, size=3, mode="constant", cval=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_median3_pallas_boundary(rng):
    # ones volume: interior median 1, faces/edges see zero padding
    x = np.ones((4, 8, 8), np.float32)
    got = np.asarray(median3_pallas(jnp.asarray(x), interpret=True))
    want = ndi.median_filter(x, size=3, mode="constant", cval=0)
    np.testing.assert_allclose(got, want)
