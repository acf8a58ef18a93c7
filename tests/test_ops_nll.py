import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops.nll import nll


def _numpy_nll(x, refs, min_std=None, side=None):
    mu = refs.mean(axis=0)
    sigma = refs.std(axis=0)
    if min_std is None:
        sigma = sigma + 1e-6
    else:
        sigma = np.where(sigma < min_std, min_std, sigma)
    a = (x - mu) ** 2 / (2 * sigma**2) + np.log(sigma * 2.506)
    a = np.nan_to_num(a, nan=0.0)
    if side == "+":
        a = a * (x > mu).astype("float32")
    elif side == "-":
        a = a * (x < mu).astype("float32")
    return a, mu, sigma


def test_nll_matches_reference_formula(rng):
    refs = rng.rand(6, 8, 9, 7).astype(np.float32)
    x = rng.rand(8, 9, 7).astype(np.float32)
    for side in (None, "+", "-"):
        got = np.asarray(nll(jnp.asarray(x), jnp.asarray(refs), min_std=0.03, side=side))
        want, _, _ = _numpy_nll(x, refs, min_std=0.03, side=side)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_nll_return_all(rng):
    refs = rng.rand(4, 5, 5, 5).astype(np.float32)
    x = rng.rand(5, 5, 5).astype(np.float32)
    a, mu, sd = nll(jnp.asarray(x), jnp.asarray(refs), min_std=0.03, side="+", return_all=True)
    _, want_mu, want_sd = _numpy_nll(x, refs, min_std=0.03, side="+")
    np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sd), want_sd, rtol=1e-3, atol=1e-5)


def test_nll_min_std_clamp(rng):
    # constant references -> zero std everywhere -> clamped to min_std
    refs = np.ones((3, 4, 4, 4), dtype=np.float32)
    x = np.full((4, 4, 4), 2.0, dtype=np.float32)
    a, mu, sd = nll(jnp.asarray(x), jnp.asarray(refs), min_std=0.03, return_all=True)
    np.testing.assert_allclose(np.asarray(sd), 0.03, rtol=1e-6)
    want = (2.0 - 1.0) ** 2 / (2 * 0.03**2) + np.log(0.03 * 2.506)
    np.testing.assert_allclose(np.asarray(a), want, rtol=1e-4)
