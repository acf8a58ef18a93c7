import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops import stats


def test_masked_mean_std(rng):
    x = rng.rand(10, 12, 8).astype(np.float32)
    m = (rng.rand(10, 12, 8) > 0.5).astype(np.float32)
    got_mu = float(stats.masked_mean(jnp.asarray(x), jnp.asarray(m)))
    got_sd = float(stats.masked_std(jnp.asarray(x), jnp.asarray(m)))
    sel = x[m > 0.5]
    np.testing.assert_allclose(got_mu, sel.mean(), rtol=1e-5)
    np.testing.assert_allclose(got_sd, sel.std(), rtol=1e-4)


def test_z_score(rng):
    x = (rng.rand(8, 8, 8) * 50 + 10).astype(np.float32)
    got = np.asarray(stats.z_score(jnp.asarray(x)))
    want = (x - x.mean()) / max(x.std(), 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_z_score_masked(rng):
    x = (rng.rand(8, 8, 8) * 50).astype(np.float32)
    m = (rng.rand(8, 8, 8) > 0.3).astype(np.float32)
    got = np.asarray(stats.z_score(jnp.asarray(x), jnp.asarray(m)))
    sel = x[m > 0.5]
    want = (x - sel.mean()) / max(sel.std(), 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_group_mean_std_plain(rng):
    xs = rng.rand(5, 6, 7, 4).astype(np.float32)
    got_mu = np.asarray(stats.group_mean(jnp.asarray(xs)))
    got_sd = np.asarray(stats.group_std(jnp.asarray(xs)))
    np.testing.assert_allclose(got_mu, xs.mean(axis=0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_sd, xs.std(axis=0), rtol=1e-4, atol=1e-5)


def test_group_mean_std_masked_nan_protocol(rng):
    xs = rng.rand(4, 5, 5, 5).astype(np.float32)
    ms = (rng.rand(4, 5, 5, 5) > 0.4).astype(np.float32)
    got_mu = np.asarray(stats.group_mean(jnp.asarray(xs), jnp.asarray(ms)))
    got_sd = np.asarray(stats.group_std(jnp.asarray(xs), jnp.asarray(ms)))
    # reference protocol: masked-out -> nan, then nanmean/nanstd across K
    xs_nan = np.where(ms < 0.5, np.nan, xs)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want_mu = np.nanmean(xs_nan, axis=0)
        want_sd = np.nanstd(xs_nan, axis=0)
    np.testing.assert_allclose(got_mu, want_mu, rtol=1e-4, atol=1e-6, equal_nan=True)
    np.testing.assert_allclose(got_sd, want_sd, rtol=1e-3, atol=1e-5, equal_nan=True)
