"""Halo-sharded whole-volume ops match the single-device ops bit-for-bit
on the 8-virtual-device CPU mesh (SURVEY.md §5 spatial sharding)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from deepwmh_tpu.ops import filters, stats
from deepwmh_tpu.parallel.spatial import HaloShardedOps


@pytest.fixture(scope="module")
def ops8():
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    return HaloShardedOps(mesh)


@pytest.mark.parametrize("shape", [(32, 12, 10), (27, 9, 11)])  # and ragged
@pytest.mark.parametrize("k", [3, 5])
def test_sharded_filters_match(ops8, shape, k):
    rng = np.random.RandomState(0)
    x = rng.rand(*shape).astype(np.float32) * 100

    for name in ("median_filter", "mean_filter", "min_filter", "max_filter"):
        got = np.asarray(getattr(ops8, name)(x, k))
        want = np.asarray(getattr(filters, name)(x, k))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5,
                                   err_msg=name)


def test_sharded_zscore_matches(ops8):
    rng = np.random.RandomState(1)
    x = rng.rand(26, 10, 8).astype(np.float32) * 50
    mask = (rng.rand(26, 10, 8) > 0.4).astype(np.float32)

    got = np.asarray(ops8.z_score(x))
    want = np.asarray(stats.z_score(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    got = np.asarray(ops8.z_score(x, mask=mask))
    want = np.asarray(stats.z_score(x, mask=mask))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_map_overlap_custom_fn(ops8):
    """A custom stencil through the generic primitive: 3-row running sum."""
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    x = rng.rand(24, 6, 5).astype(np.float32)

    def stencil(v):
        z = jnp.zeros_like(v[:1])
        return jnp.concatenate([z, v[:-1]]) + v + jnp.concatenate([v[1:], z])

    got = np.asarray(ops8.map_overlap(stencil, x, halo=1))
    want = np.asarray(stencil(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_halo_too_large_raises(ops8):
    x = np.random.rand(8, 4, 4).astype(np.float32)  # 1 row per shard
    with pytest.raises(AssertionError, match="halo"):
        ops8.map_overlap(lambda v: v, x, halo=3)
