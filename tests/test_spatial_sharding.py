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


def test_sharded_mean_std_grid_matches_single(rng):
    import jax.numpy as jnp

    from deepwmh_tpu.ops.grid import mean_std_grid
    from deepwmh_tpu.parallel.mesh import make_mesh
    from deepwmh_tpu.parallel.spatial import HaloShardedOps

    vol = rng.rand(37, 22, 18).astype(np.float32) * 100
    mask = (rng.rand(37, 22, 18) > 0.3).astype(np.float32)
    ops = HaloShardedOps(make_mesh())
    for patch in [(10, 10, 10), (7, 9, 5)]:
        for m in (None, mask):
            for order in (0, 1):
                mu_s, sd_s = ops.mean_std_grid(vol, patch, mask=m, order=order)
                mu_r, sd_r = mean_std_grid(jnp.asarray(vol), patch, mask=m, order=order)
                np.testing.assert_allclose(
                    np.asarray(mu_s), np.asarray(mu_r), rtol=2e-5, atol=2e-5,
                    err_msg="mu patch=%s mask=%s order=%d" % (patch, m is not None, order))
                np.testing.assert_allclose(
                    np.asarray(sd_s), np.asarray(sd_r), rtol=2e-4, atol=2e-4,
                    err_msg="sd patch=%s mask=%s order=%d" % (patch, m is not None, order))


def test_sharded_n4_matches_single(rng):
    """Slab-sharded N4 vs the single-device op. With the depth aligned to
    shards*shrink the control-cell geometry is identical; the only
    difference is the per-shard histogram subsample, so the corrected
    volumes agree to sub-percent."""
    import jax.numpy as jnp

    from deepwmh_tpu.ops.n4 import n4_bias_correction
    from deepwmh_tpu.parallel.mesh import make_mesh
    from deepwmh_tpu.parallel.spatial import HaloShardedOps

    shape = (64, 24, 20)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a ** 2 for a in g))
    brain = (r < 0.85).astype(np.float32)
    bias = np.exp(0.4 * g[0] + 0.25 * g[1])
    vol = (brain * 200.0 * bias * (1 + 0.05 * rng.rand(*shape))).astype(
        np.float32
    )

    ops = HaloShardedOps(make_mesh())
    # fewer iterations: the parity question is geometric, not convergence
    kw = dict(levels=2, iters_per_level=10)
    got = np.asarray(ops.n4_bias_correction(vol, **kw))
    want = np.asarray(n4_bias_correction(jnp.asarray(vol), **kw))

    m = brain > 0.5
    rel = np.abs(got[m] - want[m]) / np.maximum(np.abs(want[m]), 1.0)
    assert rel.max() < 1e-3, rel.max()

    # and the bias is actually reduced vs the input
    cv_in = vol[m].std() / vol[m].mean()
    cv_out = got[m].std() / got[m].mean()
    assert cv_out < cv_in * 0.7, (cv_in, cv_out)


def test_sharded_n4_unaligned_depth(rng):
    """Depth not divisible by shards*shrink: the shard padding must not
    move the control lattice or the upsample endpoints — parity stays at
    float tolerance."""
    import jax.numpy as jnp

    from deepwmh_tpu.ops.n4 import n4_bias_correction
    from deepwmh_tpu.parallel.mesh import make_mesh
    from deepwmh_tpu.parallel.spatial import HaloShardedOps

    shape = (53, 22, 19)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a ** 2 for a in g))
    brain = (r < 0.85).astype(np.float32)
    bias = np.exp(0.35 * g[0])
    vol = (brain * 180.0 * bias * (1 + 0.05 * rng.rand(*shape))).astype(
        np.float32
    )
    ops = HaloShardedOps(make_mesh())
    kw = dict(levels=2, iters_per_level=10)
    got = np.asarray(ops.n4_bias_correction(vol, **kw))
    want = np.asarray(n4_bias_correction(jnp.asarray(vol), **kw))
    m = brain > 0.5
    rel = np.abs(got[m] - want[m]) / np.maximum(np.abs(want[m]), 1.0)
    assert rel.max() < 1e-3, rel.max()
