import numpy as np
import jax.numpy as jnp

from deepwmh_tpu.ops import warp


def test_identity_affine(rng):
    v = jnp.asarray(rng.rand(6, 7, 8), jnp.float32)
    eye = np.eye(3, 4, dtype=np.float32)
    out = warp.affine_warp(v, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-6)


def test_translation(rng):
    v = jnp.asarray(rng.rand(6, 6, 6), jnp.float32)
    mat = np.eye(3, 4, dtype=np.float32)
    mat[0, 3] = 1.0  # output o samples input o+1 => shift content by -1
    out = np.asarray(warp.affine_warp(v, mat))
    np.testing.assert_allclose(out[:5], np.asarray(v)[1:], atol=1e-6)
    np.testing.assert_allclose(out[5], 0.0, atol=1e-6)  # constant pad


def test_nearest_preserves_labels(rng):
    lbl = jnp.asarray(rng.randint(0, 4, (8, 8, 8)), jnp.float32)
    mat = np.eye(3, 4, dtype=np.float32)
    mat[:, 3] = 0.3
    out = np.asarray(warp.affine_warp(lbl, mat, order=0))
    assert set(np.unique(out)).issubset({0.0, 1.0, 2.0, 3.0})


def test_displacement_identity(rng):
    v = jnp.asarray(rng.rand(5, 6, 7), jnp.float32)
    disp = jnp.zeros((3, 5, 6, 7), jnp.float32)
    out = warp.displacement_warp(v, disp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-6)


def test_rotation_matrix_orthonormal():
    R = np.asarray(warp.rotation_matrix(jnp.array([0.3, -0.2, 0.5])))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_compose_disp(rng):
    v = jnp.asarray(rng.rand(8, 8, 8), jnp.float32)
    d1 = jnp.zeros((3, 8, 8, 8)).at[0].set(1.0)  # +1 along axis 0
    d2 = jnp.zeros((3, 8, 8, 8)).at[1].set(1.0)  # +1 along axis 1
    comp = warp.compose_disp(d2, d1)
    a = warp.displacement_warp(warp.displacement_warp(v, d2), d1)
    b = warp.displacement_warp(v, comp)
    np.testing.assert_allclose(np.asarray(a)[:7, :7], np.asarray(b)[:7, :7], atol=1e-5)


def test_affine_then_disp_compose(rng):
    v = jnp.asarray(rng.rand(6, 6, 6), jnp.float32)
    mat = np.eye(3, 4, dtype=np.float32)
    mat[2, 3] = 1.0
    disp = jnp.zeros((3, 6, 6, 6), jnp.float32)
    coords = warp.compose_affine_then_disp(mat, disp)
    out = warp.sample_volume(v, coords)
    want = warp.affine_warp(v, mat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_augment_shapes_and_determinism(rng):
    import jax

    from deepwmh_tpu.unet.augment import augment_batch, percentile_noise

    imgs = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)
    lbls = jnp.asarray((rng.rand(2, 8, 8, 8) > 0.7).astype(np.int32))
    key = jax.random.PRNGKey(3)
    i1, l1 = augment_batch(key, imgs, lbls)
    i2, l2 = augment_batch(key, imgs, lbls)
    assert i1.shape == imgs.shape and l1.shape == lbls.shape
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2))
    assert l1.dtype == jnp.int32
    assert set(np.unique(np.asarray(l1))).issubset({0, 1})
    noisy = percentile_noise(key, imgs[0])
    assert noisy.shape == imgs[0].shape
    assert float(jnp.abs(noisy - imgs[0]).max()) > 0
