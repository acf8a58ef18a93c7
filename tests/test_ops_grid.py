import numpy as np
import numpy.ma as ma
import jax.numpy as jnp
from scipy.ndimage import zoom

from deepwmh_tpu.ops.grid import mean_std_grid


def _numpy_mean_std_grid(data, patch_size, mask=None, order=1):
    """Independent numpy re-derivation of the overlapping-patch local stats
    spec (reference image_ops.py:56-170) used as the golden model."""
    p = list(2 * np.ceil(np.array(patch_size) / 2).astype(int))
    step = [v // 2 for v in p]
    shape = data.shape
    padded_shape = list(np.array(p) * np.ceil(np.array(shape) / np.array(p)).astype(int))
    pad = np.zeros(padded_shape, np.float32)
    pad[: shape[0], : shape[1], : shape[2]] = data
    if mask is not None:
        mpad = np.zeros(padded_shape, np.float32)
        mpad[: shape[0], : shape[1], : shape[2]] = (mask > 0.5).astype(np.float32)
    G = [padded_shape[i] // step[i] for i in range(3)]
    mg = np.zeros(G)
    sg = np.zeros(G)
    for i in range(G[0]):
        for j in range(G[1]):
            for k in range(G[2]):
                sl = (
                    slice(i * step[0], i * step[0] + p[0]),
                    slice(j * step[1], j * step[1] + p[1]),
                    slice(k * step[2], k * step[2] + p[2]),
                )
                blk = pad[sl]
                if mask is not None:
                    mblk = mpad[sl]
                    if mblk.sum() > 0:
                        mm = ma.masked_array(blk, mask=1 - mblk)
                        mu, sd = mm.mean(), mm.std()
                    else:
                        mu, sd = 0, 1e-5
                else:
                    mu = blk.mean()
                    sd = max(blk.std(), 1e-5)
                mg[i, j, k] = mu
                sg[i, j, k] = sd
    big_m = np.zeros([g + 2 for g in G])
    big_s = np.zeros([g + 2 for g in G])
    big_m[1 : 1 + G[0], 1 : 1 + G[1], 1 : 1 + G[2]] = mg
    big_s[1 : 1 + G[0], 1 : 1 + G[1], 1 : 1 + G[2]] = sg
    mi = zoom(big_m, step, order=order)
    si = zoom(big_s, step, order=order)
    off = [s // 2 for s in step]
    mi = mi[
        off[0] : off[0] + G[0] * step[0],
        off[1] : off[1] + G[1] * step[1],
        off[2] : off[2] + G[2] * step[2],
    ][: shape[0], : shape[1], : shape[2]]
    si = si[
        off[0] : off[0] + G[0] * step[0],
        off[1] : off[1] + G[1] * step[1],
        off[2] : off[2] + G[2] * step[2],
    ][: shape[0], : shape[1], : shape[2]]
    return mi, si


def test_mean_std_grid_unmasked(rng):
    data = rng.rand(21, 18, 15).astype(np.float32)
    mi, si = mean_std_grid(jnp.asarray(data), [6, 6, 6])
    wmi, wsi = _numpy_mean_std_grid(data, [6, 6, 6])
    np.testing.assert_allclose(np.asarray(mi), wmi, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(si), wsi, rtol=1e-3, atol=1e-4)


def test_mean_std_grid_masked(rng):
    data = rng.rand(16, 14, 12).astype(np.float32)
    mask = (rng.rand(16, 14, 12) > 0.4).astype(np.float32)
    mi, si = mean_std_grid(jnp.asarray(data), [5, 4, 7], mask=jnp.asarray(mask))
    wmi, wsi = _numpy_mean_std_grid(data, [5, 4, 7], mask=mask)
    np.testing.assert_allclose(np.asarray(mi), wmi, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(si), wsi, rtol=1e-3, atol=1e-4)


def test_mean_std_grid_odd_patch_evenified(rng):
    data = rng.rand(10, 10, 10).astype(np.float32)
    mi3, _ = mean_std_grid(jnp.asarray(data), [3, 3, 3])
    mi4, _ = mean_std_grid(jnp.asarray(data), [4, 4, 4])
    np.testing.assert_allclose(np.asarray(mi3), np.asarray(mi4))
