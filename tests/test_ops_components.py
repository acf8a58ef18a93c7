import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from deepwmh_tpu.ops import components as C


def _random_blobs(rng, shape, p=0.3):
    return (rng.rand(*shape) < p).astype(np.float32)


def test_label_components_equivalence(rng):
    m = _random_blobs(rng, (12, 10, 8), 0.35)
    lbl = np.asarray(C.label_components(jnp.asarray(m)))
    want_lbl, n = ndi.label(m)
    # same partition: map each scipy component to our root label; must be 1:1
    roots = set()
    for i in range(1, n + 1):
        sel = want_lbl == i
        ours = np.unique(lbl[sel])
        assert len(ours) == 1, "component split"
        roots.add(int(ours[0]))
    assert len(roots) == n, "components merged"
    # background voxels get N
    assert (lbl[m < 0.5] == m.size).all()


def test_component_sizes(rng):
    m = _random_blobs(rng, (9, 9, 9), 0.3)
    lbl = C.label_components(jnp.asarray(m))
    sz = np.asarray(C.component_sizes(lbl))
    want_lbl, n = ndi.label(m)
    for i in range(1, n + 1):
        sel = want_lbl == i
        np.testing.assert_allclose(sz[sel], sel.sum())
    assert (sz[m < 0.5] == 0).all()


def test_remove_sparks(rng):
    m = _random_blobs(rng, (10, 10, 10), 0.25)
    got = np.asarray(C.remove_sparks(jnp.asarray(m), min_volume=3))
    want_lbl, n = ndi.label(m)
    want = np.zeros_like(m)
    for i in range(1, n + 1):
        if (want_lbl == i).sum() >= 3:
            want[want_lbl == i] = 1
    np.testing.assert_allclose(got, want)


def test_remove_3mm_sparks_min_volume_rule():
    assert C.spark_min_volume([1.0, 1.0, 1.0]) == 3
    assert C.spark_min_volume([1.0, 1.0, 5.0]) == 3  # thick slice: 3 voxels
    assert C.spark_min_volume([0.5, 0.5, 0.5]) == 24
    assert C.spark_min_volume([2.0, 2.0, 2.0]) == 2  # clamped to 2


def test_largest_component_3d(rng):
    m = np.zeros((10, 10, 10), np.float32)
    m[1:4, 1:4, 1:4] = 1  # 27 voxels
    m[6:8, 6:8, 6:8] = 1  # 8 voxels
    got = np.asarray(C.largest_component(jnp.asarray(m)))
    want = np.zeros_like(m)
    want[1:4, 1:4, 1:4] = 1
    np.testing.assert_allclose(got, want)


def test_largest_component_per_slice(rng):
    m = np.zeros((3, 8, 8), np.float32)
    m[0, 0:3, 0:3] = 1
    m[0, 5:7, 5:7] = 1
    m[2, 4:8, 4:8] = 1
    got = np.asarray(C.largest_component(jnp.asarray(m), axes=(1, 2)))
    want = np.zeros_like(m)
    want[0, 0:3, 0:3] = 1
    want[2, 4:8, 4:8] = 1
    np.testing.assert_allclose(got, want)


def _numpy_component_filtering(mask, voxel_size):
    """Independent numpy golden model of reference image_ops.py:256-308."""
    from scipy.ndimage import binary_erosion, label

    def max_comp(m2d):
        lab, n = label(m2d)
        if n == 0:
            return np.zeros_like(lab, np.float32)
        best_v, best_i = 0, None
        for i in range(1, n + 1):
            v = (lab == i).sum()
            if v > best_v:
                best_v, best_i = v, i
        return (lab == best_i).astype(np.float32)

    pv = voxel_size
    if max(pv) / min(pv) > 3:
        do = [False, False, False]
        do[int(np.argmax(pv))] = True
    else:
        do = [True, True, True]
    outs = []
    for ax in range(3):
        vol = np.zeros_like(mask)
        for s in range(mask.shape[ax]):
            sl = [slice(None)] * 3
            sl[ax] = s
            sl = tuple(sl)
            if do[ax]:
                vol[sl] = max_comp(binary_erosion(mask[sl]))
            else:
                vol[sl] = mask[sl]
        outs.append(vol)
    return ((outs[0] + outs[1] + outs[2]) > 0.5).astype(np.float32)


def test_component_filtering_isotropic(rng):
    m = np.zeros((10, 12, 11), np.float32)
    m[2:8, 2:9, 2:8] = 1  # big solid brain-ish block
    m[0, 0, 0] = 1  # spark
    m[9, 11, 10] = 1  # spark
    got = np.asarray(C.component_filtering(jnp.asarray(m), [1.0, 1.0, 1.0]))
    want = _numpy_component_filtering(m, [1.0, 1.0, 1.0])
    np.testing.assert_allclose(got, want)


def test_component_filtering_thick_slice(rng):
    m = _random_blobs(rng, (8, 8, 4), 0.5)
    m[2:6, 2:6, :] = 1
    got = np.asarray(C.component_filtering(jnp.asarray(m), [1.0, 1.0, 4.0]))
    want = _numpy_component_filtering(m, [1.0, 1.0, 4.0])
    np.testing.assert_allclose(got, want)


def test_average_contiguous_labels(rng):
    stack = rng.randint(0, 4, size=(5, 6, 6, 6)).astype(np.float32)
    got = np.asarray(C.average_contiguous_labels(jnp.asarray(stack), num_classes=4))
    # golden: per-class vote then argmax (ties -> lowest class)
    counts = np.zeros((4, 6, 6, 6))
    for ch in range(4):
        counts[ch] = (stack.astype(int) == ch).sum(axis=0)
    want = np.argmax(counts, axis=0)
    np.testing.assert_allclose(got, want)


def test_map_label():
    lab = np.array([[0, 1, 5], [5, 2, 1]], np.float32)
    got = C.map_label(lab, [1, 5], [2, 4])
    want = np.array([[0, 2, 4], [4, 0, 2]])
    np.testing.assert_allclose(got, want)
