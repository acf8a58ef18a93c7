import gzip

import numpy as np
import pytest
import scipy.ndimage as ndi

from deepwmh_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_label_components_matches_scipy(rng):
    m = (rng.rand(30, 28, 26) < 0.35).astype(np.float32)
    labels, n = native.label_components_host(m)
    want, n_want = ndi.label(m)
    assert n == n_want
    # identical partitions with identical raster-order numbering
    np.testing.assert_array_equal(labels, want)


def test_remove_small_components(rng):
    m = (rng.rand(20, 20, 20) < 0.2).astype(np.float32)
    got = native.remove_small_components_host(m, 3)
    want_lbl, n = ndi.label(m)
    want = np.zeros_like(m)
    for i in range(1, n + 1):
        if (want_lbl == i).sum() >= 3:
            want[want_lbl == i] = 1
    np.testing.assert_allclose(got, want)


def test_gzip_roundtrip(rng):
    payload = rng.bytes(100000) + b"\x00" * 50000
    compressed = native.gzip_deflate_host(payload)
    assert compressed is not None
    # interoperable with Python's gzip
    assert gzip.decompress(compressed) == payload
    back = native.gzip_inflate_host(gzip.compress(payload), len(payload))
    assert back == payload


def test_gzip_inflate_grows_buffer(rng):
    payload = b"a" * 1000000  # highly compressible; underestimate size
    compressed = gzip.compress(payload)
    back = native.gzip_inflate_host(compressed, 1024)
    assert back == payload
