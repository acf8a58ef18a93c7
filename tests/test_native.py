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


def test_gzip_multimember(rng):
    """pigz/bgzip emit multi-member gzip files; all members must inflate."""
    a, b = rng.bytes(50000), rng.bytes(30000)
    blob = gzip.compress(a) + gzip.compress(b)
    out = native.gzip_inflate_host(blob, len(a) + len(b))
    assert out == a + b


def test_gzip_truncated_input_fails_fast(rng):
    payload = rng.bytes(200000)
    blob = gzip.compress(payload)[: len(payload) // 4]  # truncated mid-stream
    out = native.gzip_inflate_host(blob, len(payload))
    assert out is None  # corrupt, NOT retried with ever-larger buffers


def test_nifti_multimember_gz_roundtrip(tmp_path, rng):
    """A bgzip-style multi-member .nii.gz must load through the native path."""
    from deepwmh_tpu.core import nifti

    data = rng.rand(10, 10, 10).astype(np.float32)
    p = str(tmp_path / "v.nii.gz")
    nifti.save_nifti_simple(data, p)
    raw = gzip.decompress(open(p, "rb").read())
    half = len(raw) // 2
    with open(p, "wb") as f:
        f.write(gzip.compress(raw[:half]) + gzip.compress(raw[half:]))
    out = nifti.load_nifti_simple(p)
    np.testing.assert_allclose(out, data)


def test_gzip_chunked_feeding_matches_unchunked():
    """The zlib helpers feed buffers in chunks so int64 (>4 GiB) sizes
    never truncate; tiny test chunks exercise every refill path including
    multi-member streams."""
    import gzip as _gzip

    from deepwmh_tpu import native

    lib = native.get_lib()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.RandomState(0)
    raw = (rng.rand(4096) * 255).astype(np.uint8).tobytes()
    two_members = _gzip.compress(raw[:1000]) + _gzip.compress(raw[1000:])
    want_deflate = native.gzip_deflate_host(raw)
    try:
        lib.gzip_set_chunk_for_testing(7)  # pathological: 7-byte windows
        assert native.gzip_inflate_host(want_deflate, len(raw))[: len(raw)] == raw
        assert (
            native.gzip_inflate_host(two_members, len(raw))[: len(raw)] == raw
        )
        chunked_deflate = native.gzip_deflate_host(raw)
        assert _gzip.decompress(chunked_deflate) == raw
    finally:
        lib.gzip_set_chunk_for_testing(0)  # restore the 1 GiB default
