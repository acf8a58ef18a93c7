"""JPEG-LS codec (core/jlscodec.py) — T.87 round-trip and DICOM tests.

No independent JPEG-LS implementation exists in this environment (the
reference uses dcm2niix's embedded CharLS), so the decoder is validated by
exact lossless round trips over content classes that exercise every coding
path: pure run mode (flat), regular mode (noise), run interruptions
(piecewise/binary), both RItype contexts, bias drift (gradients), the
0xFF bit-stuffing path, and near-lossless error bounds.
"""

import os
import struct

import numpy as np
import pytest

from deepwmh_tpu.core import jlscodec as jls
from deepwmh_tpu.core.dicom import series_to_volume

from test_dicom import _el_explicit, _write_body


def _roundtrip(img, precision, near=0):
    enc = jls.encode(img, near=near, precision=precision)
    dec, p = jls.decode(enc)
    assert p == precision
    assert dec.shape == img.shape
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= near, "max err %d > NEAR %d" % (err, near)
    return enc


@pytest.mark.parametrize("precision", [8, 10, 12, 16])
def test_noise_lossless(precision):
    rng = np.random.RandomState(precision)
    img = (rng.rand(37, 53) * ((1 << precision) - 1)).astype(
        np.uint8 if precision <= 8 else np.uint16
    )
    _roundtrip(img, precision)


def test_flat_run_mode():
    enc = _roundtrip(np.full((31, 45), 117, np.uint8), 8)
    assert len(enc) < 64  # pure run mode compresses to almost nothing


def test_piecewise_runs_and_interruptions():
    img = np.zeros((48, 64), np.uint8)
    img[10:30, 12:50] = 200
    img[15:22, 20:28] = 90
    enc = _roundtrip(img, 8)
    assert len(enc) < img.nbytes // 10


def test_random_binary_run_churn():
    rng = np.random.RandomState(5)
    img = (rng.rand(50, 61) > 0.5).astype(np.uint8) * 255
    _roundtrip(img, 8)


def test_smooth_gradient_bias_paths():
    rng = np.random.RandomState(6)
    yy, xx = np.mgrid[0:64, 0:80]
    img = (
        2000 + 500 * np.sin(yy / 9.0) + 300 * np.cos(xx / 7.0)
        + rng.randn(64, 80) * 15
    ).astype(np.uint16)
    _roundtrip(img, 12)


def test_mri_like_head_slice():
    rng = np.random.RandomState(7)
    g = np.mgrid[0:96, 0:96]
    r = np.sqrt((g[0] - 48) ** 2 + (g[1] - 48) ** 2)
    img = ((r < 40) * (900 + 80 * rng.randn(96, 96))).clip(0, 4095)
    _roundtrip(img.astype(np.uint16), 12)


@pytest.mark.parametrize("near", [1, 3])
def test_near_lossless_bound(near):
    rng = np.random.RandomState(8)
    img = (rng.rand(40, 44) * 4095).astype(np.uint16)
    _roundtrip(img, 12, near=near)


def test_edge_shapes():
    rng = np.random.RandomState(9)
    for shape in [(1, 1), (1, 17), (23, 1), (2, 2), (3, 257)]:
        _roundtrip((rng.rand(*shape) * 255).astype(np.uint8), 8)


def test_default_thresholds_8bit():
    # MAXVAL=255 must give the classic T1/T2/T3 = 3/7/21, RESET 64
    assert jls._default_thresholds(255, 0) == (3, 7, 21, 64)


def test_interleaved_rejected():
    img = np.zeros((4, 4), np.uint8)
    enc = bytearray(jls.encode(img, precision=8))
    i = enc.find(bytes([0xFF, jls.SOS]))
    enc[i + 2 + 2 + 4] = 1  # ILV byte -> line interleaved
    with pytest.raises(jls.JlsError, match="interleaved"):
        jls.decode(bytes(enc))


def test_jpeg_ls_dicom_series(tmp_path):
    rng = np.random.RandomState(10)
    vol = (rng.rand(12, 10, 4) * 4000).astype(np.uint16)
    for i in range(4):
        stream = jls.encode(vol[:, :, i], precision=16)
        if len(stream) % 2:
            stream += b"\x00"
        encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
        encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(stream)) + stream
        encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        pixel_el = (
            struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
            + encaps
        )
        meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.80\x00")
        path = str(tmp_path / ("ls%02d.dcm" % i))
        with open(path, "wb") as f:
            f.write(
                b"\x00" * 128 + b"DICM" + meta
                + _write_body(pixel_el, 12, 10, i + 1, (0, 0, 3.0 * i))
            )
    paths = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    got, spacing, _ = series_to_volume(paths)
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def test_native_scan_decoder_matches_python():
    """native/jls.cpp must produce bit-identical output to the Python
    decode loop on every coding-path class."""
    from deepwmh_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(20)
    g = np.mgrid[0:96, 0:96]
    r = np.sqrt((g[0] - 48) ** 2 + (g[1] - 48) ** 2)
    head = ((r < 40) * (900 + 80 * rng.randn(96, 96))).clip(0, 4095)
    cases = [
        (np.full((31, 45), 117, np.uint8), 8, 0),
        ((rng.rand(40, 56) * 65535).astype(np.uint16), 16, 0),
        (head.astype(np.uint16), 12, 0),
        (head.astype(np.uint16), 12, 2),
        (((rng.rand(50, 61) > 0.5) * 255).astype(np.uint8), 8, 0),
    ]
    saved = native.jls_decode_scan_host
    for img, prec, near in cases:
        enc = jls.encode(img, near=near, precision=prec)
        dec_native, _ = jls.decode(enc)
        try:
            native.jls_decode_scan_host = lambda *a, **k: None
            dec_python, _ = jls.decode(enc)
        finally:
            native.jls_decode_scan_host = saved
        np.testing.assert_array_equal(dec_native, dec_python)
