"""From-scratch JPEG codec (core/jpegcodec.py) — round-trip, interop, and
DICOM integration tests.

The reference delegates every compressed syntax to the dcm2niix binary
(/root/reference/deepwmh/external_tools/dcm2niix.py:54); here the JPEG
family is decoded in-process, so the tests cover: exact lossless round
trips for all 7 predictors, point transform, restart intervals, 8/12/16-bit
precision; DCT round trips at 8/12 bit; cross-validation against PIL as an
independent JPEG implementation; and end-to-end encapsulated-DICOM series
conversion.
"""

import io
import os
import struct

import numpy as np
import pytest

from deepwmh_tpu.core import jpegcodec as jc
from deepwmh_tpu.core.dicom import series_to_volume

from test_dicom import _el_explicit, _write_body


def _mri_like(shape, top, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    img = (
        0.45 * top
        + 0.25 * top * np.sin(yy / 9.0) * np.cos(xx / 7.0)
        + rng.randn(*shape) * top * 0.01
    )
    return np.clip(img, 0, top)


@pytest.mark.parametrize("precision", [8, 12, 16])
@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_roundtrip_exact(precision, predictor):
    top = (1 << precision) - 1
    dt = np.uint8 if precision <= 8 else np.uint16
    img = _mri_like((23, 31), top, seed=predictor).astype(dt)
    enc = jc.encode_lossless(img, predictor=predictor, precision=precision)
    dec, p = jc.decode(enc)
    assert p == precision
    np.testing.assert_array_equal(dec, img)


def test_lossless_random_noise_exact():
    # worst case for prediction: uniform noise over the full 16-bit range
    rng = np.random.RandomState(7)
    img = (rng.rand(40, 56) * 65535).astype(np.uint16)
    enc = jc.encode_lossless(img, predictor=1, precision=16)
    dec, _ = jc.decode(enc)
    np.testing.assert_array_equal(dec, img)


def test_lossless_point_transform():
    rng = np.random.RandomState(2)
    img = (rng.rand(16, 18) * 255).astype(np.uint8)
    enc = jc.encode_lossless(img, predictor=1, precision=8, point_transform=2)
    dec, _ = jc.decode(enc)
    np.testing.assert_array_equal(dec, (img >> 2) << 2)


def test_lossless_restart_intervals():
    img = _mri_like((40, 24), 4095, seed=5).astype(np.uint16)
    enc = jc.encode_lossless(
        img, predictor=4, precision=12, restart_interval=24 * 5
    )
    assert b"\xff\xd0" in enc  # RST0 actually emitted
    dec, _ = jc.decode(enc)
    np.testing.assert_array_equal(dec, img)


def test_lossless_row_unaligned_restart_rejected():
    img = np.zeros((8, 10), np.uint8)
    with pytest.raises(jc.JpegError, match="multiple of the image"):
        jc.encode_lossless(img, restart_interval=7)


@pytest.mark.parametrize("predictor", [1, 4, 7])
def test_lossless_fast_path_matches_general(predictor):
    """The fast single-component path (native or numpy) and the general
    serial decoder must agree exactly."""
    img = _mri_like((33, 47), 4095, seed=9).astype(np.uint16)
    enc = jc.encode_lossless(img, predictor=predictor, precision=12)
    st = jc._parse_stream(enc)
    fast, _ = jc._decode_lossless_1comp_fast(st)
    slow, _ = jc._decode_lossless(st)
    np.testing.assert_array_equal(fast, slow)
    np.testing.assert_array_equal(fast, img)


def test_python_diff_decode_matches_native():
    """When the native kernel is present, its Huffman pass must agree with
    the pure-Python bit loop on the same stream."""
    from deepwmh_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    img = _mri_like((29, 41), 65535, seed=14).astype(np.uint16)
    enc = jc.encode_lossless(img, predictor=1, precision=16)
    st = jc._parse_stream(enc)
    (sel, _psv, _se, _ah, _pt), entropy = st["scans"][0]
    lut = jc._huff_lut_np(*st["huff_dc"][sel[0][1]])
    data = jc._unstuff(entropy)
    n = img.size
    d_native = native.jpegl_decode_diffs_host(data, lut, n)
    d_py = jc._decode_diffs_py(data, lut, n)
    assert d_native is not None
    np.testing.assert_array_equal(d_native, d_py)


@pytest.mark.parametrize("precision", [8, 12])
def test_dct_roundtrip(precision):
    top = (1 << precision) - 1
    dt = np.uint8 if precision == 8 else np.uint16
    img = _mri_like((64, 72), top, seed=3).astype(dt)
    enc = jc.encode_dct(img, quality=95, precision=precision)
    dec, p = jc.decode(enc)
    assert p == precision and dec.shape == img.shape
    rms = np.sqrt(((dec.astype(np.float64) - img) ** 2).mean())
    assert rms < top * 0.01, rms


def test_dct_restart_intervals():
    img = _mri_like((48, 40), 255, seed=4).astype(np.uint8)
    enc = jc.encode_dct(img, quality=90, precision=8, restart_interval=7)
    assert b"\xff\xd0" in enc
    dec, _ = jc.decode(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).max() < 16


def test_progressive_rejected():
    # minimal stream with a SOF2 marker: decode must name the problem
    data = (
        b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xC2, 11)
        + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        + b"\xff\xd9"
    )
    with pytest.raises(jc.JpegError, match="progressive"):
        jc.decode(data)


def test_huffman_table_validity():
    """Encoder-built tables must be prefix-valid (Kraft sum <= 1) even for
    degenerate single-symbol histograms."""
    for freq in ([0] * 16 + [1], [1000] + [0] * 16, [3, 1, 4, 1, 5] + [0] * 12):
        bits, values = jc._build_huffman(freq)
        assert sum(bits) == len(values)
        kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
        assert kraft <= 1.0


# ---------------------------------------------------------------------------
# PIL cross-validation (independent implementation)
# ---------------------------------------------------------------------------

PIL = pytest.importorskip("PIL.Image")


def test_decode_pil_encoded_baseline():
    img = _mri_like((100, 140), 255, seed=1).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img, "L").save(buf, "JPEG", quality=95)
    ours, p = jc.decode(buf.getvalue())
    theirs = np.asarray(PIL.open(io.BytesIO(buf.getvalue())))
    assert p == 8
    # IDCT implementations differ by at most one code value
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


def test_pil_decodes_our_baseline():
    img = _mri_like((80, 96), 255, seed=2).astype(np.uint8)
    enc = jc.encode_dct(img, quality=95, precision=8)
    theirs = np.asarray(PIL.open(io.BytesIO(enc)))
    err = np.abs(theirs.astype(int) - img.astype(int))
    assert np.sqrt((err.astype(float) ** 2).mean()) < 3.0


def test_decode_pil_encoded_color():
    img = _mri_like((64, 80), 255, seed=6).astype(np.uint8)
    rgb = np.stack([img, img[::-1, :], np.roll(img, 5, 1)], -1)
    buf = io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG", quality=92)
    ours, _ = jc.decode(buf.getvalue())
    theirs = np.asarray(PIL.open(io.BytesIO(buf.getvalue())))
    assert ours.shape == theirs.shape
    d = np.abs(ours.astype(int) - theirs.astype(int))
    # chroma upsampling flavor differs (nearest vs triangle filter):
    # small mean error, bounded max at chroma edges
    assert d.mean() < 4.0 and d.max() <= 48


# ---------------------------------------------------------------------------
# DICOM integration: encapsulated JPEG series -> volume
# ---------------------------------------------------------------------------


def _write_jpeg_dicom(path, pixel, ipp, instance, syntax_uid, stream):
    rows, cols = pixel.shape
    if len(stream) % 2:
        stream += b"\x00"
    encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty offset table
    encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(stream)) + stream
    encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    pixel_el = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF) + encaps
    meta = _el_explicit(0x0002, 0x0010, b"UI", syntax_uid.encode() + b"\x00")
    with open(path, "wb") as f:
        f.write(
            b"\x00" * 128 + b"DICM" + meta
            + _write_body(pixel_el, rows, cols, instance, ipp)
        )


def test_jpeg_lossless_dicom_series(tmp_path):
    rng = np.random.RandomState(11)
    vol = (rng.rand(12, 10, 5) * 4000).astype(np.uint16)
    for i in range(5):
        stream = jc.encode_lossless(vol[:, :, i], predictor=1, precision=16)
        _write_jpeg_dicom(
            str(tmp_path / ("jls%02d.dcm" % i)), vol[:, :, i],
            ipp=(0, 0, 3.0 * i), instance=i + 1,
            syntax_uid="1.2.840.10008.1.2.4.70", stream=stream,
        )
    paths = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    got, spacing, _ = series_to_volume(paths)
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def test_jpeg_lossless_multifragment_frame(tmp_path):
    """A single frame split across two fragments must be reassembled."""
    rng = np.random.RandomState(12)
    pixel = (rng.rand(9, 8) * 3000).astype(np.uint16)
    stream = jc.encode_lossless(pixel, predictor=1, precision=16)
    if len(stream) % 2:
        stream += b"\x00"
    cut = (len(stream) // 2) & ~1  # even split point
    frag1, frag2 = stream[:cut], stream[cut:]
    encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag1)) + frag1
    encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag2)) + frag2
    encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    pixel_el = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF) + encaps
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.57\x00")
    p = str(tmp_path / "frag.dcm")
    with open(p, "wb") as f:
        f.write(
            b"\x00" * 128 + b"DICM" + meta
            + _write_body(pixel_el, 9, 8, 1, (0, 0, 0))
        )
    got, _, _ = series_to_volume([p])
    np.testing.assert_allclose(got[:, :, 0], pixel.astype(np.float32))


def test_jpeg_baseline_dicom_series(tmp_path):
    """8-bit JPEG Baseline (.50): lossy, so compare with DCT tolerance."""
    img = _mri_like((32, 40), 255, seed=13).astype(np.uint8)
    stream = jc.encode_dct(img, quality=95, precision=8)
    p = str(tmp_path / "base.dcm")
    _write_jpeg_dicom(p, img, (0, 0, 0), 1, "1.2.840.10008.1.2.4.50", stream)
    # the helper writes BitsAllocated=16; patch an 8-bit body instead
    with open(p, "rb") as f:
        raw = f.read()
    raw = raw.replace(
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 8)),
    )
    with open(p, "wb") as f:
        f.write(raw)
    got, _, _ = series_to_volume([p])
    err = np.abs(got[:, :, 0] - img.astype(np.float32))
    assert np.sqrt((err ** 2).mean()) < 3.0
