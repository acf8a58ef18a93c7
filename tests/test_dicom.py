"""DICOM reader tests against an independently-written minimal DICOM writer."""

import os
import struct

import numpy as np

from deepwmh_tpu.core.dicom import convert_directory, read_dicom, series_to_volume


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if vr in (b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def write_test_dicom(path, pixel: np.ndarray, ipp, instance, series_uid="1.2.3.4"):
    rows, cols = pixel.shape
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    body = b""
    body += _el_explicit(0x0008, 0x0018, b"UI", b"1.2.3.4.5.%d" % instance)
    body += _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode())
    body += _el_explicit(0x0020, 0x0013, b"IS", str(instance).encode())
    body += _el_explicit(
        0x0020, 0x0032, b"DS", ("%g\\%g\\%g" % tuple(ipp)).encode()
    )
    body += _el_explicit(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _el_explicit(0x0028, 0x0030, b"DS", b"2\\2")
    body += _el_explicit(0x0018, 0x0050, b"DS", b"3")
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += _el_explicit(0x0028, 0x1052, b"DS", b"0")
    body += _el_explicit(0x0028, 0x1053, b"DS", b"1")
    body += _el_explicit(
        0x7FE0, 0x0010, b"OW", pixel.astype("<u2").tobytes()
    )
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def make_series(folder, n_slices=5, shape=(8, 10)):
    rng = np.random.RandomState(0)
    vol = (rng.rand(shape[0], shape[1], n_slices) * 1000).astype(np.uint16)
    # write slices shuffled to exercise sorting
    order = list(range(n_slices))
    rng.shuffle(order)
    for i in order:
        write_test_dicom(
            os.path.join(folder, "slice%02d.dcm" % i),
            vol[:, :, i],
            ipp=(0, 0, 3.0 * i),
            instance=i + 1,
        )
    return vol


def test_read_dicom_fields(tmp_path):
    vol = make_series(str(tmp_path))
    f = read_dicom(str(tmp_path / "slice00.dcm"))
    assert f["series_uid"].decode().strip("\x00") == "1.2.3.4"
    assert struct.unpack("<H", f["rows"][:2])[0] == 8


def test_series_to_volume_sorting(tmp_path):
    vol = make_series(str(tmp_path))
    paths = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    got, spacing, affine = series_to_volume(paths)
    assert got.shape == (8, 10, 5)
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])
    assert affine.shape == (4, 4)


def test_convert_directory(tmp_path):
    src = tmp_path / "dicom"
    os.makedirs(src)
    make_series(str(src))
    out = tmp_path / "nii"
    written = convert_directory(str(src), str(out), verbose=False)
    assert len(written) == 1
    from deepwmh_tpu.core import nifti

    data, hdr = nifti.load_nifti(written[0])
    assert data.shape == (8, 10, 5)
    assert [round(z, 3) for z in hdr.zooms[:3]] == [2.0, 2.0, 3.0]


def test_non_dicom_rejected(tmp_path):
    p = str(tmp_path / "x.dcm")
    with open(p, "wb") as f:
        f.write(b"not dicom")
    import pytest

    from deepwmh_tpu.core.dicom import DicomError

    with pytest.raises(DicomError):
        read_dicom(p)


# ---------------------------------------------------------------------------
# compressed transfer syntaxes
# ---------------------------------------------------------------------------

def _rle_encode_segment(data: bytes) -> bytes:
    """Independent PackBits encoder (literal-runs only — valid, if not
    minimal, PackBits output) for round-trip testing the decoder."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    if len(out) % 2:
        out.append(128)  # pad to even length with a no-op byte
    return bytes(out)


def _write_body(pixel_element: bytes, rows, cols, instance, ipp,
                series_uid="9.8.7") -> bytes:
    body = b""
    body += _el_explicit(0x0008, 0x0018, b"UI", b"9.8.7.%d" % instance)
    body += _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode())
    body += _el_explicit(0x0020, 0x0013, b"IS", str(instance).encode())
    body += _el_explicit(0x0020, 0x0032, b"DS",
                         ("%g\\%g\\%g" % tuple(ipp)).encode())
    body += _el_explicit(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _el_explicit(0x0028, 0x0030, b"DS", b"2\\2")
    body += _el_explicit(0x0018, 0x0050, b"DS", b"3")
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    return body + pixel_element


def write_rle_dicom(path, pixel: np.ndarray, ipp, instance):
    """RLE Lossless: 64-byte header + MSB/LSB byte-plane PackBits segments,
    wrapped in an encapsulated item sequence."""
    rows, cols = pixel.shape
    flat = pixel.astype("<u2").reshape(-1)
    hi = (flat >> 8).astype(np.uint8).tobytes()
    lo = (flat & 0xFF).astype(np.uint8).tobytes()
    seg_hi = _rle_encode_segment(hi)
    seg_lo = _rle_encode_segment(lo)
    header = struct.pack("<16I", 2, 64, 64 + len(seg_hi), *([0] * 13))
    frame = header + seg_hi + seg_lo
    if len(frame) % 2:
        frame += b"\x00"
    # encapsulation: empty Basic Offset Table item + one fragment + delimiter
    encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(frame)) + frame
    encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    pixel_el = struct.pack(
        "<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF
    ) + encaps
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.5\x00")
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta
                + _write_body(pixel_el, rows, cols, instance, ipp))


def test_rle_lossless_series(tmp_path):
    import zlib  # noqa: F401  (parallel to the deflated test below)

    rng = np.random.RandomState(3)
    vol = (rng.rand(8, 10, 4) * 4000).astype(np.uint16)
    for i in range(4):
        write_rle_dicom(
            str(tmp_path / ("rle%02d.dcm" % i)), vol[:, :, i],
            ipp=(0, 0, 3.0 * i), instance=i + 1,
        )
    paths = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    got, spacing, _ = series_to_volume(paths)
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def test_deflated_series(tmp_path):
    import zlib

    rng = np.random.RandomState(4)
    pixel = (rng.rand(6, 7) * 2000).astype(np.uint16)
    pixel_el = _el_explicit(0x7FE0, 0x0010, b"OW", pixel.astype("<u2").tobytes())
    body = _write_body(pixel_el, 6, 7, 1, (0, 0, 0))
    co = zlib.compressobj(wbits=-15)
    deflated = co.compress(body) + co.flush()
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1.99\x00")
    p = str(tmp_path / "deflated.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + deflated)
    f = read_dicom(p)
    got = np.frombuffer(f["pixel_data"], "<u2").reshape(6, 7)
    np.testing.assert_array_equal(got, pixel)


def test_unknown_syntax_rejected(tmp_path):
    import pytest

    from deepwmh_tpu.core.dicom import DicomError

    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.3.999.0\x00")
    p = str(tmp_path / "unknown.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta)
    with pytest.raises(DicomError, match="unsupported transfer syntax"):
        read_dicom(p)


def _el_be(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    if vr in (b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"):
        return struct.pack(">HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack(">HH2sH", group, elem, vr, len(value)) + value


def test_big_endian_series(tmp_path):
    """Retired Explicit VR Big Endian: big-endian element headers, binary
    values and pixel words after the (always-LE) file meta group."""
    rng = np.random.RandomState(6)
    pixel = (rng.rand(6, 7) * 3000).astype(np.uint16)
    body = b""
    body += _el_be(0x0008, 0x0018, b"UI", b"4.4.4.1")
    body += _el_be(0x0020, 0x000E, b"UI", b"4.4.4.series")
    body += _el_be(0x0020, 0x0013, b"IS", b"1")
    body += _el_be(0x0020, 0x0032, b"DS", b"0\\0\\0")
    body += _el_be(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
    body += _el_be(0x0028, 0x0010, b"US", struct.pack(">H", 6))
    body += _el_be(0x0028, 0x0011, b"US", struct.pack(">H", 7))
    body += _el_be(0x0028, 0x0030, b"DS", b"2\\2")
    body += _el_be(0x0018, 0x0050, b"DS", b"3")
    body += _el_be(0x0028, 0x0100, b"US", struct.pack(">H", 16))
    body += _el_be(0x0028, 0x0103, b"US", struct.pack(">H", 0))
    body += _el_be(0x7FE0, 0x0010, b"OW", pixel.astype(">u2").tobytes())
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.2\x00")
    p = str(tmp_path / "be.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    got, spacing, _ = series_to_volume([p])
    np.testing.assert_allclose(got[:, :, 0], pixel.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def test_multiframe_rejected(tmp_path):
    """Multi-frame pixel data must raise, not silently decode frame 1."""
    import pytest

    from deepwmh_tpu.core.dicom import DicomError

    rng = np.random.RandomState(7)
    pixel = (rng.rand(6, 7) * 2000).astype(np.uint16)
    body = b""
    body += _el_explicit(0x0008, 0x0018, b"UI", b"3.3.3.1")
    body += _el_explicit(0x0020, 0x000E, b"UI", b"3.3.3.series")
    body += _el_explicit(0x0028, 0x0008, b"IS", b"2")  # NumberOfFrames
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 6))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 7))
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += _el_explicit(
        0x7FE0, 0x0010, b"OW", pixel.astype("<u2").tobytes() * 2
    )
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    p = str(tmp_path / "mf.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    with pytest.raises(DicomError, match="multi-frame"):
        series_to_volume([p])


def _sq_item(payload: bytes) -> bytes:
    return struct.pack("<HHI", 0xFFFE, 0xE000, len(payload)) + payload


def _nested_sq(group, elem, items: bytes) -> bytes:
    # defined-length SQ element containing the given item bytes
    return struct.pack("<HH2sHI", group, elem, b"SQ", 0, len(items)) + items


def _enhanced_body(nf, rows, cols, pixel_element, iop=b"1\\0\\0\\0\\1\\0"):
    """Enhanced-MR layout: geometry in shared/per-frame functional groups
    instead of top-level tags."""
    shared_inner = b""
    shared_inner += _nested_sq(
        0x0020, 0x9116, _sq_item(_el_explicit(0x0020, 0x0037, b"DS", iop))
    )
    shared_inner += _nested_sq(
        0x0028, 0x9110,
        _sq_item(
            _el_explicit(0x0028, 0x0030, b"DS", b"2\\2")
            + _el_explicit(0x0018, 0x0088, b"DS", b"3")
        ),
    )
    shared = _nested_sq(0x5200, 0x9229, _sq_item(shared_inner))

    perframe_items = b""
    for k in range(nf):
        inner = _nested_sq(
            0x0020, 0x9113,
            _sq_item(
                _el_explicit(0x0020, 0x0032, b"DS", b"0\\0\\%d" % (3 * k))
            ),
        )
        perframe_items += _sq_item(inner)
    perframe = _nested_sq(0x5200, 0x9230, perframe_items)

    body = b""
    body += _el_explicit(0x0008, 0x0018, b"UI", b"2.2.2.1")
    body += _el_explicit(0x0020, 0x000E, b"UI", b"2.2.2.series")
    body += _el_explicit(0x0020, 0x0013, b"IS", b"1")
    body += _el_explicit(0x0028, 0x0008, b"IS", str(nf).encode())
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += shared + perframe + pixel_element
    return body


def test_enhanced_multiframe_native(tmp_path):
    """Enhanced multi-frame file (native pixels, per-frame plane positions
    in functional groups) expands into an ordered volume."""
    rng = np.random.RandomState(8)
    vol = (rng.rand(10, 12, 4) * 3000).astype(np.uint16)
    nf = 4
    pix = np.moveaxis(vol, -1, 0)  # [nf, rows, cols]
    pixel_el = _el_explicit(0x7FE0, 0x0010, b"OW", pix.astype("<u2").tobytes())
    body = _enhanced_body(nf, 10, 12, pixel_el)
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    p = str(tmp_path / "enh.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    got, spacing, _ = series_to_volume([p])
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def test_enhanced_multiframe_jpeg_lossless(tmp_path):
    """Enhanced multi-frame with one JPEG-Lossless fragment per frame."""
    from deepwmh_tpu.core import jpegcodec as jc

    rng = np.random.RandomState(9)
    vol = (rng.rand(9, 11, 3) * 4000).astype(np.uint16)
    nf = 3
    encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    for k in range(nf):
        stream = jc.encode_lossless(vol[:, :, k], predictor=1, precision=16)
        if len(stream) % 2:
            stream += b"\x00"
        encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(stream)) + stream
    encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    pixel_el = (
        struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF) + encaps
    )
    body = _enhanced_body(nf, 9, 11, pixel_el)
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.70\x00")
    p = str(tmp_path / "enh_jpeg.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    got, spacing, _ = series_to_volume([p])
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def _undef_sq(group, elem, items: bytes) -> bytes:
    """Undefined-length SQ element + items + sequence delimiter."""
    return (
        struct.pack("<HH2sHI", group, elem, b"SQ", 0, 0xFFFFFFFF)
        + items
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )


def _undef_item(payload: bytes) -> bytes:
    """Undefined-length item + payload elements + item delimiter."""
    return (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
        + payload
        + struct.pack("<HHI", 0xFFFE, 0xE00D, 0)
    )


def test_enhanced_multiframe_undefined_length_sequences(tmp_path):
    """The same enhanced layout but with UNDEFINED-length functional-group
    sequences and items (a legal, common encoding): nested defined-length
    items inside undefined-length items must parse."""
    rng = np.random.RandomState(12)
    nf = 3
    vol = (rng.rand(8, 9, nf) * 2000).astype(np.uint16)
    pix = np.moveaxis(vol, -1, 0)
    pixel_el = _el_explicit(0x7FE0, 0x0010, b"OW", pix.astype("<u2").tobytes())

    shared_inner = _undef_sq(
        0x0020, 0x9116, _sq_item(_el_explicit(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0"))
    ) + _undef_sq(
        0x0028, 0x9110,
        _undef_item(
            _el_explicit(0x0028, 0x0030, b"DS", b"2\\2")
            + _el_explicit(0x0018, 0x0088, b"DS", b"3")
        ),
    )
    shared = _undef_sq(0x5200, 0x9229, _undef_item(shared_inner))

    perframe_items = b""
    for k in range(nf):
        inner = _undef_sq(
            0x0020, 0x9113,
            _sq_item(_el_explicit(0x0020, 0x0032, b"DS", b"0\\0\\%d" % (3 * k))),
        )
        perframe_items += _undef_item(inner)
    perframe = _undef_sq(0x5200, 0x9230, perframe_items)

    body = b""
    body += _el_explicit(0x0008, 0x0018, b"UI", b"2.2.3.1")
    body += _el_explicit(0x0020, 0x000E, b"UI", b"2.2.3.series")
    body += _el_explicit(0x0020, 0x0013, b"IS", b"1")
    body += _el_explicit(0x0028, 0x0008, b"IS", str(nf).encode())
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 8))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 9))
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += shared + perframe + pixel_el
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    p = str(tmp_path / "enh_undef.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    got, spacing, _ = series_to_volume([p])
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def test_single_frame_multifragment_rle_rejected(tmp_path):
    """Two RLE fragments for one frame must raise, not decode garbage."""
    import pytest

    from deepwmh_tpu.core.dicom import DicomError

    rng = np.random.RandomState(13)
    pixel = (rng.rand(6, 7) * 2000).astype(np.uint16)
    flat = pixel.astype("<u2").reshape(-1)
    hi = _rle_encode_segment((flat >> 8).astype(np.uint8).tobytes())
    lo = _rle_encode_segment((flat & 0xFF).astype(np.uint8).tobytes())
    header = struct.pack("<16I", 2, 64, 64 + len(hi), *([0] * 13))
    frame = header + hi + lo
    if len(frame) % 2:
        frame += b"\x00"
    half = (len(frame) // 2) & ~1
    encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    encaps += struct.pack("<HHI", 0xFFFE, 0xE000, half) + frame[:half]
    encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(frame) - half) + frame[half:]
    encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    pixel_el = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF) + encaps
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.5\x00")
    p = str(tmp_path / "rle2frag.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta
                + _write_body(pixel_el, 6, 7, 1, (0, 0, 0)))
    with pytest.raises(DicomError, match="RLE fragments"):
        series_to_volume([p])


def _write_signed_body(pixel_element: bytes, rows, cols, instance, ipp,
                       bits_stored=12, series_uid="9.8.12") -> bytes:
    """Like _write_body but PixelRepresentation=1 (signed) + BitsStored."""
    body = b""
    body += _el_explicit(0x0008, 0x0018, b"UI", b"9.8.12.%d" % instance)
    body += _el_explicit(0x0020, 0x000E, b"UI", series_uid.encode())
    body += _el_explicit(0x0020, 0x0013, b"IS", str(instance).encode())
    body += _el_explicit(0x0020, 0x0032, b"DS",
                         ("%g\\%g\\%g" % tuple(ipp)).encode())
    body += _el_explicit(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _el_explicit(0x0028, 0x0030, b"DS", b"1\\1")
    body += _el_explicit(0x0018, 0x0050, b"DS", b"1")
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0101, b"US", struct.pack("<H", bits_stored))
    body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 1))
    return body + pixel_element


def _encapsulate(stream: bytes) -> bytes:
    if len(stream) % 2:
        stream += b"\x00"
    encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(stream)) + stream
    encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    return struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF) + encaps


def test_signed_12bit_jpeg_lossless_sign_extension(tmp_path):
    """A 12-bit SIGNED series (PixelRepresentation=1, BitsStored=12, common
    on Philips/GE exports) stores -1 as 0xFFF: the decoder must sign-extend
    from the CODESTREAM precision, not the 16-bit container width."""
    from deepwmh_tpu.core import jpegcodec as jc

    rng = np.random.RandomState(12)
    signed = (rng.rand(6, 7, 3) * 4096 - 2048).astype(np.int16)
    signed[0, 0, :] = -1      # 0xFFF stored — the poster-child value
    signed[1, 1, :] = -2048   # most-negative 12-bit
    signed[2, 2, :] = 2047    # most-positive 12-bit
    for k in range(3):
        codes = (signed[:, :, k].astype(np.int32) & 0xFFF).astype(np.uint16)
        stream = jc.encode_lossless(codes, predictor=1, precision=12)
        meta = _el_explicit(0x0002, 0x0010, b"UI",
                            b"1.2.840.10008.1.2.4.70\x00")
        p = str(tmp_path / ("s12_%02d.dcm" % k))
        with open(p, "wb") as f:
            f.write(b"\x00" * 128 + b"DICM" + meta
                    + _write_signed_body(_encapsulate(stream), 6, 7, k + 1,
                                         (0, 0, float(k))))
    paths = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    got, _, _ = series_to_volume(paths)
    np.testing.assert_allclose(got, signed.astype(np.float32))


def test_signed_12bit_jpegls_sign_extension(tmp_path):
    """Same contract through the JPEG-LS (T.87) path."""
    from deepwmh_tpu.core import jlscodec as jls

    rng = np.random.RandomState(13)
    signed = (rng.rand(5, 8) * 4096 - 2048).astype(np.int16)
    signed[0, 0] = -1
    codes = (signed.astype(np.int32) & 0xFFF).astype(np.uint16)
    stream = jls.encode(codes, near=0, precision=12)
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.80\x00")
    p = str(tmp_path / "s12ls.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta
                + _write_signed_body(_encapsulate(stream), 5, 8, 1, (0, 0, 0)))
    got, _, _ = series_to_volume([p])
    np.testing.assert_allclose(got[:, :, 0], signed.astype(np.float32))


def test_long_form_vr_uc_does_not_desync_parser(tmp_path):
    """UC (and friends: UR/OD/OL/OV/SV/UV) are long-form explicit VRs
    (PS3.5 7.1.2); parsing one with a 2-byte length would desync every
    subsequent tag (regression)."""
    from deepwmh_tpu.core.dicom import read_dicom

    def long_el(group, elem, vr, value):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value

    pixel = (np.arange(20, dtype="<u2").reshape(4, 5) * 7).astype("<u2")
    meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    body = long_el(0x0008, 0x0119, b"UC", b"LONGCODE")  # before Rows!
    body += _el_explicit(0x0020, 0x000E, b"UI", b"5.5.5")
    body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 4))
    body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 5))
    body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += _el_explicit(0x7FE0, 0x0010, b"OW", pixel.tobytes())
    p = str(tmp_path / "uc.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    f = read_dicom(p)
    assert struct.unpack("<H", f["rows"][:2])[0] == 4
    assert struct.unpack("<H", f["cols"][:2])[0] == 5
    assert "pixel_data" in f


def test_convert_directory_skips_broken_series(tmp_path):
    """A series whose slices have mixed shapes (np.stack ValueError, not a
    DicomError) must be skipped, not abort the whole import batch."""
    from deepwmh_tpu.core.dicom import convert_directory

    d = tmp_path / "dcm"
    d.mkdir()
    make_series(str(d), n_slices=3)  # good series 1.2.3.4
    # broken series: two slices with different shapes
    write_test_dicom(str(d / "bad1.dcm"), np.zeros((4, 4), np.uint16),
                     ipp=(0, 0, 0), instance=1, series_uid="9.9.9")
    write_test_dicom(str(d / "bad2.dcm"), np.zeros((6, 6), np.uint16),
                     ipp=(0, 0, 3), instance=2, series_uid="9.9.9")
    out = tmp_path / "out"
    written = convert_directory(str(d), str(out), verbose=False)
    assert len(written) == 1  # good series converted, bad skipped
