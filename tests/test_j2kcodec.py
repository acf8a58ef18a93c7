"""JPEG 2000 decoder (core/j2kcodec.py) — layer-by-layer tests.

Validation strategy: the MQ coder round-trips against the module's own
T.88 encoder; the full decoder is validated against openjpeg-produced
streams (via PIL) in the tests added as each layer lands.
"""

import numpy as np
import pytest

from deepwmh_tpu.core import j2kcodec as j2k


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mq_roundtrip(seed):
    rng = np.random.RandomState(seed)
    for _ in range(40):
        n_cx = 19
        n = rng.randint(1, 5000)
        cxs = rng.randint(0, n_cx, n)
        bias = rng.rand(n_cx)
        bits = (rng.rand(n) < bias[cxs]).astype(int)
        enc = j2k._MQEncoder(n_cx)
        for cx, d in zip(cxs, bits):
            enc.encode(int(cx), int(d))
        dec = j2k._MQDecoder(enc.flush(), n_cx)
        got = [dec.decode(int(cx)) for cx in cxs]
        assert got == list(bits)


def test_mq_stuffing_and_carry():
    # all-LPS on a fresh context maximizes 0xFF production
    enc = j2k._MQEncoder(1)
    bits = [1, 0] * 500 + [1] * 300
    for d in bits:
        enc.encode(0, d)
    data = enc.flush()
    dec = j2k._MQDecoder(data, 1)
    assert [dec.decode(0) for _ in bits] == bits


def _mk(h, w, top=255, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(
        top * 0.5 + top * 0.27 * np.sin(yy / 7.0) * np.cos(xx / 5.0)
        + rng.randn(h, w) * top * 0.02,
        0, top,
    )


def test_sr1d_53_inverts_forward():
    """Synthesis must invert a straight T.800 F.4 analysis (lifting on the
    interleaved signal with whole-sample symmetric extension)."""

    def fwd53(x):
        n = len(x)
        if n == 1:
            return x.copy(), np.zeros(0, np.int64)

        def m(i):
            if i < 0:
                i = -i
            if i >= n:
                i = 2 * (n - 1) - i
            return i

        y = np.zeros(n, np.int64)
        for i in range(1, n, 2):
            y[i] = x[i] - ((x[m(i - 1)] + x[m(i + 1)]) >> 1)
        for i in range(0, n, 2):
            y[i] = x[i] + ((y[m(i - 1)] + y[m(i + 1)] + 2) >> 2)
        return y[0::2], y[1::2]

    rng = np.random.RandomState(0)
    for n in [1, 2, 3, 4, 5, 8, 9, 17, 64, 65, 101]:
        for _ in range(10):
            x = rng.randint(-500, 500, n).astype(np.int64)
            lo, hi = fwd53(x)
            np.testing.assert_array_equal(j2k._sr1d_53(lo, hi), x)


# ---- validation against openjpeg (via PIL) ----

PIL = pytest.importorskip("PIL.Image")
import io  # noqa: E402


def _enc(img, mode="L", **kw):
    buf = io.BytesIO()
    PIL.fromarray(img, mode).save(buf, "JPEG2000", **kw)
    return buf.getvalue()


@pytest.mark.parametrize(
    "shape", [(40, 56), (65, 67), (31, 257), (8, 8), (1, 50), (128, 96)]
)
def test_lossless_exact_vs_openjpeg(shape):
    img = _mk(*shape).astype(np.uint8)
    data = _enc(img, irreversible=False)
    got, p = j2k.decode(data)
    assert p == 8
    np.testing.assert_array_equal(got, np.asarray(PIL.open(io.BytesIO(data))))


def test_lossless_noise_exact():
    img = (np.random.RandomState(3).rand(77, 91) * 255).astype(np.uint8)
    data = _enc(img, irreversible=False)
    got, _ = j2k.decode(data)
    np.testing.assert_array_equal(got, img)


def test_rgb_rct_lossless_exact():
    img = _mk(48, 60).astype(np.uint8)
    rgb = np.stack([img, img[::-1], np.roll(img, 9, 1)], -1)
    data = _enc(rgb, "RGB", irreversible=False)
    got, _ = j2k.decode(data)
    np.testing.assert_array_equal(got, np.asarray(PIL.open(io.BytesIO(data))))


def test_irreversible_97_close():
    img = _mk(72, 88).astype(np.uint8)
    data = _enc(img, irreversible=True, quality_mode="rates", quality_layers=[0])
    got, _ = j2k.decode(data)
    pil = np.asarray(PIL.open(io.BytesIO(data)))
    d = np.abs(got.astype(int) - pil.astype(int))
    # float IDWT rounding differs between implementations by a code value
    assert d.max() <= 3 and d.mean() < 1.0


def test_multiple_quality_layers():
    img = _mk(80, 80).astype(np.uint8)
    data = _enc(
        img, irreversible=False, quality_mode="rates", quality_layers=[20, 5, 1]
    )
    got, _ = j2k.decode(data)
    np.testing.assert_array_equal(got, np.asarray(PIL.open(io.BytesIO(data))))


def test_codeblock_and_resolution_options():
    img = _mk(100, 90).astype(np.uint8)
    data = _enc(img, irreversible=False, codeblock_size=(32, 32), num_resolutions=4)
    got, _ = j2k.decode(data)
    np.testing.assert_array_equal(got, np.asarray(PIL.open(io.BytesIO(data))))


@pytest.mark.parametrize("prog", ["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"])
def test_progression_orders(prog):
    img = _mk(50, 44, seed=7).astype(np.uint8)
    data = _enc(img, irreversible=False, progression=prog)
    got, _ = j2k.decode(data)
    np.testing.assert_array_equal(got, np.asarray(PIL.open(io.BytesIO(data))))


def test_16bit_lossless_exact():
    img16 = (np.random.RandomState(5).rand(40, 48) * 4095).astype(np.uint16)
    buf = io.BytesIO()
    pimg = PIL.new("I;16", (48, 40))
    pimg.frombytes(img16.astype("<u2").tobytes())
    pimg.save(buf, "JPEG2000", irreversible=False)
    got, p = j2k.decode(buf.getvalue())
    assert p == 16
    np.testing.assert_array_equal(got.astype(np.uint16), img16)


def test_j2k_dicom_series(tmp_path):
    import os
    import struct

    from deepwmh_tpu.core.dicom import series_to_volume
    from test_dicom import _el_explicit, _write_body

    rng = np.random.RandomState(11)
    vol = (_mk(12, 10, top=4000, seed=2)[..., None] * np.ones(4)).astype(np.uint16)
    vol += (rng.rand(12, 10, 4) * 50).astype(np.uint16)
    for i in range(4):
        buf = io.BytesIO()
        pimg = PIL.new("I;16", (10, 12))
        pimg.frombytes(vol[:, :, i].astype("<u2").tobytes())
        pimg.save(buf, "JPEG2000", irreversible=False)
        stream = buf.getvalue()
        if len(stream) % 2:
            stream += b"\x00"
        encaps = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
        encaps += struct.pack("<HHI", 0xFFFE, 0xE000, len(stream)) + stream
        encaps += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
        pixel_el = (
            struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
            + encaps
        )
        meta = _el_explicit(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.90\x00")
        path = str(tmp_path / ("j2k%02d.dcm" % i))
        with open(path, "wb") as f:
            f.write(
                b"\x00" * 128 + b"DICM" + meta
                + _write_body(pixel_el, 12, 10, i + 1, (0, 0, 3.0 * i))
            )
    paths = [str(tmp_path / f) for f in sorted(os.listdir(tmp_path))]
    got, spacing, _ = series_to_volume(paths)
    np.testing.assert_allclose(got, vol.astype(np.float32))
    np.testing.assert_allclose(spacing, [2.0, 2.0, 3.0])


def test_native_tier1_matches_python():
    """native/j2k_t1.cpp must produce identical output to the Python
    _BlockDecoder across lossless and lossy streams."""
    from deepwmh_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    saved = native.j2k_decode_block_host
    for kw in [dict(irreversible=False), dict(irreversible=True)]:
        img = _mk(70, 66, seed=8).astype(np.uint8)
        data = _enc(img, **kw)
        got_native, _ = j2k.decode(data)
        try:
            native.j2k_decode_block_host = lambda *a, **k: None
            got_python, _ = j2k.decode(data)
        finally:
            native.j2k_decode_block_host = saved
        np.testing.assert_array_equal(got_native, got_python)


# --------------------------------------------------------------------------
# real-world code-block styles + markers, validated against codestreams
# produced by the SYSTEM libopenjp2 encoder (tests/openjpeg_enc.py drives it
# via ctypes with per-feature flags PIL does not expose)
# --------------------------------------------------------------------------


def _openjpeg_encoder_or_skip():
    import pytest

    try:
        from openjpeg_enc import get_encoder

        return get_encoder()
    except Exception as e:  # pragma: no cover - environment without the lib
        pytest.skip("libopenjp2 encoder unavailable: %s" % e)


def _style_image(seed=0, shape=(67, 53), prec=12):
    rng = np.random.RandomState(seed)
    # smooth structure + noise: exercises all pass types over many planes
    g = np.meshgrid(*[np.linspace(0, 4, s) for s in shape], indexing="ij")
    base = 900 * (np.sin(g[0]) + np.cos(1.3 * g[1])) + 1800
    img = base + 250 * rng.rand(*shape)
    return np.clip(img, 0, (1 << prec) - 1).astype(np.uint16)


import pytest


@pytest.mark.parametrize("mode,name", [
    (1, "bypass"),
    (4, "termall"),
    (5, "bypass+termall"),
    (2, "reset"),
    (8, "vsc"),
    (1 | 8, "bypass+vsc"),
    (1 | 2 | 4 | 8 | 16, "all-styles"),
])
def test_codeblock_styles_vs_openjpeg(mode, name):
    from deepwmh_tpu.core import j2kcodec

    enc = _openjpeg_encoder_or_skip()
    img = _style_image()
    stream = enc.encode(img, prec=12, mode=mode, levels=3)
    # sanity: openjpeg itself decodes its own stream losslessly
    from openjpeg_enc import pil_decode_j2k

    np.testing.assert_array_equal(pil_decode_j2k(stream, prec=12), img)
    got, prec = j2kcodec.decode(stream)
    assert prec == 12
    np.testing.assert_array_equal(got, img, err_msg=name)


def test_sop_eph_markers_vs_openjpeg():
    from deepwmh_tpu.core import j2kcodec

    enc = _openjpeg_encoder_or_skip()
    img = _style_image(seed=1)
    stream = enc.encode(img, prec=12, csty=6, levels=3)
    assert b"\xff\x91" in stream and b"\xff\x92" in stream
    got, _ = j2kcodec.decode(stream)
    np.testing.assert_array_equal(got, img)


def test_multilayer_bypass_vs_openjpeg():
    """Layers split code-block contributions across packets; with bypass
    the per-packet multi-segment length signalling must still line up."""
    from deepwmh_tpu.core import j2kcodec

    enc = _openjpeg_encoder_or_skip()
    img = _style_image(seed=2)
    stream = enc.encode(img, prec=12, mode=1, layers=3, levels=3)
    got, _ = j2kcodec.decode(stream)
    np.testing.assert_array_equal(got, img)


def _split_into_tile_parts(stream: bytes, split_frac=0.5) -> bytes:
    """Rewrite a single-tile-part codestream as TWO tile-parts, splitting
    the entropy data at an arbitrary byte (legal per A.4.2: tile-part
    boundaries need not align with packets for the purposes of the byte
    concatenation the decoder must perform)."""
    i = stream.find(b"\xff\x90")  # SOT
    assert i >= 0
    lsot = int.from_bytes(stream[i + 2 : i + 4], "big")
    isot = int.from_bytes(stream[i + 4 : i + 6], "big")
    sod = stream.find(b"\xff\x93", i)
    assert sod >= 0
    body_start = sod + 2
    end = len(stream) - 2  # strip EOC
    assert stream[end:] == b"\xff\xd9"
    body = stream[body_start:end]
    cut = max(1, int(len(body) * split_frac))
    b1, b2 = body[:cut], body[cut:]

    def tile_part(tpsot, tnsot, data):
        psot = 2 + 10 + 2 + len(data)  # SOT + seg + SOD + data
        return (b"\xff\x90" + (10).to_bytes(2, "big")
                + isot.to_bytes(2, "big") + psot.to_bytes(4, "big")
                + bytes([tpsot, tnsot]) + b"\xff\x93" + data)

    header = stream[:i]
    return header + tile_part(0, 2, b1) + tile_part(1, 2, b2) + b"\xff\xd9"


def test_multiple_tile_parts():
    from deepwmh_tpu.core import j2kcodec

    enc = _openjpeg_encoder_or_skip()
    img = _style_image(seed=3)
    stream = enc.encode(img, prec=12, levels=3)
    for frac in (0.3, 0.5, 0.8):
        two_tp = _split_into_tile_parts(stream, frac)
        got, _ = j2kcodec.decode(two_tp)
        np.testing.assert_array_equal(got, img, err_msg="frac=%s" % frac)
    # out-of-order tile-parts still fail loudly
    bad = _split_into_tile_parts(stream, 0.5)
    j = bad.find(b"\xff\x90")
    j2 = bad.find(b"\xff\x90", j + 2)
    bad = bytearray(bad)
    bad[j + 10], bad[j2 + 10] = 1, 0  # swap TPsot values (SOT: FF90 Lsot Isot Psot TPsot)
    with pytest.raises(j2kcodec.J2kError, match="tile-parts out of order"):
        j2kcodec.decode(bytes(bad))


def test_dicom_jpeg2000_bypass_series(tmp_path):
    """End-to-end: a DICOM series whose frames are openjpeg-encoded with
    the bypass style decodes through series_to_volume."""
    import os
    import struct

    from deepwmh_tpu.core.dicom import series_to_volume
    from test_dicom import _el_explicit, _encapsulate, _write_signed_body

    enc = _openjpeg_encoder_or_skip()
    rng = np.random.RandomState(4)
    vol = (rng.rand(31, 27, 2) * 4000).astype(np.uint16)
    for k in range(2):
        stream = enc.encode(vol[:, :, k], prec=12, mode=1, levels=2)
        meta = _el_explicit(0x0002, 0x0010, b"UI",
                            b"1.2.840.10008.1.2.4.90\x00")
        body = b""
        body += _el_explicit(0x0008, 0x0018, b"UI", b"7.7.%d" % k)
        body += _el_explicit(0x0020, 0x000E, b"UI", b"7.7")
        body += _el_explicit(0x0020, 0x0013, b"IS", str(k + 1).encode())
        body += _el_explicit(0x0020, 0x0032, b"DS", b"0\\0\\%d" % k)
        body += _el_explicit(0x0020, 0x0037, b"DS", b"1\\0\\0\\0\\1\\0")
        body += _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 31))
        body += _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 27))
        body += _el_explicit(0x0028, 0x0030, b"DS", b"1\\1")
        body += _el_explicit(0x0018, 0x0050, b"DS", b"1")
        body += _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
        body += _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
        body += _encapsulate(stream)
        with open(str(tmp_path / ("j2kbp%d.dcm" % k)), "wb") as f:
            f.write(b"\x00" * 128 + b"DICM" + meta + body)
    paths = sorted(
        str(tmp_path / f) for f in os.listdir(tmp_path)
    )
    got, _, _ = series_to_volume(paths)
    np.testing.assert_allclose(got, vol.astype(np.float32))


def test_coc_qcc_overrides():
    """Per-component COC/QCC overrides: insert override segments carrying
    the same parameters as COD/QCD into a real stream (openjpeg never emits
    them for grayscale) — the decoder must route through the override path
    and still reconstruct exactly; a COC for a missing component fails."""
    from deepwmh_tpu.core import j2kcodec

    enc = _openjpeg_encoder_or_skip()
    img = _style_image(seed=5)
    stream = enc.encode(img, prec=12, mode=1, levels=3)

    i = stream.find(b"\xff\x52")  # COD
    lcod = int.from_bytes(stream[i + 2 : i + 4], "big")
    cod_seg = stream[i + 4 : i + 2 + lcod]
    # COD: Scod Prog Layers(2) MCT Levels cbw cbh style wavelet
    scod = cod_seg[0]
    coc_payload = bytes([0]) + bytes([scod & 1]) + cod_seg[5:10]
    coc = b"\xff\x53" + (2 + len(coc_payload)).to_bytes(2, "big") + coc_payload

    j = stream.find(b"\xff\x5c")  # QCD
    lqcd = int.from_bytes(stream[j + 2 : j + 4], "big")
    qcd_seg = stream[j + 4 : j + 2 + lqcd]
    qcc_payload = bytes([0]) + qcd_seg
    qcc = b"\xff\x5d" + (2 + len(qcc_payload)).to_bytes(2, "big") + qcc_payload

    k = stream.find(b"\xff\x90")  # insert before SOT (end of main header)
    patched = stream[:k] + coc + qcc + stream[k:]
    got, _ = j2kcodec.decode(patched)
    np.testing.assert_array_equal(got, img)

    bad_coc = b"\xff\x53" + (2 + len(coc_payload)).to_bytes(2, "big") + (
        bytes([3]) + coc_payload[1:]
    )
    bad = stream[:k] + bad_coc + stream[k:]
    import pytest

    with pytest.raises(j2kcodec.J2kError, match="COC for component"):
        j2kcodec.decode(bad)
