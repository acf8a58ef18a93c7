"""Test-only ctypes harness over the system libopenjp2 ENCODER, used to
produce validation codestreams with features our from-scratch decoder
(core/j2kcodec.py) must handle: code-block styles (bypass/termall/...),
SOP/EPH markers, multiple layers.

No openjpeg headers ship in this environment, so opj_cparameters_t field
offsets are discovered EMPIRICALLY from the defaults that
opj_set_default_encoder_parameters writes (numresolution=6, cblock 64x64 —
a distinctive [6,64,64] int32 run preceded by 100+100 floats of rates /
distoratios and tcp_numlayers). Every stream produced here is verified to
decode with openjpeg itself (via PIL) before our decoder sees it.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct as _struct

import numpy as np


class _CmptParm(ctypes.Structure):
    _fields_ = [(n, ctypes.c_uint32) for n in
                ("dx", "dy", "w", "h", "x0", "y0", "prec", "bpp", "sgnd")]


class _ImageComp(ctypes.Structure):
    _fields_ = [
        ("dx", ctypes.c_uint32), ("dy", ctypes.c_uint32),
        ("w", ctypes.c_uint32), ("h", ctypes.c_uint32),
        ("x0", ctypes.c_uint32), ("y0", ctypes.c_uint32),
        ("prec", ctypes.c_uint32), ("bpp", ctypes.c_uint32),
        ("sgnd", ctypes.c_uint32), ("resno_decoded", ctypes.c_uint32),
        ("factor", ctypes.c_uint32),
        ("data", ctypes.POINTER(ctypes.c_int32)),
        ("alpha", ctypes.c_uint16),
    ]


class _Image(ctypes.Structure):
    _fields_ = [
        ("x0", ctypes.c_uint32), ("y0", ctypes.c_uint32),
        ("x1", ctypes.c_uint32), ("y1", ctypes.c_uint32),
        ("numcomps", ctypes.c_uint32), ("color_space", ctypes.c_int),
        ("comps", ctypes.POINTER(_ImageComp)),
        ("icc_profile_buf", ctypes.c_void_p),
        ("icc_profile_len", ctypes.c_uint32),
    ]


_PARAMS_SIZE = 65536  # upper bound for opj_cparameters_t (~14 KB in 2.5)


class OpenJpegEncoder:
    def __init__(self):
        self.lib = None
        for name in ("libopenjp2.so.7", "libopenjp2.so", "openjp2"):
            try:
                self.lib = ctypes.CDLL(name)
                break
            except OSError:
                continue
        if self.lib is None:
            raise RuntimeError("libopenjp2 not found")
        L = self.lib
        L.opj_version.restype = ctypes.c_char_p
        L.opj_create_compress.restype = ctypes.c_void_p
        L.opj_create_compress.argtypes = [ctypes.c_int]
        L.opj_image_create.restype = ctypes.POINTER(_Image)
        L.opj_image_create.argtypes = [
            ctypes.c_uint32, ctypes.POINTER(_CmptParm), ctypes.c_int
        ]
        L.opj_setup_encoder.restype = ctypes.c_int
        L.opj_setup_encoder.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(_Image)
        ]
        L.opj_stream_create_default_file_stream.restype = ctypes.c_void_p
        L.opj_stream_create_default_file_stream.argtypes = [
            ctypes.c_char_p, ctypes.c_int
        ]
        for fn in ("opj_start_compress", "opj_encode", "opj_end_compress"):
            getattr(L, fn).restype = ctypes.c_int
            getattr(L, fn).argtypes = [ctypes.c_void_p, ctypes.c_void_p] + (
                [ctypes.POINTER(_Image)] if fn == "opj_start_compress" else []
            )
        L.opj_start_compress.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(_Image), ctypes.c_void_p
        ]
        # without argtypes ctypes passes 64-bit pointers as C ints
        L.opj_stream_destroy.argtypes = [ctypes.c_void_p]
        L.opj_stream_destroy.restype = None
        L.opj_destroy_codec.argtypes = [ctypes.c_void_p]
        L.opj_destroy_codec.restype = None
        L.opj_image_destroy.argtypes = [ctypes.POINTER(_Image)]
        L.opj_image_destroy.restype = None
        self._find_offsets()

    # -- offset discovery -------------------------------------------------

    def _defaults(self):
        buf = (ctypes.c_ubyte * _PARAMS_SIZE)()
        self.lib.opj_set_default_encoder_parameters(buf)
        return buf

    def _find_offsets(self):
        buf = bytes(self._defaults())
        ints = np.frombuffer(buf, np.int32)
        # locate ... tcp_numlayers, tcp_rates[100](f32), tcp_distoratio[100],
        # numresolution=6, cblockw=64, cblockh=64, mode, irreversible ...
        hits = [
            i for i in range(len(ints) - 3)
            if ints[i] == 6 and ints[i + 1] == 64 and ints[i + 2] == 64
        ]
        if len(hits) != 1:
            raise RuntimeError(
                "could not locate numresolution/cblock defaults (hits=%r)"
                % hits
            )
        k = hits[0]
        self.off_numresolution = 4 * k
        self.off_cblockw = 4 * (k + 1)
        self.off_cblockh = 4 * (k + 2)
        self.off_mode = 4 * (k + 3)
        self.off_irreversible = 4 * (k + 4)
        self.off_tcp_numlayers = self.off_numresolution - 4 * (100 + 100) - 4
        self.off_tcp_rates = self.off_tcp_numlayers + 4
        # cp_disto_alloc: fixed early layout (tile_size_on, tx0, ty0, tdx,
        # tdy, then the three allocation switches)
        self.off_cp_disto_alloc = 20
        # csty: right after the two pointers that follow cp_fixed_quality;
        # discovered by probing (see encode(csty=...)'s verification)
        ptr = ctypes.sizeof(ctypes.c_void_p)
        base = 32  # 8 ints, padded to pointer alignment
        base = (base + ptr - 1) // ptr * ptr
        self.off_csty = base + 2 * ptr
        self.off_prog_order = self.off_csty + 4

    def _poke(self, buf, off, val, fmt="<i"):
        _struct.pack_into(fmt, buf, off, val)

    # -- encoding ----------------------------------------------------------

    def encode(self, img: np.ndarray, prec: int = 16, mode: int = 0,
               csty: int = 0, layers: int = 1, levels: int = 5,
               irreversible: bool = False) -> bytes:
        """img: [h, w] unsigned ints < 2**prec -> raw .j2k codestream."""
        import os
        import tempfile

        h, w = img.shape
        L = self.lib
        parm = _CmptParm(1, 1, w, h, 0, 0, prec, prec, 0)
        image = L.opj_image_create(1, ctypes.byref(parm), 2)  # GRAY
        if not image:
            raise RuntimeError("opj_image_create failed")
        image.contents.x0 = 0
        image.contents.y0 = 0
        image.contents.x1 = w
        image.contents.y1 = h
        comp = image.contents.comps[0]
        flat = np.ascontiguousarray(img.reshape(-1), np.int32)
        ctypes.memmove(comp.data, flat.ctypes.data, flat.nbytes)

        buf = self._defaults()
        self._poke(buf, self.off_tcp_numlayers, layers)
        for i in range(layers):
            # rate 0 = lossless-ish "include everything in the last layer";
            # earlier layers get decreasing compression ratios
            rate = float(layers - i) * 8.0 if i < layers - 1 else 0.0
            self._poke(buf, self.off_tcp_rates + 4 * i, rate, "<f")
        self._poke(buf, self.off_cp_disto_alloc, 1)
        self._poke(buf, self.off_numresolution, levels + 1)
        self._poke(buf, self.off_mode, mode)
        if csty:
            self._poke(buf, self.off_csty, csty)
        self._poke(buf, self.off_irreversible, 1 if irreversible else 0)

        codec = L.opj_create_compress(0)  # OPJ_CODEC_J2K
        if not L.opj_setup_encoder(codec, buf, image):
            raise RuntimeError("opj_setup_encoder failed")
        fd, path = tempfile.mkstemp(suffix=".j2k")
        os.close(fd)
        try:
            stream = L.opj_stream_create_default_file_stream(
                path.encode(), 0
            )
            if not stream:
                raise RuntimeError("stream create failed")
            if not L.opj_start_compress(codec, image, stream):
                raise RuntimeError("opj_start_compress failed")
            if not L.opj_encode(codec, stream):
                raise RuntimeError("opj_encode failed")
            if not L.opj_end_compress(codec, stream):
                raise RuntimeError("opj_end_compress failed")
            L.opj_stream_destroy(stream)
            L.opj_destroy_codec(codec)
            L.opj_image_destroy(image)
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)


_ENC = None


def get_encoder():
    global _ENC
    if _ENC is None:
        _ENC = OpenJpegEncoder()
    return _ENC


def pil_decode_j2k(stream: bytes, prec: int = 16) -> np.ndarray:
    """Decode with openjpeg via PIL — the independent ground truth. PIL
    left-shifts sub-16-bit samples into the 16-bit container; shift back."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(stream)) as im:
        arr = np.asarray(im)
    if arr.dtype == np.uint16 and prec < 16:
        arr = arr >> (16 - prec)
    return arr
