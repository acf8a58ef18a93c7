"""ctypes loader for the native host kernels (cc3d.cpp, jpegl.cpp).

Builds the shared library on first use when a toolchain is available and
falls back to pure-Python/JAX implementations otherwise — the framework
never hard-requires the native layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdeepwmh_native.so")
_STAMP_PATH = _LIB_PATH + ".srchash"
_lib = None
_tried = False
# first use happens from thread pools (IO fan-out calls the gzip path):
# without the lock two threads would race `make` against each other and
# dlopen against an in-place relink
_build_lock = threading.Lock()


def _src_hash() -> str:
    import hashlib

    h = hashlib.sha256()
    for name in ("cc3d.cpp", "jpegl.cpp", "jls.cpp", "j2k_t1.cpp", "Makefile"):
        p = os.path.join(_HERE, name)
        if os.path.isfile(p):
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_HERE, check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=120,
        )
        if os.path.isfile(_LIB_PATH):
            with open(_STAMP_PATH, "w") as f:
                f.write(_src_hash())
            return True
        return False
    except Exception:
        return False


def _lib_current() -> bool:
    """Content-hash staleness check: mtimes are useless after a fresh git
    clone (identical checkout times) and a stale or wrong-platform binary
    would otherwise load silently. The library is only trusted when its
    build stamp matches the current source hash — the binary itself is NOT
    committed (gitignored), so every machine builds its own."""
    if not os.path.isfile(_LIB_PATH) or not os.path.isfile(_STAMP_PATH):
        return False
    try:
        with open(_STAMP_PATH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def get_lib():
    """Returns the loaded ctypes library or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    # _lib None: block on the lock — a sibling thread may be mid-build, and
    # returning early would silently route this caller to the slow Python
    # fallback for its whole call
    with _build_lock:
        if _lib is not None or _tried:
            return _lib
        return _load_locked()


def _load_locked():
    global _lib, _tried
    _tried = True
    if not _lib_current():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.label_components_3d.restype = ctypes.c_int32
    lib.label_components_3d.argtypes = [
        i8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
    ]
    lib.remove_small_components.restype = ctypes.c_int32
    lib.remove_small_components.argtypes = [
        i8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
    ]
    lib.gzip_set_chunk_for_testing.restype = None
    lib.gzip_set_chunk_for_testing.argtypes = [ctypes.c_int64]
    lib.gzip_inflate.restype = ctypes.c_int64
    lib.gzip_inflate.argtypes = [i8p, ctypes.c_int64, i8p, ctypes.c_int64]
    lib.gzip_deflate.restype = ctypes.c_int64
    lib.gzip_deflate.argtypes = [
        i8p, ctypes.c_int64, i8p, ctypes.c_int64, ctypes.c_int32,
    ]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.jpegl_decode_diffs.restype = ctypes.c_int64
    lib.jpegl_decode_diffs.argtypes = [
        i8p, ctypes.c_int64, i32p, ctypes.c_int64, i64p,
    ]
    lib.jpegl_reconstruct.restype = None
    lib.jpegl_reconstruct.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int64, i64p,
    ]
    lib.jls_decode_scan.restype = ctypes.c_int32
    lib.jls_decode_scan.argtypes = [
        i8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i64p,
    ]
    lib.j2k_decode_block.restype = ctypes.c_int32
    lib.j2k_decode_block.argtypes = [
        i8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i64p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------- #
# numpy-facing wrappers
# ---------------------------------------------------------------------- #


def label_components_host(mask: np.ndarray):
    """(labels int32 [D,H,W] with ids 1..n in raster order, n) or None when
    the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask > 0.5, dtype=np.uint8)
    labels = np.empty(m.shape, np.int32)
    n = lib.label_components_3d(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], m.shape[2],
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels, int(n)


def remove_small_components_host(mask: np.ndarray, min_volume: int):
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask > 0.5, dtype=np.uint8)
    lib.remove_small_components(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], m.shape[2], int(min_volume),
    )
    return m.astype(np.float32)


def gzip_inflate_host(data: bytes, expected_size: int):
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    cap = max(int(expected_size), len(src), 1024)
    while cap <= 1 << 36:  # grow capacity on underestimate
        dst = np.empty(cap, np.uint8)
        n = lib.gzip_inflate(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        )
        if n == -2:
            cap *= 8
            continue
        if n < 0:
            return None
        return dst[:n].tobytes()
    return None


def gzip_deflate_host(data: bytes, level: int = 4):
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    cap = len(src) + len(src) // 2 + 1024
    dst = np.empty(cap, np.uint8)
    n = lib.gzip_deflate(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap, level,
    )
    if n < 0:
        return None
    return dst[:n].tobytes()


def jpegl_decode_diffs_host(data: bytes, lut: np.ndarray, n: int):
    """Lossless-JPEG Huffman pass: n prediction differences from unstuffed
    entropy bytes using a 16-bit-peek LUT (int32[65536], symbol<<5|len).
    Returns int64[n] or None when the native lib is unavailable / the
    stream is invalid."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    lut = np.ascontiguousarray(lut, np.int32)
    out = np.empty(int(n), np.int64)
    got = lib.jpegl_decode_diffs(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), int(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if got != n:
        return None
    return out


def jpegl_reconstruct_host(diffs: np.ndarray, h: int, w: int, psv: int,
                           default_pred: int):
    """Sequential predictor reconstruction (T.81 H.1.2.1, no restarts).
    Returns int64[h, w] or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(diffs, np.int64).reshape(-1)
    out = np.empty(int(h) * int(w), np.int64)
    lib.jpegl_reconstruct(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), int(h), int(w),
        int(psv), int(default_pred),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out.reshape(int(h), int(w))


def jls_decode_scan_host(data: bytes, w, h, maxval, near, t1, t2, t3,
                         reset, qbpp, limit):
    """JPEG-LS scan decode (T.87, single component, ILV=0). Returns
    int64[h, w] or None when the native lib is unavailable / the stream is
    corrupt (caller falls back to the Python decoder)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    out = np.empty(int(h) * int(w), np.int64)
    rc = lib.jls_decode_scan(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        int(w), int(h), int(maxval), int(near), int(t1), int(t2), int(t3),
        int(reset), int(qbpp), int(limit),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out.reshape(int(h), int(w))


def j2k_decode_block_host(data: bytes, w, h, orient, n_passes, msb_plane,
                          segsym):
    """EBCOT Tier-1 block decode (T.800 Annex D). Returns int64[h, w] of
    signed coefficients or None when the native lib is unavailable / the
    stream is invalid (caller falls back to the Python decoder)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    out = np.empty(int(h) * int(w), np.int64)
    rc = lib.j2k_decode_block(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        int(w), int(h), int(orient), int(n_passes), int(msb_plane),
        1 if segsym else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out.reshape(int(h), int(w))
