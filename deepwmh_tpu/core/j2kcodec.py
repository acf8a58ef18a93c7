"""From-scratch JPEG 2000 decoder (ITU-T T.800) for DICOM pixel data.

Closes the last compressed transfer syntaxes the reference hands to the
dcm2niix binary (deepwmh/external_tools/dcm2niix.py:54):
1.2.840.10008.1.2.4.90 (JPEG 2000 Lossless, reversible 5/3 wavelet) and
.91 (JPEG 2000, irreversible 9/7). Scope: raw J2K codestreams and JP2
containers, single tile, arbitrary code-block sizes and decomposition
levels, LRCP/RLCP/RPCL/PCRL/CPRL progressions with any layer count,
grayscale and RGB (with the reversible/irreversible component transform),
1-16 bit, signed or unsigned.

Layers (bottom-up, each validated against openjpeg-produced streams via
PIL in tests/test_j2kcodec.py):
  _MQDecoder/_MQEncoder  T.88 arithmetic coder (the encoder exists to
                         round-trip-test the decoder in isolation)
  _TagTree               packet-header inclusion / zero-bitplane trees
  _decode_block          EBCOT Tier-1: significance propagation, magnitude
                         refinement and cleanup passes with the T.800
                         context model
  _parse_codestream      markers (SIZ/COD/QCD/SOT/SOD...), Tier-2 packet
                         headers, code-block segment assembly
  _idwt53 / _idwt97      multilevel inverse lifting on arbitrary grids
  decode()               tiles -> components -> level shift / MCT
"""

from __future__ import annotations

import math
import struct

import numpy as np


class J2kError(ValueError):
    pass


# ---------------------------------------------------------------------------
# MQ arithmetic coder (ITU-T T.88, software conventions of T.800 Annex C)
# ---------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class _MQDecoder:
    """T.88 MQ decoder over one code-block's byte segment."""

    __slots__ = ("data", "bp", "n", "c", "a", "ct", "I", "mps")

    def __init__(self, data: bytes, n_contexts: int = 19):
        self.data = data
        self.n = len(data)
        self.I = [0] * n_contexts
        self.mps = [0] * n_contexts
        # INITDEC
        self.bp = 0
        b0 = data[0] if self.n > 0 else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self):
        data, bp, n = self.data, self.bp, self.n
        b = data[bp] if bp < n else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[self.bp] if self.bp < n else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = _QE[self.I[cx]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = self.mps[cx]
                self.I[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.I[cx] = nlps
            self.a = qe
            # RENORMD
            while True:
                if self.ct == 0:
                    self._bytein()
                self.a = (self.a << 1) & 0xFFFF
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
            return d
        self.c -= qe << 16
        if (self.a & 0x8000) == 0:
            # MPS exchange path
            if self.a < qe:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.I[cx] = nlps
            else:
                d = self.mps[cx]
                self.I[cx] = nmps
            while True:
                if self.ct == 0:
                    self._bytein()
                self.a = (self.a << 1) & 0xFFFF
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
            return d
        return self.mps[cx]


class _MQEncoder:
    """T.88 MQ encoder — exists to round-trip-test the decoder without any
    external bitstream (tests also validate against openjpeg streams)."""

    __slots__ = ("out", "c", "a", "ct", "I", "mps")

    def __init__(self, n_contexts: int = 19):
        # out[0] is the T.88 INITENC scratch byte "before" the stream; it
        # absorbs a (never-materializing) first carry and is dropped at
        # flush time
        self.out = bytearray([0])
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        self.I = [0] * n_contexts
        self.mps = [0] * n_contexts

    def _byteout(self):
        # T.88 Figure E.19
        if self.out[-1] == 0xFF:
            # 7 data bits + the carry position (value may reach 0x8F)
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.out[-1] += 1  # carry into the finished byte
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, cx: int, d: int):
        qe, nmps, nlps, switch = _QE[self.I[cx]]
        self.a -= qe
        if d == self.mps[cx]:
            # CODEMPS (Figure E.16)
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.I[cx] = nmps
        else:
            # CODELPS (Figure E.17)
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] = 1 - self.mps[cx]
            self.I[cx] = nlps
        while True:  # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c = self.c << 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (Figure E.20) + FLUSH (Figure E.21)
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.out and self.out[-1] == 0xFF:
            self.out.pop()  # optional trailing-FF discard
        return bytes(self.out[1:])  # drop the INITENC scratch byte
