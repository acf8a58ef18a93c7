"""Minimal DICOM series -> NIfTI conversion.

Replaces the dcm2niix adapter (deepwmh/external_tools/dcm2niix.py:5-77) for
the common MRI case: uncompressed single-frame DICOM series (implicit or
explicit VR little endian). Slices are grouped by SeriesInstanceUID, sorted
along the slice normal (ImageOrientationPatient x ImagePositionPatient),
stacked, rescaled (RescaleSlope/Intercept) and written as NIfTI with an
LPS->RAS sform affine. Compressed transfer syntaxes raise a clear error —
off the hot path, exotic encodings are out of scope.
"""

from __future__ import annotations

import os
import struct

import numpy as np

EXPLICIT_LE = "1.2.840.10008.1.2.1"
IMPLICIT_LE = "1.2.840.10008.1.2"

_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}

TAGS = {
    (0x0002, 0x0010): "transfer_syntax",
    (0x0008, 0x0018): "sop_uid",
    (0x0020, 0x000E): "series_uid",
    (0x0020, 0x0013): "instance_number",
    (0x0020, 0x0032): "ipp",
    (0x0020, 0x0037): "iop",
    (0x0028, 0x0010): "rows",
    (0x0028, 0x0011): "cols",
    (0x0028, 0x0030): "pixel_spacing",
    (0x0018, 0x0050): "slice_thickness",
    (0x0018, 0x0088): "spacing_between",
    (0x0028, 0x0100): "bits_allocated",
    (0x0028, 0x0103): "pixel_representation",
    (0x0028, 0x1052): "rescale_intercept",
    (0x0028, 0x1053): "rescale_slope",
    (0x7FE0, 0x0010): "pixel_data",
}


class DicomError(ValueError):
    pass


def _parse_elements(buf, offset, explicit, stop_at_pixels=True):
    """Yield (tag, value_bytes) for top-level elements; SQ contents are
    skipped (not needed for volume assembly)."""
    n = len(buf)
    while offset + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, offset)
        offset += 4
        if explicit:
            vr = buf[offset : offset + 2]
            if vr in _LONG_VRS:
                (length,) = struct.unpack_from("<I", buf, offset + 4)
                offset += 8
            else:
                (length,) = struct.unpack_from("<H", buf, offset + 2)
                offset += 4
        else:
            (length,) = struct.unpack_from("<I", buf, offset)
            offset += 4
        if length == 0xFFFFFFFF:
            raise DicomError(
                "undefined-length element (%04x,%04x): compressed or sequenced "
                "pixel data is not supported" % (group, elem)
            )
        value = buf[offset : offset + length]
        offset += length
        yield (group, elem), value
        if stop_at_pixels and (group, elem) == (0x7FE0, 0x0010):
            return


def read_dicom(path: str) -> dict:
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 132 + 8 or buf[128:132] != b"DICM":
        raise DicomError("%s: not a DICOM part-10 file" % path)

    fields = {}
    # file meta group (always explicit VR LE); read until group != 0x0002
    offset = 132
    meta_end = offset
    for tag, value in _parse_elements(buf, offset, explicit=True, stop_at_pixels=False):
        if tag[0] != 0x0002:
            break
        if tag in TAGS:
            fields[TAGS[tag]] = value
        # recompute end position by re-walking (cheap; meta group is tiny)
        meta_end = _element_end(buf, meta_end, explicit=True)

    syntax = fields.get("transfer_syntax", b"").decode("ascii", "ignore").strip("\x00 ")
    if syntax == IMPLICIT_LE:
        explicit = False
    elif syntax in (EXPLICIT_LE, ""):
        explicit = True
    else:
        raise DicomError("%s: unsupported transfer syntax %r" % (path, syntax))

    for tag, value in _parse_elements(buf, meta_end, explicit=explicit):
        if tag in TAGS:
            fields[TAGS[tag]] = value
    return fields


def _element_end(buf, offset, explicit):
    group, elem = struct.unpack_from("<HH", buf, offset)
    offset += 4
    if explicit:
        vr = buf[offset : offset + 2]
        if vr in _LONG_VRS:
            (length,) = struct.unpack_from("<I", buf, offset + 4)
            offset += 8
        else:
            (length,) = struct.unpack_from("<H", buf, offset + 2)
            offset += 4
    else:
        (length,) = struct.unpack_from("<I", buf, offset)
        offset += 4
    return offset + length


def _ds(value, default=None):
    try:
        return [float(v) for v in value.decode("ascii", "ignore").strip("\x00 ").split("\\")]
    except Exception:
        return default


def _us(value, default=0):
    return struct.unpack("<H", value[:2])[0] if len(value) >= 2 else default


def series_to_volume(paths):
    """Assemble one series from DICOM file paths. Returns
    (volume [rows, cols, slices] float32, spacing [3] mm, affine 4x4 RAS)."""
    slices = []
    for p in paths:
        f = read_dicom(p)
        if "pixel_data" not in f:
            continue
        rows, cols = _us(f["rows"]), _us(f["cols"])
        bits = _us(f.get("bits_allocated", b"\x10\x00"))
        signed = _us(f.get("pixel_representation", b"\x00\x00")) == 1
        if bits == 16:
            dt = np.int16 if signed else np.uint16
        elif bits == 8:
            dt = np.int8 if signed else np.uint8
        else:
            raise DicomError("%s: unsupported bits_allocated=%d" % (p, bits))
        pix = np.frombuffer(f["pixel_data"], dtype=dt, count=rows * cols).reshape(
            rows, cols
        )
        slope = _ds(f.get("rescale_slope", b"1"), [1.0])[0]
        inter = _ds(f.get("rescale_intercept", b"0"), [0.0])[0]
        img = pix.astype(np.float32) * slope + inter
        ipp = _ds(f.get("ipp", b"0\\0\\0"), [0, 0, 0])
        iop = _ds(f.get("iop", b"1\\0\\0\\0\\1\\0"), [1, 0, 0, 0, 1, 0])
        ps = _ds(f.get("pixel_spacing", b"1\\1"), [1, 1])
        thick = _ds(f.get("spacing_between", f.get("slice_thickness", b"1")), [1.0])[0]
        inst = int(_ds(f.get("instance_number", b"0"), [0])[0])
        slices.append((img, np.array(ipp), np.array(iop), ps, thick, inst))

    if not slices:
        raise DicomError("no image slices found")

    iop = slices[0][2]
    normal = np.cross(iop[:3], iop[3:])
    slices.sort(key=lambda s: (float(np.dot(s[1], normal)), s[5]))

    vol = np.stack([s[0] for s in slices], axis=-1)  # [rows, cols, slices]
    ps = slices[0][3]
    if len(slices) > 1:
        zs = [float(np.dot(s[1], normal)) for s in slices]
        dz = float(np.median(np.diff(zs)))
        if abs(dz) < 1e-6:
            dz = slices[0][4]
    else:
        dz = slices[0][4]
    spacing = [float(ps[0]), float(ps[1]), abs(dz)]

    # LPS affine: columns = row-dir*ps_row? DICOM: iop[0:3] is direction of
    # increasing column index along a row... build with the standard mapping
    row_dir, col_dir = iop[:3], iop[3:]
    affine_lps = np.eye(4)
    affine_lps[:3, 0] = col_dir * ps[0]  # rows axis
    affine_lps[:3, 1] = row_dir * ps[1]  # cols axis
    affine_lps[:3, 2] = normal * dz
    affine_lps[:3, 3] = slices[0][1]
    # LPS -> RAS: negate x and y
    flip = np.diag([-1.0, -1.0, 1.0, 1.0])
    affine_ras = flip @ affine_lps
    return vol, spacing, affine_ras


def convert_directory(input_dir: str, output_dir: str, compress=True, verbose=True):
    """Recursively group DICOM files by series and write one NIfTI each
    (the dcm2niix CLI role). Returns the list of written files."""
    from deepwmh_tpu.core import nifti

    series = {}
    for root, _dirs, files in os.walk(input_dir):
        for fn in files:
            p = os.path.join(root, fn)
            try:
                f = read_dicom(p)
            except Exception:
                continue
            uid = f.get("series_uid", b"unknown").decode("ascii", "ignore").strip("\x00 ")
            series.setdefault(uid, []).append(p)

    os.makedirs(output_dir, exist_ok=True)
    written = []
    for i, (uid, paths) in enumerate(sorted(series.items())):
        try:
            vol, spacing, affine = series_to_volume(paths)
        except DicomError as e:
            if verbose:
                print("[skip] series %s: %s" % (uid[:16], e))
            continue
        hdr = nifti.NiftiHeader()
        hdr.set_shape(vol.shape)
        hdr.set_zooms(tuple(spacing))
        hdr.srow = affine[:3, :]
        hdr.sform_code = 1
        ext = ".nii.gz" if compress else ".nii"
        out = os.path.join(output_dir, "series_%03d%s" % (i, ext))
        nifti.save_nifti(vol, hdr, out)
        written.append(out)
        if verbose:
            print("wrote %s (%d slice(s))" % (out, vol.shape[-1]))
    return written
