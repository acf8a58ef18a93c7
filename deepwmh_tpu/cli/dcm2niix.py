"""dcm2niix_py — recursive DICOM -> NIfTI conversion CLI.

Counterpart of the reference adapter (deepwmh/external_tools/dcm2niix.py:5-77)
without the external dcm2niix binary. Transfer-syntax coverage (see
core/dicom.py and docs/PARITY.md C9): uncompressed little AND big endian
(explicit/implicit VR), Deflated, RLE Lossless, JPEG (Baseline, Extended
12-bit, Lossless Process 14/SV1 — core/jpegcodec.py), JPEG-LS (T.87 —
core/jlscodec.py), and JPEG 2000 (T.800 — core/j2kcodec.py); classic
single-frame series and enhanced multi-frame files with per-frame
functional-group geometry and per-frame rescale slope/intercept.
"""

from __future__ import annotations

import argparse

from deepwmh_tpu.core.dicom import convert_directory


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert DICOM series to NIfTI recursively.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-i", "--input", type=str, required=True,
                        help="Directory containing DICOM files (searched recursively).")
    parser.add_argument("-o", "--output", type=str, required=True,
                        help="Output directory for NIfTI volumes.")
    parser.add_argument("--no-compress", action="store_true",
                        help="Write .nii instead of .nii.gz.")
    args = parser.parse_args(argv)
    written = convert_directory(args.input, args.output, compress=not args.no_compress)
    print("%d series converted." % len(written))


if __name__ == "__main__":
    main()
