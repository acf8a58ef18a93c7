"""From-scratch PDF canvas: structural validity + content checks."""

import re
import zlib

import numpy as np

from deepwmh_tpu.eval.pdfcanvas import PdfCanvas, parse_unit, plot_mat


def test_parse_units():
    assert abs(parse_unit("1in") - 72.0) < 1e-9
    assert abs(parse_unit("2.54cm") - 72.0) < 1e-6
    assert abs(parse_unit("25.4mm") - 72.0) < 1e-6
    assert abs(parse_unit(1.0) - 72.0 / 2.54) < 1e-9


def _check_pdf_structure(path):
    buf = open(path, "rb").read()
    assert buf.startswith(b"%PDF-1.4")
    assert buf.rstrip().endswith(b"%%EOF")
    # xref offsets must point at the right objects
    xref_at = int(buf[buf.rfind(b"startxref") + 9 :].split()[0])
    assert buf[xref_at : xref_at + 4] == b"xref"
    offsets = re.findall(rb"(\d{10}) 00000 n", buf[xref_at:])
    for i, off in enumerate(offsets, start=1):
        assert buf[int(off) :].startswith(b"%d 0 obj" % i), "bad xref for obj %d" % i
    return buf


def test_canvas_primitives(tmp_path):
    p = str(tmp_path / "c.pdf")
    cv = PdfCanvas(p, "10cm*8cm")
    cv.text("Hello (PDF) \\ World", "1cm, 7cm", "Helvetica", 12,
            font_color=(0, 0, 1))
    cv.line("0cm, 0cm", "10cm, 8cm", 1.5, line_color=(1, 0, 0),
            dashed=True)
    cv.rect((1, 1), (3, 2), 0.5, fill_color=(0.2, 0.8, 0.2),
            fill_alpha=0.5)
    cv.register_font("/nonexistent/arial.ttf", "Arial")
    cv.text("aliased font", "1cm, 6cm", "Arial", 10)
    cv.save()

    buf = _check_pdf_structure(p)
    content = re.search(rb"stream\n(.*?)\nendstream", buf, re.S).group(1)
    assert b"(Hello \\(PDF\\) \\\\ World) Tj" in content
    assert b"re B" in content          # stroked+filled rect
    assert b"[3 3] 0 d" in content     # dash pattern
    # stroke alpha (CA) stays 1.0 while fill alpha (ca) is 0.5 — the two
    # channels are independent
    assert b"/Type /ExtGState /CA 1 /ca 0.5" in buf
    assert b"/BaseFont /Helvetica" in buf


def test_image_embedding(tmp_path):
    rgb = np.zeros((4, 6, 3), np.uint8)
    rgb[..., 0] = 255
    p = str(tmp_path / "img.pdf")
    cv = PdfCanvas(p, "5cm*5cm")
    cv.image_array((0, 0), (5, 5), rgb)
    cv.save()
    buf = _check_pdf_structure(p)
    m = re.search(
        rb"/Subtype /Image /Width 6 /Height 4 .*?stream\n(.*?)\nendstream",
        buf, re.S,
    )
    assert m, "image XObject missing"
    assert zlib.decompress(m.group(1)) == rgb.tobytes()
    assert b"/Im0 Do" in buf


def test_plot_mat(tmp_path):
    m = np.arange(12, dtype=np.float64).reshape(3, 4)
    p = str(tmp_path / "mat.pdf")
    plot_mat(m, p, cmap="jet")
    buf = _check_pdf_structure(p)
    # page is 0.5cm per cell
    pt = 0.5 * 72 / 2.54
    assert (b"/MediaBox [0 0 %g %g]" % (4 * pt, 3 * pt)) in buf
    img = re.search(
        rb"/Width 4 /Height 3 .*?stream\n(.*?)\nendstream", buf, re.S
    )
    rgb = np.frombuffer(zlib.decompress(img.group(1)), np.uint8).reshape(3, 4, 3)
    # normalized 0..1 with jet: first pixel cold (blue-ish), last hot (red-ish)
    assert rgb[0, 0, 2] > rgb[0, 0, 0]
    assert rgb[2, 3, 0] > rgb[2, 3, 2]
