"""Preview renderers: single annotated slice PNGs (reference
nii_preview.py:242-370), slice-range trimming, GIF/lightbox smoke."""

import os

import numpy as np
import pytest


def _vol(shape=(16, 18, 12)):
    rng = np.random.RandomState(0)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    r = np.sqrt(sum(a**2 for a in g))
    return ((r < 0.8) * (100 + 20 * rng.rand(*shape))).astype(np.float32)


def test_view_slice_axes_and_annotations(tmp_path):
    from PIL import Image

    from deepwmh_tpu.eval.preview import view_slice

    vol = _vol()
    for axis, hw in [("sagittal", (18, 12)), ("coronal", (16, 12)),
                     ("axial", (16, 18))]:
        p = str(tmp_path / ("%s.png" % axis))
        view_slice(vol, p, axis=axis, slice_num=5, show_slice_number=True)
        with Image.open(p) as im:
            # slices are rot90'd for display: PIL size is (width, height)
            assert im.size == (hw[0], hw[1])
            assert im.mode == "RGB"


def test_view_slice_number_stamp_changes_pixels(tmp_path):
    from PIL import Image

    from deepwmh_tpu.eval.preview import view_slice

    vol = _vol()
    a = str(tmp_path / "plain.png")
    b = str(tmp_path / "numbered.png")
    view_slice(vol, a, axis="axial", slice_num=7)
    view_slice(vol, b, axis="axial", slice_num=7, show_slice_number=True)
    pa = np.asarray(Image.open(a))
    pb = np.asarray(Image.open(b))
    assert pa.shape == pb.shape
    assert (pa != pb).any(), "slice number stamp left no trace"
    # only the top-left corner (glyph region) may differ
    assert (pa[10:] == pb[10:]).all()


def test_view_slice_flips_crop_zoom_window(tmp_path):
    from PIL import Image

    from deepwmh_tpu.eval.preview import view_slice

    vol = _vol()
    p = str(tmp_path / "s.png")
    view_slice(vol, p, axis="axial", slice_num=6, hflip=True, vflip=True,
               crop=[2, 2, 14, 14], global_zoom=2,
               intensity_range=[None, 80.0], colormap="jet")
    with Image.open(p) as im:
        assert im.size == (24, 24)  # 12x12 crop, 2x zoom

    with pytest.raises(ValueError):
        view_slice(vol, p, axis="axial", slice_num=None)


def test_view_slice_reverse_order(tmp_path):
    from PIL import Image

    from deepwmh_tpu.eval.preview import view_slice

    vol = _vol()
    n = vol.shape[2]
    a, b = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    view_slice(vol, a, axis="axial", slice_num=3)
    view_slice(vol, b, axis="axial", slice_num=n - 4, reverse_slice_order=True)
    assert (np.asarray(Image.open(a)) == np.asarray(Image.open(b))).all()


def test_view_slice_anisotropic_resize(tmp_path):
    from PIL import Image

    from deepwmh_tpu.eval.preview import view_slice

    vol = _vol()
    p = str(tmp_path / "aniso.png")
    # axial slice at 1x1 in-plane is (16,18); 2mm-vs-1mm row spacing
    # stretches the first slice axis by 2
    view_slice(vol, p, axis="axial", slice_num=5, spacing=(2.0, 1.0, 3.0))
    with Image.open(p) as im:
        assert im.size == (32, 18)


def test_simple_nifti_preview(tmp_path):
    """Reference SimpleNiftiPreview (nii_preview.py:603-636): pinned
    window/colormap plotting straight from a NIfTI file + colorbar."""
    import pytest

    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.eval.preview import SimpleNiftiPreview

    vol = np.linspace(0, 100, 6 * 6 * 4).reshape(6, 6, 4).astype(np.float32)
    p = str(tmp_path / "v.nii.gz")
    nifti.save_nifti_simple(vol, p)
    pv = SimpleNiftiPreview(min_intensity=0, max_intensity=80, colormap="vik")
    png = str(tmp_path / "s.png")
    bar = str(tmp_path / "bar.png")
    pv.plot(p, "axial", 2, png, output_colormap=bar, hflip=True)
    assert os.path.isfile(png) and os.path.isfile(bar)
    with pytest.raises(ValueError, match="colormap"):
        SimpleNiftiPreview(colormap="nope")
    with pytest.raises(ValueError, match="auto"):
        SimpleNiftiPreview(min_intensity="bad")


def test_save_slice_png_colormap_and_window(tmp_path):
    from PIL import Image

    from deepwmh_tpu.eval.preview import save_slice_png

    ramp = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    p = str(tmp_path / "ramp.png")
    save_slice_png(ramp, p, colormap="hot", lo=0.0, hi=1.0)
    px = np.asarray(Image.open(p))
    assert px.shape == (8, 8, 3)
    assert px.max() == 255 and px.min() == 0
