import numpy as np

from deepwmh_tpu.core import nifti


def test_roundtrip_nii_gz(tmp_path, rng):
    data = rng.rand(7, 9, 11).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(data.shape)
    hdr.set_zooms((0.8, 1.0, 3.0))
    path = str(tmp_path / "vol.nii.gz")
    nifti.save_nifti(data, hdr, path)
    out, hdr2 = nifti.load_nifti(path)
    np.testing.assert_allclose(out, data, rtol=0, atol=0)
    assert hdr2.shape == data.shape
    np.testing.assert_allclose(hdr2.zooms[:3], (0.8, 1.0, 3.0), rtol=1e-6)


def test_roundtrip_nii_plain(tmp_path, rng):
    data = (rng.rand(5, 6, 4) * 100).astype(np.float32)
    path = str(tmp_path / "vol.nii")
    nifti.save_nifti_simple(data, path)
    out = nifti.load_nifti_simple(path)
    np.testing.assert_allclose(out, data)


def test_pixdim(tmp_path, rng):
    data = rng.rand(4, 5, 6).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(data.shape)
    hdr.set_zooms((1.5, 2.0, 2.5))
    path = str(tmp_path / "v.nii.gz")
    nifti.save_nifti(data, hdr, path)
    assert nifti.get_nifti_pixdim(path) == [1.5, 2.0, 2.5]


def test_try_load_nifti(tmp_path, rng):
    good = str(tmp_path / "good.nii.gz")
    nifti.save_nifti_simple(rng.rand(3, 3, 3), good)
    assert nifti.try_load_nifti(good)
    bad = str(tmp_path / "bad.nii.gz")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    assert not nifti.try_load_nifti(bad)
    assert not nifti.try_load_nifti(str(tmp_path / "missing.nii.gz"))


def test_scl_slope_applied(tmp_path, rng):
    # write int16 data with scaling manually through the header path
    data = rng.rand(4, 4, 4).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(data.shape)
    path = str(tmp_path / "scaled.nii")
    nifti.save_nifti(data, hdr, path)
    # poke scl_slope/inter into the saved header bytes
    import struct

    with open(path, "r+b") as f:
        f.seek(112)
        f.write(struct.pack("<2f", 2.0, 1.0))
    out = nifti.load_nifti_simple(path)
    np.testing.assert_allclose(out, data * 2.0 + 1.0, rtol=1e-6)


def test_aff2axcodes():
    assert nifti.aff2axcodes(np.eye(4)) == ("R", "A", "S")
    flip = np.diag([-1.0, 1.0, -1.0, 1.0])
    assert nifti.aff2axcodes(flip) == ("L", "A", "I")


def test_resample_nifti(tmp_path, rng):
    data = rng.rand(8, 8, 8).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(data.shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    src = str(tmp_path / "src.nii.gz")
    dst = str(tmp_path / "dst.nii.gz")
    nifti.save_nifti(data, hdr, src)
    nifti.resample_nifti(src, [1.0, 1.0, 1.0], dst)
    out, ohdr = nifti.load_nifti(dst)
    assert out.shape == (16, 16, 16)
    np.testing.assert_allclose(ohdr.zooms[:3], (1.0, 1.0, 1.0), rtol=1e-6)


import pytest


@pytest.mark.skipif(
    not __import__("os").path.isfile("/root/reference/examples/Brain_label.nii.gz"),
    reason="reference example data not mounted",
)
def test_interop_reads_nibabel_written_file():
    """Our from-scratch codec must read a real nibabel-written NIfTI (the
    reference's 4-class example label volume)."""
    data, hdr = nifti.load_nifti("/root/reference/examples/Brain_label.nii.gz")
    assert data.ndim == 3
    classes = set(np.unique(data.astype(np.int32)))
    assert classes.issubset({0, 1, 2, 3})
    assert 1 in classes and 2 in classes and 3 in classes
    pixdim = nifti.get_nifti_pixdim("/root/reference/examples/Brain_label.nii.gz")
    assert all(0.1 < v < 10 for v in pixdim)


def test_save_nifti_scaled_int16_roundtrip(tmp_path):
    from deepwmh_tpu.core import nifti

    rng = np.random.RandomState(0)
    field = (rng.randn(10, 12, 9, 3) * 4).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(field.shape)
    p = str(tmp_path / "warp.nii.gz")
    nifti.save_nifti_scaled_int16(field, hdr, p)
    back = nifti.load_nifti_simple(p)
    amax = np.abs(field).max()
    assert np.abs(back - field).max() <= amax / 32000.0 + 1e-7
    # and the file is substantially smaller than the float32 form
    p32 = str(tmp_path / "warp32.nii.gz")
    nifti.save_nifti(field, hdr, p32)
    import os
    assert os.path.getsize(p) < os.path.getsize(p32)


def test_scaled_int16_rejects_nonfinite(tmp_path):
    """A NaN would poison the int16 slope and silently corrupt the whole
    artifact (which try_load_nifti would then accept) — must raise."""
    import pytest

    from deepwmh_tpu.core import nifti

    bad = np.zeros((4, 4, 4), np.float32)
    bad[1, 1, 1] = np.nan
    hdr = nifti.NiftiHeader()
    hdr.set_shape(bad.shape)
    with pytest.raises(ValueError, match="non-finite"):
        nifti.save_nifti_scaled_int16(bad, hdr, str(tmp_path / "x.nii.gz"))


def test_resample_nifti_srow_keyed_on_column_norm(tmp_path):
    """resample_nifti rescales sform columns by new_zoom/column_norm: a
    stale pixdim (sform says 2mm, pixdim says 1mm) must not corrupt the
    output geometry (regression for an expression that cancelled to
    new/old)."""
    from deepwmh_tpu.core import nifti

    data = np.random.RandomState(0).rand(8, 8, 8).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(data.shape)
    hdr.set_zooms((1.0, 1.0, 1.0))  # stale: disagrees with the sform
    hdr.srow = np.concatenate([np.diag([2.0, 2.0, 2.0]), np.zeros((3, 1))], 1)
    hdr.sform_code = 1
    src = str(tmp_path / "in.nii.gz")
    dst = str(tmp_path / "out.nii.gz")
    nifti.save_nifti(data, hdr, src)
    nifti.resample_nifti(src, (0.5, 0.5, 0.5), dst)
    out_hdr = nifti.get_nifti_header(dst)
    srow = np.asarray(out_hdr.srow)
    for i in range(3):
        np.testing.assert_allclose(np.linalg.norm(srow[:3, i]), 0.5, rtol=1e-6)
