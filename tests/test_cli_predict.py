import os

import jax
import numpy as np

from deepwmh_tpu.core import nifti
from deepwmh_tpu.unet import checkpoint as ckpt
from deepwmh_tpu.unet.model import UNet3D, init_params
from deepwmh_tpu.unet.plan import Plan
from deepwmh_tpu.unet.release import (
    install_model,
    load_released_model,
    release_model,
)


def tiny_plan():
    return Plan(
        target_spacing=[2.0, 2.0, 2.0],
        patch_size=[16, 16, 16],
        batch_size=2,
        pool_kernels=[[2, 2, 2], [2, 2, 2]],
        conv_kernels=[[3, 3, 3], [3, 3, 3], [3, 3, 3]],
        base_features=4,
        max_features=8,
    )


def make_trained_dir(tmp_path):
    plan = tiny_plan()
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(0))
    train_dir = str(tmp_path / "train")
    ckpt.save_checkpoint(train_dir, "model_best", params, meta={"epoch": 1})
    return train_dir, plan


def test_release_install_load_roundtrip(tmp_path):
    train_dir, plan = make_trained_dir(tmp_path)
    rel_dir = str(tmp_path / "release")
    tarball = release_model(train_dir, plan, rel_dir)
    assert os.path.isfile(tarball)

    inst_dir = str(tmp_path / "installed")
    dest = install_model(tarball, inst_dir)
    model, params, plan2 = load_released_model(dest)
    assert plan2 == plan


def test_resolve_model_dir_task_folders(tmp_path):
    """Reference predict.py:139-147: a model root holding task folders
    auto-detects a single task, errors on several unless named."""
    import pytest

    from deepwmh_tpu.unet.release import resolve_model_dir

    train_dir, plan = make_trained_dir(tmp_path)
    root = str(tmp_path / "root")
    task_a = os.path.join(root, "TaskA")
    release_model(train_dir, plan, task_a, make_tarball=False)
    # flat package resolves to itself
    assert resolve_model_dir(task_a) == task_a
    # single task folder auto-detects
    assert resolve_model_dir(root) == task_a
    # several require --custom-task-name
    task_b = os.path.join(root, "TaskB")
    release_model(train_dir, plan, task_b, make_tarball=False)
    with pytest.raises(RuntimeError, match="custom-task-name"):
        resolve_model_dir(root)
    assert resolve_model_dir(root, "TaskB") == task_b
    with pytest.raises(RuntimeError, match="not found"):
        resolve_model_dir(root, "TaskC")
    with pytest.raises(RuntimeError):
        resolve_model_dir(str(tmp_path / "nope"))


def test_predict_cli_end_to_end(tmp_path, rng):
    from deepwmh_tpu.cli.predict import run_predict

    train_dir, plan = make_trained_dir(tmp_path)
    rel_dir = str(tmp_path / "release")
    release_model(train_dir, plan, rel_dir, make_tarball=False)

    # synthetic head volume
    shape = (24, 24, 20)
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, shape[0]),
        np.linspace(-1, 1, shape[1]),
        np.linspace(-1, 1, shape[2]),
        indexing="ij",
    )
    head = (np.sqrt(zz**2 + yy**2 + xx**2) < 0.8).astype(np.float32)
    vol = head * (200 + 20 * rng.rand(*shape).astype(np.float32))
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    img_path = str(tmp_path / "subj.nii.gz")
    nifti.save_nifti(vol, hdr, img_path)

    out = str(tmp_path / "out")
    run_predict(
        [img_path],
        ["subj"],
        rel_dir,
        out,
        skip_bfc=True,  # N4 covered by its own tests; keep CI fast
        tta=False,
        make_previews=True,
    )
    for rel in [
        "001_Preprocessed_Images/subj_0000.nii.gz",
        "002_Segmentations/001_raw/subj.nii.gz",
        "002_Segmentations/002_postproc_3mm/subj.nii.gz",
        "002_Segmentations/003_postproc_fov/subj.nii.gz",
        "003_Previews/subj.gif",
    ]:
        assert os.path.isfile(os.path.join(out, rel)), rel

    seg = nifti.load_nifti_simple(
        os.path.join(out, "002_Segmentations/003_postproc_fov/subj.nii.gz")
    )
    assert seg.shape == shape
    assert set(np.unique(seg)).issubset({0.0, 1.0})


def test_cli_argparse_main(tmp_path, rng, capsys):
    from deepwmh_tpu.cli import predict as predict_cli

    train_dir, plan = make_trained_dir(tmp_path)
    rel_dir = str(tmp_path / "release")
    release_model(train_dir, plan, rel_dir, make_tarball=False)

    vol = (rng.rand(20, 20, 16) * 100).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(vol.shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    img_path = str(tmp_path / "c1.nii.gz")
    nifti.save_nifti(vol, hdr, img_path)
    out = str(tmp_path / "cli_out")
    predict_cli.main(
        [
            "-i", img_path,
            "-n", "c1",
            "-m", rel_dir,
            "-o", out,
            "--skip-bfc",
            "--disable-tta",
            "--no-previews",
            "--skip-integrity-check",
        ]
    )
    assert os.path.isfile(
        os.path.join(out, "002_Segmentations/003_postproc_fov/c1.nii.gz")
    )


def test_fused_matches_staged(tmp_path, rng):
    """A fresh case (fused single-program path) produces the same four
    artifacts as the stage-by-stage resume path."""
    import jax

    from deepwmh_tpu.cli.predict import make_output_folders, predict_one_case
    from deepwmh_tpu.unet.infer import SlidingWindowPredictor
    from deepwmh_tpu.unet.model import UNet3D, init_params

    plan = tiny_plan()
    model = UNet3D(plan=plan)
    params = init_params(model, jax.random.PRNGKey(0))
    predictor = SlidingWindowPredictor(model, params, plan, tta=False)

    shape = (24, 24, 20)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    head = (np.sqrt(sum(a**2 for a in g)) < 0.8).astype(np.float32)
    vol = head * (200 + 20 * rng.rand(*shape).astype(np.float32))
    hdr = nifti.NiftiHeader()
    hdr.set_shape(shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    img_path = str(tmp_path / "subj.nii.gz")
    nifti.save_nifti(vol, hdr, img_path)

    fused = make_output_folders(str(tmp_path / "fused"))
    predict_one_case(predictor, "subj", img_path, fused,
                     skip_bfc=True, make_previews=False)

    staged = make_output_folders(str(tmp_path / "staged"))
    # pre-seeding the preprocessed artifact forces the stage-by-stage path
    nifti.save_nifti(vol, hdr, os.path.join(staged["images"], "subj_0000.nii.gz"))
    predict_one_case(predictor, "subj", img_path, staged,
                     skip_bfc=True, make_previews=False)

    for key, name in [("images", "subj_0000.nii.gz"), ("raw", "subj.nii.gz"),
                      ("post_3mm", "subj.nii.gz"), ("post_fov", "subj.nii.gz")]:
        a = nifti.load_nifti_simple(os.path.join(fused[key], name))
        b = nifti.load_nifti_simple(os.path.join(staged[key], name))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3, err_msg=key)


def test_can_fuse_respects_sharded_n4_routing():
    """Volumes big enough for the slab-sharded N4 keep the staged path on
    multi-device backends (n4_bias_correction_auto routing); small volumes
    and skip_bfc cases fuse."""
    import jax

    from deepwmh_tpu.ops.n4 import N4_SHARD_MIN_VOXELS
    from deepwmh_tpu.pipeline.inference import _can_fuse

    big = (512, 512, 256)
    assert np.prod(big) >= N4_SHARD_MIN_VOXELS
    assert _can_fuse((24, 24, 20), skip_bfc=False)
    assert _can_fuse(big, skip_bfc=True)
    if jax.device_count() > 1:
        assert not _can_fuse(big, skip_bfc=False)


def test_cli_predict_mesh(tmp_path, rng):
    """--mesh: the batch CLI shards each volume's sweep over the device
    mesh (parallel/infer_sharded) while keeping the artifact contract."""
    import pytest

    from deepwmh_tpu.cli import predict as predict_cli

    train_dir, plan = make_trained_dir(tmp_path)
    rel_dir = str(tmp_path / "release")
    release_model(train_dir, plan, rel_dir, make_tarball=False)

    vol = (rng.rand(20, 20, 16) * 100).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape(vol.shape)
    hdr.set_zooms((2.0, 2.0, 2.0))
    img_path = str(tmp_path / "c1.nii.gz")
    nifti.save_nifti(vol, hdr, img_path)
    out = str(tmp_path / "mesh_out")
    predict_cli.main(
        [
            "-i", img_path, "-n", "c1", "-m", rel_dir, "-o", out,
            "--mesh", "--skip-bfc", "--disable-tta", "--no-previews",
            "--skip-integrity-check",
        ]
    )
    seg = nifti.load_nifti_simple(
        os.path.join(out, "002_Segmentations/003_postproc_fov/c1.nii.gz")
    )
    assert seg.shape == vol.shape

    # single-chip pinning and mesh sharding are opposite deployment shapes
    with pytest.raises(SystemExit):
        predict_cli.main(
            [
                "-i", img_path, "-n", "c1", "-m", rel_dir, "-o", out,
                "--mesh", "-g", "0", "--skip-integrity-check",
            ]
        )
