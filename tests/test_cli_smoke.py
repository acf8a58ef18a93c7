"""Smoke tests for every console entry point's argument surface."""

import os

import numpy as np
import pytest


def test_evaluate_cli(tmp_path, rng):
    from deepwmh_tpu.cli import evaluate
    from deepwmh_tpu.core import nifti

    pred = tmp_path / "pred"
    truth = tmp_path / "truth"
    os.makedirs(pred)
    os.makedirs(truth)
    a = (rng.rand(6, 6, 6) > 0.5).astype(np.float32)
    nifti.save_nifti_simple(a, str(pred / "c1.nii.gz"))
    nifti.save_nifti_simple(a, str(truth / "c1.nii.gz"))
    out = str(tmp_path / "report.json")
    evaluate.main(["-p", str(pred), "-g", str(truth), "-o", out, "--metrics", "dice"])
    import json

    report = json.load(open(out))
    assert report["cases"]["c1"]["dice"] == 1.0


def test_dcm2niix_cli(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_dicom import make_series

    from deepwmh_tpu.cli import dcm2niix

    src = tmp_path / "d"
    os.makedirs(src)
    make_series(str(src))
    dcm2niix.main(["-i", str(src), "-o", str(tmp_path / "n")])
    assert os.path.isfile(str(tmp_path / "n" / "series_000.nii.gz"))


def test_install_cli(tmp_path):
    import jax

    from deepwmh_tpu.cli import install_model
    from deepwmh_tpu.unet import checkpoint as ckpt
    from deepwmh_tpu.unet.model import UNet3D, init_params
    from deepwmh_tpu.unet.plan import Plan
    from deepwmh_tpu.unet.release import release_model

    plan = Plan(
        target_spacing=[1.0] * 3, patch_size=[8] * 3, batch_size=1,
        pool_kernels=[[2, 2, 2]], conv_kernels=[[3, 3, 3]] * 2,
        base_features=2, max_features=4,
    )
    params = init_params(UNet3D(plan=plan), jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path / "t"), "model_best", params, meta={})
    tarball = release_model(str(tmp_path / "t"), plan, str(tmp_path / "r"))
    install_model.main(["-i", tarball, "-o", str(tmp_path / "inst")])
    assert os.path.isfile(str(tmp_path / "inst" / "plan.json"))
    # the reference's flag surface: -m/--model-targz, non-empty dir guard,
    # -f override (deepwmh/main/install_model.py:60-79)
    with pytest.raises(SystemExit):
        install_model.main(["-m", tarball, "-o", str(tmp_path / "inst")])
    install_model.main(["-m", tarball, "-o", str(tmp_path / "inst"), "-f"])
    assert os.path.isfile(str(tmp_path / "inst" / "plan.json"))


def test_group_register_cli_rejects_learned_distributed(tmp_path):
    from deepwmh_tpu.cli import group_register
    from deepwmh_tpu.core.manifests import write_csv_simple
    from deepwmh_tpu.core import nifti

    v = np.zeros((8, 8, 8), np.float32)
    p = str(tmp_path / "v.nii.gz")
    nifti.save_nifti_simple(v, p)
    csv = str(tmp_path / "c.csv")
    write_csv_simple(csv, {"case": ["a"], "data": [p]})
    with pytest.raises(SystemExit):
        group_register.main(
            ["-s", csv, "-t", csv, "-o", str(tmp_path / "o"),
             "--learned", "--distributed", "1/2"]
        )


def test_integrity_check():
    from deepwmh_tpu.cli.integrity import check_system_integrity

    assert check_system_integrity(verbose=False)


def test_train_rejects_cross_cohort_case_collision(tmp_path, rng):
    from deepwmh_tpu.cli.train import run_train
    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.core.manifests import write_csv_simple

    v = (rng.rand(8, 8, 8) * 100).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    nifti.save_nifti_simple(v, p)
    write_csv_simple(str(tmp_path / "ref.csv"), {
        "case": ["sub01"], "desc": ["h"], "flair": [p], "label1": [p], "label2": [p],
    })
    write_csv_simple(str(tmp_path / "train.csv"), {
        "case": ["sub01"], "desc": ["p"], "flair": [p],
    })
    with pytest.raises(SystemExit, match="BOTH"):
        run_train(str(tmp_path / "ref.csv"), str(tmp_path / "train.csv"),
                  str(tmp_path / "out"), skip_bfc=True)


def test_train_distributed_barrier(tmp_path, rng):
    """A lone shard must stop cleanly before label propagation."""
    from deepwmh_tpu.cli.train import run_train
    from deepwmh_tpu.core import nifti
    from deepwmh_tpu.core.manifests import write_csv_simple

    g = np.meshgrid(*[np.linspace(-1, 1, 16)] * 3, indexing="ij")
    brain = (np.sqrt(sum(a**2 for a in g)) < 0.8).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.set_shape((16, 16, 16))
    hdr.set_zooms((2.0, 2.0, 2.0))
    paths = {}
    for n in ("R0", "T0", "T1"):
        p = str(tmp_path / (n + ".nii.gz"))
        nifti.save_nifti(brain * 200 + 5 * rng.rand(16, 16, 16), hdr, p)
        paths[n] = p
    write_csv_simple(str(tmp_path / "ref.csv"), {
        "case": ["R0"], "desc": ["h"], "flair": [paths["R0"]],
        "label1": [paths["R0"]], "label2": [paths["R0"]],
    })
    write_csv_simple(str(tmp_path / "train.csv"), {
        "case": ["T0", "T1"], "desc": ["p", "p"],
        "flair": [paths["T0"], paths["T1"]],
    })
    with pytest.raises(SystemExit) as exc:
        run_train(str(tmp_path / "ref.csv"), str(tmp_path / "train.csv"),
                  str(tmp_path / "out"), skip_bfc=True, distributed="1/2")
    assert exc.value.code == 2  # "finish the other shards first"


def test_train_rejects_learned_with_distributed(tmp_path):
    """--registration-mode learned + --distributed a/b is a contradiction:
    there is no pair list to shard (one shared template + network), and two
    hosts honoring it would duplicate the most expensive work and race on
    the same artifacts. run_train must fail fast, before any device or IO
    work (tests/test_registration_policy.py relies on this guard existing
    at the CLI level)."""
    from deepwmh_tpu.cli.train import run_train

    with pytest.raises(SystemExit, match="learned"):
        run_train(str(tmp_path / "ref.csv"), str(tmp_path / "train.csv"),
                  str(tmp_path / "out"), skip_bfc=True,
                  registration_mode="learned", distributed="1/2")


def test_registration_command_matches_mode():
    """run_registration.sh must be runnable for the mode run_train selected:
    the learned CLI rejects the svf preset flags, so the emitted recovery
    command carries either --learned OR the presets, never both."""
    from deepwmh_tpu.cli.train import registration_command

    svf = registration_command("s.csv", "t.csv", "reg", "svf", True, True)
    assert "--allow-quick-registration" in svf
    assert "--allow-large-deformations" in svf
    assert "--learned" not in svf

    learned = registration_command("s.csv", "t.csv", "reg", "learned",
                                   True, True)
    assert "--learned" in learned
    assert "--allow-quick-registration" not in learned
    assert "--allow-large-deformations" not in learned


def test_train_warm_start_flag_rules(tmp_path):
    """--svf-warm-start is an svf-mode schedule (registration/warm.py):
    explicit learned mode and --distributed pair sharding are both
    contradictions that must fail fast, before any device or IO work;
    'auto' + the flag resolves to svf (the flag states svf intent)."""
    from deepwmh_tpu.cli.train import registration_command, run_train

    with pytest.raises(SystemExit, match="svf-mode"):
        run_train(str(tmp_path / "ref.csv"), str(tmp_path / "train.csv"),
                  str(tmp_path / "out"), skip_bfc=True,
                  registration_mode="learned", svf_warm_start=True)
    with pytest.raises(SystemExit, match="anchor row"):
        run_train(str(tmp_path / "ref.csv"), str(tmp_path / "train.csv"),
                  str(tmp_path / "out"), skip_bfc=True,
                  registration_mode="svf", distributed="1/2",
                  svf_warm_start=True)

    # the emitted recovery command must carry the flag iff the run used it
    warm = registration_command("s.csv", "t.csv", "reg", "svf", True, True,
                                svf_warm_start=True)
    assert "--svf-warm-start" in warm
    cold = registration_command("s.csv", "t.csv", "reg", "svf", True, True)
    assert "--svf-warm-start" not in cold
    learned = registration_command("s.csv", "t.csv", "reg", "learned",
                                   True, True, svf_warm_start=False)
    assert "--svf-warm-start" not in learned
