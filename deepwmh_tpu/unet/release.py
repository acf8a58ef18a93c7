"""Model packaging: release / install / load.

Replaces the reference's model release+install machinery
(deepwmh/pipeline/DCNN_multistage.py:595-641, deepwmh/main/install_model.py):
a released model is a tar.gz containing plan.json + model_best checkpoint +
a manifest. Unlike the reference — which must rewrite absolute paths inside
pickled nnU-Net metadata at install time (install_model.py:91-106) — the
package is fully relocatable: no paths, no pickles.
"""

from __future__ import annotations

import json
import os
import tarfile

import jax

from deepwmh_tpu.core.artifacts import atomic_write_json, mkdir
from deepwmh_tpu.pkginfo import __version__
from deepwmh_tpu.unet import checkpoint as ckpt
from deepwmh_tpu.unet.model import UNet3D, init_params
from deepwmh_tpu.unet.plan import Plan

MANIFEST = "framework.json"
PLAN_FILE = "plan.json"
RELEASE_TARBALL = "model_release.tar.gz"


def release_model(train_dir: str, plan: Plan, out_folder: str, make_tarball=True) -> str:
    """Collect model_best + plan into `out_folder` and compress.

    Returns the tarball path (or the folder when make_tarball=False)."""
    out = mkdir(out_folder)
    if not ckpt.checkpoint_exists(train_dir, ckpt.MODEL_BEST):
        raise RuntimeError(
            "no %s checkpoint in %s — train the pipeline first"
            % (ckpt.MODEL_BEST, train_dir)
        )
    for suffix in (".msgpack", ".json"):
        src = os.path.join(train_dir, ckpt.MODEL_BEST + suffix)
        dst = os.path.join(out, ckpt.MODEL_BEST + suffix)
        if os.path.isfile(src):
            with open(src, "rb") as f:
                data = f.read()
            with open(dst, "wb") as f:
                f.write(data)
    plan.save(os.path.join(out, PLAN_FILE))
    atomic_write_json(
        {"package": "deepwmh_tpu", "version": __version__, "format": 1},
        os.path.join(out, MANIFEST),
    )
    if not make_tarball:
        return out
    tarball = os.path.join(out, RELEASE_TARBALL)
    if os.path.isfile(tarball):
        os.remove(tarball)
    with tarfile.open(tarball, "w:gz") as tf:
        for name in os.listdir(out):
            if name != RELEASE_TARBALL:
                tf.add(os.path.join(out, name), arcname=name)
    return tarball


def install_model(tarball: str, dest_folder: str) -> str:
    """Unpack a released model (reference DeepWMH_install semantics). The
    package is relocatable, so installation is extraction + validation."""
    dest = mkdir(dest_folder)
    with tarfile.open(tarball, "r:gz") as tf:
        tf.extractall(dest, filter="data")
    validate_model_dir(dest)
    return dest


def validate_model_dir(folder: str) -> None:
    missing = [
        f
        for f in (PLAN_FILE, ckpt.MODEL_BEST + ".msgpack")
        if not os.path.isfile(os.path.join(folder, f))
    ]
    if missing:
        raise RuntimeError(
            "invalid model directory %s: missing %s" % (folder, ", ".join(missing))
        )
    manifest = os.path.join(folder, MANIFEST)
    if os.path.isfile(manifest):
        with open(manifest) as f:
            meta = json.load(f)
        if meta.get("package") != "deepwmh_tpu":
            raise RuntimeError("not a deepwmh_tpu model package: %s" % folder)


def resolve_model_dir(folder: str, task_name: str | None = None) -> str:
    """Resolve `-m` to a concrete model package (reference
    deepwmh/main/predict.py:139-147: the model root may contain several task
    folders; exactly one is auto-detected, more require --custom-task-name).
    A folder that is itself a valid package resolves to itself."""
    if not os.path.isdir(folder):
        raise RuntimeError('Directory not exist: "%s".' % folder)
    is_pkg = os.path.isfile(os.path.join(folder, PLAN_FILE))
    if task_name is not None:
        cand = os.path.join(folder, task_name)
        if not os.path.isdir(cand):
            raise RuntimeError(
                'task folder "%s" not found in "%s"' % (task_name, folder))
        validate_model_dir(cand)
        return cand
    if is_pkg:
        validate_model_dir(folder)
        return folder
    tasks = sorted(
        d for d in os.listdir(folder)
        if os.path.isfile(os.path.join(folder, d, PLAN_FILE))
    )
    if len(tasks) == 0:
        # fall through to the standard invalid-package error for `folder`
        validate_model_dir(folder)
        return folder
    if len(tasks) > 1:
        raise RuntimeError(
            'Found multiple task folders in "%s": %s — select one with '
            "--custom-task-name." % (folder, ", ".join(tasks)))
    task = os.path.join(folder, tasks[0])
    validate_model_dir(task)
    return task


def load_released_model(folder: str, checkpoint_name: str = ckpt.MODEL_BEST):
    """Returns (model, params, plan) ready for SlidingWindowPredictor."""
    validate_model_dir(folder)
    plan = Plan.load(os.path.join(folder, PLAN_FILE))
    model = UNet3D(plan=plan)
    template = init_params(model, jax.random.PRNGKey(0))
    params, _ = ckpt.load_params_only(folder, checkpoint_name, template)
    return model, params, plan
