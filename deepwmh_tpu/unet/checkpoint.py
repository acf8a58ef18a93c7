"""Checkpoint save/load for the U-Net engine.

Replaces the nnU-Net fork's model_latest / model_best / model_ep_%04d
torch checkpoints (reference: deepwmh/pipeline/DCNN_multistage.py:149,
300-304,321,331,510-515) with pickle-free msgpack (flax.serialization)
payloads plus a JSON metadata sidecar — portable and safe to rewrite at
install time (the reference has to patch pickled absolute paths,
install_model.py:91-106; we never store paths in checkpoints at all).
"""

from __future__ import annotations

import os

import jax
from flax import serialization

from deepwmh_tpu.core.artifacts import atomic_write_json, load_json

MODEL_LATEST = "model_latest"
MODEL_BEST = "model_best"
MODEL_EPOCH_FMT = "model_ep_%04d"


def save_checkpoint(folder: str, name: str, params, opt_state=None, meta: dict = None):
    os.makedirs(folder, exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    # one pipelined device->host fetch of the whole tree BEFORE msgpack:
    # to_bytes would otherwise np.asarray each leaf serially, paying one
    # blocking device round-trip per parameter tensor — over the remote-TPU
    # tunnel that was measured as seconds per save (2 saves/epoch), the
    # dominant cost of small-patch training epochs. device_get issues all
    # the copies asynchronously and blocks once.
    payload = jax.device_get(payload)
    data = serialization.to_bytes(payload)
    tmp = os.path.join(folder, name + ".msgpack.tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, os.path.join(folder, name + ".msgpack"))
    atomic_write_json(meta or {}, os.path.join(folder, name + ".json"))


def checkpoint_exists(folder: str, name: str) -> bool:
    return os.path.isfile(os.path.join(folder, name + ".msgpack"))


def link_checkpoint(folder: str, src: str, dst: str):
    """Make `dst` an alias of the already-written `src` checkpoint without
    re-serializing the weights: hardlink the msgpack (copy as fallback on
    filesystems without links) and copy the small meta json. Used by noval
    training where model_best == model_latest every epoch — rewriting tens
    of MB of identical weights per epoch is pure wasted IO, but SKIPPING the
    write entirely would leave no model_best at all if the run is killed."""
    import shutil

    src_m = os.path.join(folder, src + ".msgpack")
    dst_m = os.path.join(folder, dst + ".msgpack")
    tmp = dst_m + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    try:
        os.link(src_m, tmp)
    except OSError:
        shutil.copyfile(src_m, tmp)
    os.replace(tmp, dst_m)
    src_j = os.path.join(folder, src + ".json")
    if os.path.isfile(src_j):
        shutil.copyfile(src_j, os.path.join(folder, dst + ".json"))


def load_checkpoint(folder: str, name: str, params_template, opt_state_template=None):
    """Restore into templates with matching pytree structure. Returns
    (params, opt_state_or_None, meta)."""
    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
    with open(os.path.join(folder, name + ".msgpack"), "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(target, data)
    meta_path = os.path.join(folder, name + ".json")
    meta = load_json(meta_path) if os.path.isfile(meta_path) else {}
    params = restored["params"]
    opt_state = restored.get("opt_state") if opt_state_template is not None else None
    return params, opt_state, meta


def load_params_only(folder: str, name: str, params_template):
    p, _, meta = load_checkpoint(folder, name, params_template)
    return jax.tree_util.tree_map(lambda x: x, p), meta
