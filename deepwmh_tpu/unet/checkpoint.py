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
    data = serialization.to_bytes(payload)
    tmp = os.path.join(folder, name + ".msgpack.tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, os.path.join(folder, name + ".msgpack"))
    atomic_write_json(meta or {}, os.path.join(folder, name + ".json"))


def checkpoint_exists(folder: str, name: str) -> bool:
    return os.path.isfile(os.path.join(folder, name + ".msgpack"))


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
