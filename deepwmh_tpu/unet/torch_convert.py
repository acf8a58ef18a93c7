"""Convert the reference's released PyTorch nnU-Net checkpoints.

The reference ships trained models as pickled PyTorch checkpoints of its
nnU-Net fork's Generic_UNet (release layout at
deepwmh/pipeline/DCNN_multistage.py:608-638, installed by
deepwmh/main/install_model.py:85-106:
``nnUNet/3d_fullres/<task>/nnUNetTrainerV2__nnUNetPlansv2.1/all/
model_best.model`` + ``plans.pkl``). This module maps those weights onto
this framework's UNet3D so reference users keep their trained models when
switching — the one artifact docs/MIGRATION.md would otherwise declare
non-transferable.

The architectures are the same topology family (conv-instnorm-lrelu
encoder with strided-conv downsampling, transpose-conv decoder with skip
concatenation, per-level segmentation heads), so conversion is a pure
weight relayout. Every mapping below is numerically exact (verified by a
forward-parity test against a faithful torch replica of Generic_UNet):

- conv weights:      torch [out,in,kd,kh,kw]  -> [kd,kh,kw,in,out]
- transpose convs:   torch [in,out,kd,kh,kw]  -> [kd,kh,kw,in,out] with the
  spatial axes FLIPPED (lax.conv_transpose correlates where torch's
  ConvTranspose convolves)
- InstanceNorm3d(affine) weight/bias -> GroupNorm(group_size=1) scale/bias
- seg heads:         1x1x1 convs; the fork uses bias-free heads, this
  framework's heads carry a bias -> filled with zeros when absent
- strided convs: torch pads symmetrically (k//2) where XLA SAME pads
  asymmetrically on even inputs, so converted plans set
  ``pad_style="torch"`` (unet/plan.py) and Conv3D reproduces the torch
  geometry exactly.

SECURITY NOTE: torch checkpoints and plans.pkl are pickles — only convert
files you trust, exactly as the reference's own installer requires
(install_model.py loads and rewrites the same pickles).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from deepwmh_tpu.unet.plan import Plan

MAX_FEATURES_3D = 320  # Generic_UNet.MAX_NUM_FILTERS_3D


def load_nnunet_plans(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def plan_from_nnunet_plans(plans: dict, pad_style: str = "torch") -> Plan:
    """Build this framework's Plan from an nnU-Net plans.pkl dict (the
    fork trains config '3d_fullres' = the LAST entry of plans_per_stage,
    DCNN_multistage.py:199-202)."""
    per_stage = plans["plans_per_stage"]
    stage_key = sorted(per_stage.keys())[-1]
    st = per_stage[stage_key]
    pool = [[int(v) for v in k] for k in st["pool_op_kernel_sizes"]]
    conv = [[int(v) for v in k] for k in st["conv_kernel_sizes"]]
    # nnU-Net emits one conv kernel per stage (num_pools+1); tolerate a
    # truncated list by repeating the last entry
    while len(conv) < len(pool) + 1:
        conv.append(conv[-1])
    return Plan(
        target_spacing=[float(s) for s in st["current_spacing"]],
        patch_size=[int(p) for p in st["patch_size"]],
        batch_size=int(st.get("batch_size", 2)),
        pool_kernels=pool,
        conv_kernels=conv[: len(pool) + 1],
        base_features=int(plans.get("base_num_features", 32)),
        max_features=MAX_FEATURES_3D,
        # nnU-Net plans count foreground classes; the network adds background
        num_classes=int(plans["num_classes"]) + 1,
        in_channels=int(plans.get("num_modalities", 1)),
        normalization="zscore",
        median_shape=[int(v) for v in st.get("median_patient_size_in_voxels",
                                             [0, 0, 0])],
        pad_style=pad_style,
    )


def _conv_w(w) -> np.ndarray:
    """torch conv weight [out,in,kd,kh,kw] -> flax [kd,kh,kw,in,out]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _convT_w(w) -> np.ndarray:
    """torch ConvTranspose3d weight [in,out,kd,kh,kw] -> flax ConvTranspose
    kernel [kd,kh,kw,in,out], spatially flipped (correlation vs
    convolution)."""
    wt = np.transpose(np.asarray(w), (2, 3, 4, 0, 1))
    return np.ascontiguousarray(wt[::-1, ::-1, ::-1])


def params_from_nnunet_state_dict(state_dict: dict, plan: Plan) -> dict:
    """Map a Generic_UNet state_dict onto UNet3D's parameter tree.

    Generic_UNet module layout (nnUNetTrainerV2, conv_per_stage=2,
    convolutional pooling + upsampling):
      conv_blocks_context.{s}.blocks.{0,1}.(conv|instnorm)   s in 0..P-1
      conv_blocks_context.{P}.{0,1}.blocks.0.(conv|instnorm) bottleneck
      tu.{u}                                                 u=0 deepest
      conv_blocks_localization.{u}.{0,1}.blocks.0.(conv|instnorm)
      seg_outputs.{u}                                        u=0 deepest
    UNet3D layout: ConvNormAct_{n} in creation order (encoder stage i ->
    2i,2i+1; decoder from deepest -> 2P+2+2u, 2P+3+2u), ConvTranspose_{u},
    seg_head_{level} with level = P-1-u (unet/model.py __call__)."""
    # DataParallel-trained checkpoints prefix every key with "module."
    sd = {(k[7:] if k.startswith("module.") else k): np.asarray(v)
          for k, v in state_dict.items()}
    P = plan.num_pools
    params = {}

    def _get(key):
        if key not in sd:
            near = sorted(k for k in sd if k.split(".")[0] == key.split(".")[0])
            raise KeyError(
                "state_dict key %r not found — the checkpoint's layout "
                "doesn't match Generic_UNet (conv_per_stage=2, convolutional "
                "pooling/upsampling). Nearby keys: %s" % (key, near[:8]))
        return sd[key]

    def block(dst_idx, conv_prefix, norm_prefix):
        entry = {
            "Conv_0": {
                "kernel": _conv_w(_get(conv_prefix + ".weight")),
                "bias": np.asarray(_get(conv_prefix + ".bias")),
            },
            "GroupNorm_0": {
                "scale": np.asarray(_get(norm_prefix + ".weight")),
                "bias": np.asarray(_get(norm_prefix + ".bias")),
            },
        }
        params["ConvNormAct_%d" % dst_idx] = entry

    # encoder stages 0..P-1: one StackedConvLayers with two blocks
    for s in range(P):
        for b in range(2):
            block(2 * s + b,
                  "conv_blocks_context.%d.blocks.%d.conv" % (s, b),
                  "conv_blocks_context.%d.blocks.%d.instnorm" % (s, b))
    # bottleneck: Sequential of two single-block StackedConvLayers
    for b in range(2):
        block(2 * P + b,
              "conv_blocks_context.%d.%d.blocks.0.conv" % (P, b),
              "conv_blocks_context.%d.%d.blocks.0.instnorm" % (P, b))
    # decoder: u=0 is the deepest localization stage
    for u in range(P):
        params["ConvTranspose_%d" % u] = {
            "kernel": _convT_w(_get("tu.%d.weight" % u))
        }
        for b in range(2):
            block(2 * P + 2 + 2 * u + b,
                  "conv_blocks_localization.%d.%d.blocks.0.conv" % (u, b),
                  "conv_blocks_localization.%d.%d.blocks.0.instnorm" % (u, b))
        head = {"kernel": _conv_w(_get("seg_outputs.%d.weight" % u))}
        bias_key = "seg_outputs.%d.bias" % u
        head["bias"] = (np.asarray(sd[bias_key]) if bias_key in sd
                        else np.zeros(plan.num_classes, np.float32))
        params["seg_head_%d" % (P - 1 - u)] = head

    return {k: _tree_f32(v) for k, v in params.items()}


def _tree_f32(t):
    if isinstance(t, dict):
        return {k: _tree_f32(v) for k, v in t.items()}
    return np.asarray(t, np.float32)


def find_nnunet_checkpoint(root: str):
    """Locate model_best.model + plans.pkl under a reference model install
    (install_model.py:85-106 layout) or accept direct file paths."""
    if os.path.isfile(root):
        model = root
    else:
        model = None
        for dirpath, _dirs, files in os.walk(root):
            for name in ("model_best.model", "model_final_checkpoint.model",
                         "model_latest.model"):
                if name in files:
                    model = os.path.join(dirpath, name)
                    break
            if model:
                break
        if model is None:
            raise RuntimeError(
                "no nnU-Net checkpoint (*.model) found under %s" % root)
    # plans.pkl sits in the trainer directory (two levels up from the fold
    # dir) or at the install root as <planner>_plans_3D.pkl
    candidates = []
    d = os.path.dirname(model)
    for up in range(3):
        candidates.append(os.path.join(d, "plans.pkl"))
        d = os.path.dirname(d)
    top = root if os.path.isdir(root) else os.path.dirname(root)
    for dirpath, _dirs, files in os.walk(top):
        for name in files:
            if name.endswith("_plans_3D.pkl") or name == "plans.pkl":
                candidates.append(os.path.join(dirpath, name))
    for c in candidates:
        if os.path.isfile(c):
            return model, c
    raise RuntimeError(
        "found checkpoint %s but no plans.pkl next to it" % model)


def convert_nnunet_model(model_path: str, plans_path: str, out_folder: str,
                         checkpoint_name: str = "model_best") -> str:
    """Convert a reference torch checkpoint into a framework model package
    (plan.json + msgpack weights + manifest) loadable by
    unet.release.load_released_model. Returns the package folder."""
    import torch

    from deepwmh_tpu.core.artifacts import atomic_write_json, mkdir
    from deepwmh_tpu.pkginfo import __version__
    from deepwmh_tpu.unet import checkpoint as ckpt
    from deepwmh_tpu.unet import release

    plans = load_nnunet_plans(plans_path)
    plan = plan_from_nnunet_plans(plans)
    blob = torch.load(model_path, map_location="cpu", weights_only=False)
    state_dict = blob["state_dict"] if "state_dict" in blob else blob
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in state_dict.items()}
    params = params_from_nnunet_state_dict(state_dict, plan)

    out = mkdir(out_folder)
    meta = {"converted_from": os.path.basename(model_path),
            "epoch": int(blob.get("epoch", -1)) if isinstance(blob, dict) else -1}
    ckpt.save_checkpoint(out, checkpoint_name, params, meta=meta)
    plan.save(os.path.join(out, release.PLAN_FILE))
    atomic_write_json(
        {"package": "deepwmh_tpu", "version": __version__, "format": 1,
         "converted_from_torch": True},
        os.path.join(out, release.MANIFEST),
    )
    release.validate_model_dir(out)
    return out
