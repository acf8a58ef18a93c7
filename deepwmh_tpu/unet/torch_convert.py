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
    consumed = set()

    def _get(key):
        consumed.add(key)
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
        if bias_key in sd:
            consumed.add(bias_key)
            head["bias"] = np.asarray(sd[bias_key])
        else:
            head["bias"] = np.zeros(plan.num_classes, np.float32)
        params["seg_head_%d" % (P - 1 - u)] = head

    # every weight must land somewhere: a fork variant with EXTRA layers
    # (e.g. conv_per_stage=3) would otherwise convert into a silently
    # different function. Loud failure per the repo's artifact contract.
    leftover = sorted(
        k for k in sd
        if k not in consumed and not k.endswith("num_batches_tracked")
    )
    if leftover:
        raise RuntimeError(
            "checkpoint has %d weight tensors this converter did not map "
            "(unsupported architecture variant): %s%s"
            % (len(leftover), ", ".join(leftover[:6]),
               ", ..." if len(leftover) > 6 else ""))

    return {k: _tree_f32(v) for k, v in params.items()}


def _tree_f32(t):
    if isinstance(t, dict):
        return {k: _tree_f32(v) for k, v in t.items()}
    return np.asarray(t, np.float32)


def find_nnunet_model(root: str, which: str = None) -> str:
    """Locate the nnU-Net checkpoint under a reference model install
    (install_model.py:85-106 layout) or accept a direct file path.
    `which` pins a checkpoint filename (e.g. 'model_latest.model'); the
    default prefers model_best, then final, then latest. Several matches
    (multi-task/multi-fold installs) are an error, not an arbitrary pick —
    matching resolve_model_dir's refuse-ambiguity contract."""
    if os.path.isfile(root):
        return root
    if not os.path.isdir(root):
        raise RuntimeError('Directory not exist: "%s".' % root)
    names = [which] if which else [
        "model_best.model", "model_final_checkpoint.model",
        "model_latest.model",
    ]
    for name in names:
        found = sorted(
            os.path.join(dirpath, name)
            for dirpath, _dirs, files in os.walk(root)
            if name in files
        )
        if len(found) > 1:
            raise RuntimeError(
                "several %s checkpoints under %s: %s — point -i at one of "
                "them directly." % (name, root, ", ".join(found)))
        if found:
            return found[0]
    raise RuntimeError(
        "no nnU-Net checkpoint (%s) found under %s"
        % ("/".join(names), root))


def find_nnunet_plans(model_path: str, root: str = None) -> str:
    """Locate the plans pickle for a checkpoint: the trainer directory's
    plans.pkl (an ancestor of the fold dir), falling back to a UNIQUE
    *_plans_3D.pkl / plans.pkl under the search root. Ambiguity is an
    error (pairing weights with another task's plans silently changes
    spacing/patch geometry) — pass -p to pin one."""
    d = os.path.dirname(os.path.abspath(model_path))
    for _up in range(4):
        cand = os.path.join(d, "plans.pkl")
        if os.path.isfile(cand):
            return cand
        d = os.path.dirname(d)
    top = root if root and os.path.isdir(root) \
        else os.path.dirname(os.path.abspath(model_path))
    cands = sorted(
        os.path.join(dirpath, name)
        for dirpath, _dirs, files in os.walk(top)
        for name in files
        if name.endswith("_plans_3D.pkl") or name == "plans.pkl"
    )
    if len(cands) == 1:
        return cands[0]
    if not cands:
        raise RuntimeError(
            "no plans.pkl found for checkpoint %s — pass -p explicitly"
            % model_path)
    raise RuntimeError(
        "several plans files near %s: %s — pass -p to pick one."
        % (model_path, ", ".join(cands)))


def find_nnunet_checkpoint(root: str, which: str = None):
    """(model_path, plans_path) for a reference install — see
    find_nnunet_model / find_nnunet_plans."""
    model = find_nnunet_model(root, which)
    return model, find_nnunet_plans(model, root if os.path.isdir(root) else None)


def convert_nnunet_model(model_path: str, plans_path: str,
                         out_folder: str) -> str:
    """Convert a reference torch checkpoint into a framework model package
    (plan.json + msgpack weights + manifest) loadable by
    unet.release.load_released_model. The output checkpoint is always
    named model_best — the name every loader expects; WHICH reference
    checkpoint to convert is chosen by `model_path` (see
    find_nnunet_model's `which`). Returns the package folder."""
    import torch

    from deepwmh_tpu.core.artifacts import atomic_write_json, mkdir
    from deepwmh_tpu.pkginfo import __version__
    from deepwmh_tpu.unet import checkpoint as ckpt
    from deepwmh_tpu.unet import release

    plans = load_nnunet_plans(plans_path)
    plan = plan_from_nnunet_plans(plans)
    # normalization parity: this framework z-scores over the whole volume,
    # which is nnU-Net's nonCT path with use_nonzero_mask=False (the usual
    # outcome for non-skull-stripped MRI, where the nonzero crop is ~the
    # whole image). Plans that normalized within a nonzero MASK saw
    # different input statistics in training — warn loudly.
    mask_norm = plans.get("use_mask_for_norm") or {}
    if any(bool(v) for v in
           (mask_norm.values() if isinstance(mask_norm, dict) else [mask_norm])):
        import warnings

        warnings.warn(
            "this checkpoint's plans used nonzero-mask normalization "
            "(use_mask_for_norm=True); this framework normalizes over the "
            "whole volume, so inference inputs will be scaled slightly "
            "differently than in training.")
    blob = torch.load(model_path, map_location="cpu", weights_only=False)
    state_dict = blob["state_dict"] if "state_dict" in blob else blob
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in state_dict.items()}
    params = params_from_nnunet_state_dict(state_dict, plan)

    out = mkdir(out_folder)
    meta = {"converted_from": os.path.basename(model_path),
            "epoch": int(blob.get("epoch", -1)) if isinstance(blob, dict) else -1}
    ckpt.save_checkpoint(out, ckpt.MODEL_BEST, params, meta=meta)
    plan.save(os.path.join(out, release.PLAN_FILE))
    atomic_write_json(
        {"package": "deepwmh_tpu", "version": __version__, "format": 1,
         "converted_from_torch": True},
        os.path.join(out, release.MANIFEST),
    )
    release.validate_model_dir(out)
    return out
