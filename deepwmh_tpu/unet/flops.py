"""Analytic forward-pass FLOP count for the plan-driven 3D U-Net.

Convolution MACs x2, walking the exact encoder/decoder schedule of
UNet3D.__call__ (model.py): two convs per encoder stage (the first strided
past stage 0), transpose-conv upsample + two convs per decoder stage, one
1x1x1 seg head at full resolution (deep_supervision=False — XLA dead-code
eliminates the unused deeper heads, so they are not counted).

Used by bench.py's MFU instead of a compiled-program `cost_analysis()`
probe: the count is deterministic, costs zero device/compile time (the
axon TPU service compiles server-side, so the old probe burned 30-120 s of
bench wall per run), and counts only the model's useful math. The
transpose conv (kernel == stride) is counted at ONE kernel tap per output
voxel — each output receives exactly one contribution — where XLA's cost
model counts its dilated-conv lowering differently; norm/activation
elementwise FLOPs are excluded. Net effect vs the old cost_analysis
number at the bench shape: ~5% lower (31.6 -> 30.1 TFLOP per 8-flip TTA
volume), i.e. reported MFU shifts down ~5% at identical wall time.
tests/test_flops.py pins the count against the model's true conv shapes.
"""

from __future__ import annotations

import math

from deepwmh_tpu.unet.plan import Plan, features_per_stage


def conv_output_shape(in_spatial, stride):
    """XLA SAME-padding output spatial dims (ceil division)."""
    return tuple(-(-a // int(s)) for a, s in zip(in_spatial, stride))


def forward_conv_shapes(plan: Plan, input_spatial):
    """Yield (out_spatial, kernel, c_in, c_out) for every conv/transpose-conv
    in one UNet3D forward (deep_supervision=False), in execution order.
    Transpose convs are tagged by kernel == their stride and counted at one
    tap per output (see module docstring)."""
    feats = features_per_stage(plan)
    P = len(plan.pool_kernels)
    spatial = [tuple(int(v) for v in input_spatial)]
    for i in range(P):
        spatial.append(conv_output_shape(spatial[-1], plan.pool_kernels[i]))

    shapes = []
    for i in range(P + 1):
        c_in = plan.in_channels if i == 0 else feats[i - 1]
        k = tuple(plan.conv_kernels[i])
        shapes.append((spatial[i], k, c_in, feats[i]))
        shapes.append((spatial[i], k, feats[i], feats[i]))
    for i in range(P - 1, -1, -1):
        k = tuple(plan.pool_kernels[i])
        up_out = tuple(a * b for a, b in zip(spatial[i + 1], k))
        # transpose conv, kernel == stride: one tap per output voxel
        shapes.append((up_out, (1, 1, 1), feats[i + 1], feats[i]))
        ck = tuple(plan.conv_kernels[i])
        shapes.append((spatial[i], ck, 2 * feats[i], feats[i]))
        shapes.append((spatial[i], ck, feats[i], feats[i]))
    shapes.append((spatial[0], (1, 1, 1), feats[0], plan.num_classes))
    return shapes


def forward_flops(plan: Plan, input_spatial, batch: int = 1) -> int:
    """Conv MACs x2 of one batch-`batch` forward at `input_spatial`."""
    total = 0
    for out_sp, k, c_in, c_out in forward_conv_shapes(plan, input_spatial):
        total += 2 * math.prod(out_sp) * math.prod(k) * c_in * c_out
    return int(total) * int(batch)


def case_model_flops(plan: Plan, res_shape, patch_size, step_fraction,
                     tta: bool, fullvol: bool) -> int:
    """Model FLOPs of one full inference case: |flips| x the forward cost,
    whole-volume mode at the padded fullvol shape, patch mode at the patch
    size x the number of real sliding-window positions."""
    import numpy as np

    from deepwmh_tpu.unet.infer import (
        ALL_FLIPS,
        NO_FLIPS,
        fullvol_shape,
        patch_positions,
    )
    from deepwmh_tpu.unet.preprocess import padded_shape

    n_flips = len(ALL_FLIPS if tta else NO_FLIPS)
    if fullvol:
        target = fullvol_shape(res_shape, plan)
        return n_flips * forward_flops(plan, target)
    target = padded_shape(res_shape, patch_size)
    _pos, pos_w = patch_positions(target, patch_size, step_fraction)
    n_real = int(np.asarray(pos_w).sum())
    return n_flips * n_real * forward_flops(plan, patch_size)
