"""Pin the analytic FLOP count (unet/flops.py) against the model's TRUE
conv shapes, extracted from the jaxpr of a real forward trace.

The analytic count is what bench.py's MFU divides by, so a drift between
flops.py's walk of the encoder/decoder schedule and the model actually
built from the same Plan would silently mis-report utilization. The jaxpr
cross-check counts 2*N*prod(out_spatial)*prod(kernel)*Cin*Cout per
conv_general_dilated equation, with the kernel==stride transpose conv
(lhs_dilation == kernel) counted at ONE tap per output voxel — the same
convention flops.py documents (each output receives exactly one
contribution).
"""

import math

import jax
import jax.numpy as jnp
import pytest

from deepwmh_tpu.unet.flops import (
    case_model_flops,
    conv_output_shape,
    forward_conv_shapes,
    forward_flops,
)
from deepwmh_tpu.unet.model import UNet3D, init_params
from deepwmh_tpu.unet.plan import Plan, features_per_stage


def _tiny_plan(pool_kernels, conv_kernels, num_classes=2):
    return Plan(
        target_spacing=[1.0, 1.0, 1.0],
        patch_size=[16, 16, 16],
        batch_size=2,
        pool_kernels=pool_kernels,
        conv_kernels=conv_kernels,
        base_features=4,
        max_features=16,
        num_classes=num_classes,
    )


def _jaxpr_conv_flops(jaxpr) -> int:
    """Sum conv FLOPs over every conv_general_dilated eqn, recursively
    through sub-jaxprs (pjit/remat/custom calls)."""
    total = 0
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                inner = getattr(item, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    total += _jaxpr_conv_flops(inner)
                elif hasattr(item, "eqns"):
                    total += _jaxpr_conv_flops(item)
        if eqn.primitive.name != "conv_general_dilated":
            continue
        rhs = eqn.invars[1].aval.shape  # HWIO / DHWIO
        out = eqn.outvars[0].aval.shape  # N...C (channels-last here)
        k_spatial = rhs[:-2]
        cin, cout = rhs[-2], rhs[-1]
        n, out_spatial = out[0], out[1:-1]
        taps = math.prod(k_spatial)
        lhs_dil = tuple(eqn.params.get("lhs_dilation") or ())
        if lhs_dil and tuple(lhs_dil) == tuple(k_spatial) and any(
            d > 1 for d in lhs_dil
        ):
            taps = 1  # kernel==stride transpose conv: one tap per output
        total += 2 * n * math.prod(out_spatial) * taps * cin * cout
    return total


def _model_trace_flops(plan, spatial, decompose):
    model = UNet3D(plan=plan, dtype=jnp.float32,
                   decompose_fullres=decompose)
    params = init_params(model, jax.random.PRNGKey(0), patch_size=spatial)
    x = jnp.zeros((1,) + tuple(spatial) + (plan.in_channels,), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda p, v: model.apply({"params": p}, v)
    )(params, x).jaxpr
    # dead-code-eliminate first: with deep_supervision=False the module
    # still TRACES the deeper seg heads (the param tree is invariant to the
    # flag) but XLA removes them from the compiled program, and flops.py
    # deliberately counts the compiled program
    from jax.interpreters import partial_eval as pe

    jaxpr, _ = pe.dce_jaxpr(jaxpr, [True] * len(jaxpr.outvars))
    return _jaxpr_conv_flops(jaxpr)


@pytest.mark.parametrize("decompose", [False, True])
def test_forward_flops_match_traced_model(decompose):
    plan = _tiny_plan(
        pool_kernels=[[2, 2, 2], [2, 2, 2]],
        conv_kernels=[[3, 3, 3], [3, 3, 3], [3, 3, 3]],
    )
    spatial = (16, 16, 16)
    analytic = forward_flops(plan, spatial)
    traced = _model_trace_flops(plan, spatial, decompose)
    assert analytic == traced


def test_forward_flops_anisotropic_plan():
    # anisotropic pooling + mixed conv kernels, non-pool-divisible shape
    plan = _tiny_plan(
        pool_kernels=[[1, 2, 2], [2, 2, 2]],
        conv_kernels=[[1, 3, 3], [3, 3, 3], [3, 3, 3]],
        num_classes=3,
    )
    spatial = (8, 16, 16)
    assert forward_flops(plan, spatial) == _model_trace_flops(
        plan, spatial, False
    )


def test_forward_flops_no_pool_plan():
    plan = _tiny_plan(pool_kernels=[], conv_kernels=[[3, 3, 3]])
    spatial = (8, 8, 8)
    assert forward_flops(plan, spatial) == _model_trace_flops(
        plan, spatial, False
    )


def test_forward_flops_batch_scales_linearly():
    plan = _tiny_plan(
        pool_kernels=[[2, 2, 2]], conv_kernels=[[3, 3, 3], [3, 3, 3]]
    )
    one = forward_flops(plan, (8, 8, 8), batch=1)
    assert forward_flops(plan, (8, 8, 8), batch=3) == 3 * one


def test_conv_output_shape_ceil():
    assert conv_output_shape((7, 8, 9), (2, 2, 2)) == (4, 4, 5)
    assert conv_output_shape((7, 8, 9), (1, 1, 1)) == (7, 8, 9)


def test_conv_shapes_walk_matches_stage_features():
    plan = _tiny_plan(
        pool_kernels=[[2, 2, 2], [2, 2, 2]],
        conv_kernels=[[3, 3, 3], [3, 3, 3], [3, 3, 3]],
    )
    feats = features_per_stage(plan)
    shapes = forward_conv_shapes(plan, (16, 16, 16))
    # 2 convs per encoder stage (3 stages) + (upsample + 2 convs) per
    # decoder stage (2 stages) + 1 seg head
    assert len(shapes) == 2 * 3 + 3 * 2 + 1
    # first conv reads the input channels, seg head emits num_classes
    assert shapes[0][2] == plan.in_channels
    assert shapes[-1][3] == plan.num_classes
    # decoder convs read the concatenated skip (2x features)
    dec_first_conv = shapes[2 * 3 + 1]
    assert dec_first_conv[2] == 2 * feats[1]


def test_case_model_flops_patch_vs_fullvol():
    plan = _tiny_plan(
        pool_kernels=[[2, 2, 2]], conv_kernels=[[3, 3, 3], [3, 3, 3]]
    )
    plan.patch_size = [8, 8, 8]
    res_shape = (12, 12, 12)
    patch = case_model_flops(plan, res_shape, (8, 8, 8), 0.5,
                             tta=False, fullvol=False)
    full = case_model_flops(plan, res_shape, (8, 8, 8), 0.5,
                            tta=False, fullvol=True)
    assert patch > 0 and full > 0
    # TTA multiplies by the 8 mirror flips
    assert case_model_flops(plan, res_shape, (8, 8, 8), 0.5,
                            tta=True, fullvol=True) == 8 * full
