"""Diffeomorphic registration via stationary velocity fields (SVF).

TPU-native replacement for the reference's ANTs SyN[0.1,3,0] stage with
CC(radius 4) (deepwmh/external_tools/ANTs_group_registration.py:85-119).
Instead of porting ITK's symmetric-normalization CPU solver, the deformable
stage is an instance-wise optimization of a stationary velocity field —
the construction the reference itself ships as an alternative (VoxelMorph,
C7 in SURVEY.md §2), minus the learned network:

  warp = exp(v) computed by scaling-and-squaring (2^K compositions),
  loss = -LNCC(fixed, moving o warp) + bending-energy regularization,
  Adam over a multi-resolution pyramid, each level one jitted XLA program.

The moving image is expected already resampled to the fixed grid by the
affine stage; the result is a dense displacement field (voxel units, fixed
grid) that composes with the affine for label propagation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepwmh_tpu.ops.warp import (
    displacement_warp,
    identity_grid,
    sample_channels,
    sample_volume,
)
from deepwmh_tpu.registration.similarity import (
    downsample_mean,
    grad_sq,
    lncc,
    winsorize_rescale,
)


@dataclass(frozen=True)  # hashable: used as a static jit argument
class SVFConfig:
    # 3-level pyramid with most iterations at coarse scales (ANTs runs its
    # SyN budget the same way, 8x4x2x1). Measured at bench shape
    # (192x224x192, synthetic deformation mean 1.7 / max 6.5 vox):
    # (4,2)x(120,60) exact-grad = 56.7s/pair; this config with the
    # first-order exp gradient = 6.5s/pair at equal recovery quality
    # (LNCC 0.2236 vs 0.2241, field RMSE 2.41 vs 2.42 vox).
    shrinks: tuple = (8, 4, 2)
    iters: tuple = (120, 80, 25)
    lr: float = 0.25
    # 2 squarings (4 subdivisions) recover post-affine brain deformations
    # (~2 voxel) as well as 6 — measured identical final LNCC/field-RMSE on
    # synthetic recovery — while the backward pass (scatter-adds, the TPU
    # cost) scales linearly with squarings. Raise for large deformations.
    n_squaring: int = 2
    lncc_radius: int = 2
    bending_weight: float = 1.0
    smooth_sigma_vox: float = 1.0  # gaussian smoothing of velocity updates
    # True = exact autodiff through the squaring compositions (scatter-adds
    # in the backward pass); False = first-order pass-through VJP (see
    # scaling_and_squaring_approx_grad) — ~4x faster per iteration on TPU
    # with measured-equal recovery on post-affine-scale deformations
    # (<=10 vox max: field RMSE 0.816 vs 0.804 at 3.2x less time).
    exact_exp_grad: bool = False
    # With exact_exp_grad=False, spend the LAST this-many iterations of
    # each pyramid level on the exact gradient: at genuinely large
    # deformations (~20 vox max) the first-order VJP's bias costs ~14%
    # field RMSE, and a short exact polish from the approx optimum
    # recovers it for a fraction of the all-exact cost (the
    # large-deformation presets use this). Ignored when exact_exp_grad.
    exact_polish_iters: int = 0


def scaling_and_squaring(v, n: int = 6):
    """Integrate a stationary velocity field: phi = exp(v) via n squarings.

    Unrolled python loop (n is small and static): XLA schedules the unrolled
    gather chain ~1.6x faster than the equivalent fori_loop/scan, and the
    backward pass avoids the loop-carried accumulator staging."""
    d = v / (2.0**n)
    grid = identity_grid(v.shape[1:])
    for _ in range(n):
        # one fused 3-channel gather per squaring instead of 3 gathers
        d = d + sample_channels(d, grid + d)
    return d


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _exp_passthrough_grad(v, n):
    return scaling_and_squaring(v, n)


def _exp_pt_fwd(v, n):
    return scaling_and_squaring(v, n), None


def _exp_pt_bwd(n, _, ct):
    return (ct,)


_exp_passthrough_grad.defvjp(_exp_pt_fwd, _exp_pt_bwd)


def scaling_and_squaring_approx_grad(v, n: int = 6):
    """exp(v) with the exact forward but a first-order VJP: d(exp)/dv = I
    (exact at v=0, error O(|v|)). The exact VJP resamples the field through
    every squaring composition, whose adjoint is a scatter-add — the single
    most expensive op of the whole SVF backward on TPU (measured ~4.5x the
    forward at bench shapes). Passing the cotangent straight through is the
    classic demons/log-Euclidean gradient approximation: the update is
    Gaussian-smoothed and Adam-normalized afterwards, so only the gradient
    DIRECTION matters, and for post-affine brain deformations (|v| of a few
    voxels) recovery quality is measured equal (tests/test_registration.py)."""
    return _exp_passthrough_grad(v, n)


def _gauss_kernel1d(sigma):
    r = max(int(3 * sigma), 1)
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum())


def _smooth3(v, sigma):
    """Separable gaussian smoothing of a [3,D,H,W] field.

    Three depthwise conv HLOs (edge padding applied first so the numerics
    match replicate-boundary convolution) instead of ~7 shifted adds per
    axis — conv lowers onto the TPU's native convolution path, forward and
    backward."""
    if sigma <= 0:
        return v
    k = _gauss_kernel1d(sigma)
    r = (len(k) - 1) // 2
    x = v[None]  # [1, 3, D, H, W] (NCDHW)
    for ax in range(3):
        pad = [(0, 0), (0, 0)] + [(r, r) if a == ax else (0, 0) for a in range(3)]
        xp = jnp.pad(x, pad, mode="edge")
        kshape = [len(k) if a == ax else 1 for a in range(3)]
        kern = jnp.broadcast_to(
            k.reshape(kshape)[None, None], (3, 1) + tuple(kshape)
        )
        x = jax.lax.conv_general_dilated(
            xp, kern, (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=3,
        )
    return x[0]


def _resize_field(v, new_shape):
    """Linear-resize a [3,...] voxel-unit displacement/velocity field to a
    new grid, scaling the vectors by the grid ratio."""
    from deepwmh_tpu.ops.grid import _linear_resize_axis

    out = []
    for i in range(3):
        c = v[i]
        for ax in range(3):
            c = _linear_resize_axis(c, ax, int(new_shape[ax]))
        scale = new_shape[i] / v.shape[1 + i]
        out.append(c * scale)
    return jnp.stack(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "lr", "n_squaring", "lncc_radius", "bending", "sigma",
        "exact_exp_grad",
    ),
)
def _optimize_svf_level(
    fixed, moving, v0, iters: int, lr: float, n_squaring: int, lncc_radius: int,
    bending: float, sigma: float, exact_exp_grad: bool = True
):
    tx = optax.adam(lr)
    exp_fn = scaling_and_squaring if exact_exp_grad else scaling_and_squaring_approx_grad

    def loss_fn(v):
        vs = _smooth3(v, sigma)
        disp = exp_fn(vs, n_squaring)
        warped = displacement_warp(moving, disp)
        return -lncc(fixed, warped, radius=lncc_radius) + bending * grad_sq(vs)

    def step(carry, _):
        v, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(v)
        updates, opt_state = tx.update(g, opt_state)
        v = optax.apply_updates(v, updates)
        return (v, opt_state), loss

    (v, _), losses = jax.lax.scan(step, (v0, tx.init(v0)), None, length=iters)
    return v, losses[-1]


def _svf_core(fixed, moving, cfg: SVFConfig, v0=None):
    """The FULL deformable pyramid as one traceable function (winsorize,
    every level's Adam loop, final integration + upsample) so a pair is a
    single device dispatch when jitted — eager per-level dispatch through a
    remote-TPU tunnel costs ~1s/pair in RPC latency alone.

    v0: optional [3, D', H', W'] initial velocity field (voxel units, any
    grid — resized to the coarsest pyramid level). A first-order warm start:
    exp(v) ~= v for the smooth post-affine fields this registers, so a
    composed displacement estimate seeds the optimization directly
    (registration/warm.py) and a shortened schedule refines it."""
    fixed = winsorize_rescale(fixed)
    moving = winsorize_rescale(moving)

    v = None
    loss = jnp.float32(0.0)
    for shrink, iters in zip(cfg.shrinks, cfg.iters):
        f = downsample_mean(fixed, shrink)
        m = downsample_mean(moving, shrink)
        if v is None:
            v = (
                jnp.zeros((3,) + f.shape, jnp.float32)
                if v0 is None
                else _resize_field(jnp.asarray(v0, jnp.float32), f.shape)
            )
        else:
            v = _resize_field(v, f.shape)
        polish = (
            0 if cfg.exact_exp_grad
            else min(int(cfg.exact_polish_iters), int(iters))
        )
        schedule = [(int(iters) - polish, bool(cfg.exact_exp_grad))]
        if polish:
            schedule.append((polish, True))
        for n_it, exact in schedule:
            if n_it <= 0:
                continue
            v, loss = _optimize_svf_level(
                f,
                m,
                v,
                iters=n_it,
                lr=float(cfg.lr),
                n_squaring=int(cfg.n_squaring),
                lncc_radius=int(cfg.lncc_radius),
                bending=float(cfg.bending_weight),
                sigma=float(cfg.smooth_sigma_vox),
                exact_exp_grad=exact,
            )

    v = _smooth3(v, cfg.smooth_sigma_vox)
    disp_small = scaling_and_squaring(v, cfg.n_squaring)
    disp = _resize_field(disp_small, fixed.shape)
    return disp, loss


@functools.partial(jax.jit, static_argnames=("cfg",))
def _svf_core_jit(fixed, moving, cfg: SVFConfig):
    return _svf_core(fixed, moving, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _svf_core_batch_jit(fixed, moving, cfg: SVFConfig):
    return jax.vmap(lambda f, m: _svf_core(f, m, cfg))(fixed, moving)


def _feasible_cfg(cfg, shape):
    import dataclasses

    from deepwmh_tpu.registration.affine import feasible_levels

    shr, its = feasible_levels(cfg.shrinks, cfg.iters, shape)
    return dataclasses.replace(cfg, shrinks=tuple(shr), iters=tuple(its))


def register_svf(fixed, moving, cfg: SVFConfig = None):
    """fixed/moving on the SAME grid. Returns (disp [3,D,H,W] voxel units,
    final_loss). moving o (id + disp) ~= fixed."""
    cfg = _feasible_cfg(cfg or SVFConfig(), fixed.shape)
    disp, loss = _svf_core_jit(
        jnp.asarray(fixed, jnp.float32), jnp.asarray(moving, jnp.float32), cfg
    )
    return disp, float(loss)


def register_svf_batch(fixed_stack, moving_stack, cfg: SVFConfig = None):
    """Deformable-register B same-grid pairs in ONE vmapped XLA program.
    Returns (disp [B,3,D,H,W], losses [B])."""
    cfg = _feasible_cfg(cfg or SVFConfig(), fixed_stack.shape[1:])
    disp, losses = _svf_core_batch_jit(
        jnp.asarray(fixed_stack, jnp.float32),
        jnp.asarray(moving_stack, jnp.float32),
        cfg,
    )
    return np.asarray(disp), np.asarray(losses)


def apply_affine_svf(
    moving,
    matrix,
    disp,
    fixed_shape,
    fixed_spacing,
    moving_spacing,
    order: int = 1,
):
    """Resample `moving` (its native grid) through [affine, warp] like
    antsApplyTransforms -t affine -t warp: the output voxel is displaced by
    the warp on the fixed grid, then mapped through the physical affine into
    the moving volume."""
    disp = jnp.asarray(disp, jnp.float32)
    grid = identity_grid(tuple(fixed_shape))
    warped_vox = grid + disp
    fsp = jnp.asarray(fixed_spacing, jnp.float32).reshape(3, 1)
    msp = jnp.asarray(moving_spacing, jnp.float32).reshape(3, 1)
    matrix = jnp.asarray(matrix, jnp.float32)
    A, t = matrix[:, :3], matrix[:, 3]
    phys = warped_vox.reshape(3, -1) * fsp
    mov_phys = A @ phys + t[:, None]
    mov_vox = (mov_phys / msp).reshape((3,) + tuple(fixed_shape))
    return sample_volume(jnp.asarray(moving, jnp.float32), mov_vox, order=order)
