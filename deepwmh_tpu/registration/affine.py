"""Multi-resolution rigid + affine registration by gradient descent.

TPU-native replacement for the Rigid[0.1] + Affine[0.1] stages of the
reference's ANTs command (deepwmh/external_tools/ANTs_group_registration.py:
85-119: MI with 32 bins, shrink factors 8x4x2x1, winsorize [0.005,0.995]).
Instead of ITK's gradient-descent-with-line-search on CPU, each pyramid
level is a jitted Adam loop over a differentiable MI (or LNCC) loss — the
entire level (resampling + metric + gradients + updates) is one fused XLA
program.

Conventions: the transform maps FIXED physical coordinates to MOVING
physical coordinates (resampling/pull-back convention, like ITK/ANTs), with
physical = voxel * spacing (axis-aligned RAS volumes; reorient first).
Rigid stage: rotation angles + translation about the fixed image's center
of mass; affine stage: full 3x3 perturbation initialized from the rigid fit.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepwmh_tpu.ops.warp import identity_grid, rotation_matrix, sample_volume
from deepwmh_tpu.registration.similarity import (
    lncc,
    mutual_information,
    winsorize_rescale,
    downsample_mean,
)


@dataclass(frozen=True)  # hashable: used as a static jit argument
class AffineConfig:
    metric: str = "mi"  # 'mi' or 'lncc'
    mi_bins: int = 32
    lncc_radius: int = 4
    shrinks: tuple = (8, 4, 2)
    iters: tuple = (150, 80, 40)
    lr: float = 0.05
    do_rigid: bool = True
    do_affine: bool = True
    # MI sampling fraction (the reference's ANTs command uses MI with 0.25
    # sampling, ANTs_group_registration.py:85-119): with stride-based
    # sampling only 1/stride of the fixed voxels are resampled + binned
    sample_stride: int = 4


def _phys_grid(shape, spacing):
    g = identity_grid(shape)
    sp = jnp.asarray(spacing, jnp.float32).reshape(3, 1, 1, 1)
    return g * sp


def resample_moving(moving, matrix, fixed_shape, fixed_spacing, moving_spacing, order=1):
    """Resample `moving` onto the fixed grid through a physical-space 3x4
    affine (fixed phys -> moving phys)."""
    matrix = jnp.asarray(matrix, jnp.float32)
    A, t = matrix[:, :3], matrix[:, 3]
    grid = _phys_grid(fixed_shape, fixed_spacing).reshape(3, -1)
    mov_phys = A @ grid + t[:, None]
    mov_vox = mov_phys / jnp.asarray(moving_spacing, jnp.float32).reshape(3, 1)
    coords = mov_vox.reshape((3,) + tuple(fixed_shape))
    return sample_volume(moving, coords, order=order)


def _params_to_matrix(params, center, mode: str):
    """mode 'rigid': params = [3 angles, 3 trans]; mode 'affine':
    params = [9 linear perturbation, 3 trans] composed about `center`."""
    if mode == "rigid":
        R = rotation_matrix(params[:3])
        t = params[3:6]
    else:
        R = jnp.eye(3) + params[:9].reshape(3, 3)
        t = params[9:12]
    # x_mov = R @ (x_fix - c) + c + t
    offset = center - R @ center + t
    return jnp.concatenate([R, offset[:, None]], axis=1)


def _center_of_mass(x, spacing):
    g = _phys_grid(x.shape, spacing)
    w = jnp.maximum(x, 0.0)
    total = jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.stack([jnp.sum(g[i] * w) / total for i in range(3)])


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "iters", "lr", "metric", "mi_bins", "lncc_radius", "sample_stride",
    ),
)
def _optimize_level(
    fixed,
    moving,
    fixed_spacing,
    moving_spacing,
    params0,
    center,
    mode: str,
    iters: int,
    lr: float,
    metric: str,
    mi_bins: int,
    lncc_radius: int,
    sample_stride: int = 1,
):
    tx = optax.adam(lr)

    if metric == "mi" and sample_stride > 1:
        # strided voxel sampling (ANTs' MI 0.25-sampling role): resample the
        # moving image and bin the joint histogram only at every
        # sample_stride-th fixed voxel
        grid_phys = _phys_grid(fixed.shape, fixed_spacing).reshape(3, -1)
        grid_phys = grid_phys[:, ::sample_stride]
        fixed_samp = fixed.reshape(-1)[::sample_stride]
        msp = jnp.asarray(moving_spacing, jnp.float32).reshape(3, 1)

        def loss_fn(params):
            mat = _params_to_matrix(params, center, mode)
            A, t = mat[:, :3], mat[:, 3]
            mov_vox = (A @ grid_phys + t[:, None]) / msp
            vals = sample_volume(moving, mov_vox)
            return -mutual_information(fixed_samp, vals, nbins=mi_bins)

    else:

        def loss_fn(params):
            mat = _params_to_matrix(params, center, mode)
            warped = resample_moving(
                moving, mat, fixed.shape, fixed_spacing, moving_spacing
            )
            if metric == "mi":
                return -mutual_information(fixed, warped, nbins=mi_bins)
            return -lncc(fixed, warped, radius=lncc_radius)

    def step(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step, (params0, tx.init(params0)), None, length=iters
    )
    return params, losses[-1]


def feasible_levels(shrinks, iters, shape, min_dim: int = 8):
    """Drop pyramid levels too coarse for this volume (each level must keep
    every axis >= min_dim); always keep at least the finest requested."""
    out_s, out_i = [], []
    for s, it in zip(shrinks, iters):
        if min(shape) // s >= min_dim:
            out_s.append(s)
            out_i.append(it)
    if not out_s:
        out_s, out_i = [1], [iters[-1]]
    return tuple(out_s), tuple(out_i)


def _affine_core(fixed, moving, fsp, msp, cfg: AffineConfig):
    """The FULL rigid+affine pyramid as one traceable function: winsorize,
    center-of-mass init, every level's Adam loop — so a registration is a
    single device dispatch when jitted (eager per-level dispatch through a
    remote-TPU tunnel costs ~1s/pair in RPC latency alone)."""
    fixed = winsorize_rescale(fixed)
    moving = winsorize_rescale(moving)

    center = _center_of_mass(fixed, fsp)
    com_m = _center_of_mass(moving, msp)

    rigid_params = jnp.zeros((6,), jnp.float32).at[3:6].set(com_m - center)
    affine_params = None
    final_loss = jnp.float32(0.0)

    stages = (["rigid"] if cfg.do_rigid else []) + (
        ["affine"] if cfg.do_affine else []
    )
    if not stages:
        raise ValueError(
            "AffineConfig with do_rigid=False and do_affine=False optimizes "
            "nothing — enable at least one stage"
        )
    for mode in stages:
        if mode == "affine":
            if affine_params is None:
                R = rotation_matrix(rigid_params[:3])
                affine_params = jnp.concatenate(
                    [(R - jnp.eye(3)).reshape(-1), rigid_params[3:6]]
                )
            params = affine_params
        else:
            params = rigid_params

        for shrink, iters in zip(cfg.shrinks, cfg.iters):
            f = downsample_mean(fixed, shrink)
            m = downsample_mean(moving, shrink)
            # keep at least ~4k samples so coarse levels don't starve the
            # 32x32 joint histogram
            stride = cfg.sample_stride if f.size // cfg.sample_stride >= 4096 else 1
            params, final_loss = _optimize_level(
                f,
                m,
                fsp * shrink,
                msp * shrink,
                params,
                center,
                mode=mode,
                iters=int(iters),
                lr=float(cfg.lr) if mode == "rigid" else float(cfg.lr) * 0.5,
                metric=cfg.metric,
                mi_bins=cfg.mi_bins,
                lncc_radius=cfg.lncc_radius,
                sample_stride=int(stride),
            )
        if mode == "rigid":
            rigid_params = params
        else:
            affine_params = params

    mode = stages[-1]
    params = affine_params if mode == "affine" else rigid_params
    mat = _params_to_matrix(params, center, mode)
    return mat, final_loss


@functools.partial(jax.jit, static_argnames=("cfg",))
def _affine_core_jit(fixed, moving, fsp, msp, cfg: AffineConfig):
    return _affine_core(fixed, moving, fsp, msp, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _affine_core_batch_jit(fixed, moving, fsp, msp, cfg: AffineConfig):
    return jax.vmap(
        lambda f, m: _affine_core(f, m, fsp, msp, cfg)
    )(fixed, moving)


def feasible_affine_cfg(cfg: "AffineConfig", shape):
    """Clamp the pyramid to levels this volume can support (min dim 8) —
    the one shared policy for the class path and the mesh path."""
    import dataclasses

    shr, its = feasible_levels(cfg.shrinks, cfg.iters, shape)
    return dataclasses.replace(cfg, shrinks=tuple(shr), iters=tuple(its))


_hashable_cfg = feasible_affine_cfg  # internal callers' historical name


def register_affine(
    fixed,
    moving,
    fixed_spacing=(1.0, 1.0, 1.0),
    moving_spacing=(1.0, 1.0, 1.0),
    cfg: AffineConfig = None,
):
    """Returns (matrix 3x4 numpy, final_loss): fixed phys -> moving phys."""
    cfg = _hashable_cfg(cfg or AffineConfig(), fixed.shape)
    mat, loss = _affine_core_jit(
        jnp.asarray(fixed, jnp.float32),
        jnp.asarray(moving, jnp.float32),
        jnp.asarray(fixed_spacing, jnp.float32),
        jnp.asarray(moving_spacing, jnp.float32),
        cfg,
    )
    return np.asarray(mat), float(loss)


def register_affine_batch(
    fixed_stack,
    moving_stack,
    fixed_spacing=(1.0, 1.0, 1.0),
    moving_spacing=(1.0, 1.0, 1.0),
    cfg: AffineConfig = None,
):
    """Register B (fixed, moving) pairs simultaneously in ONE device program
    (vmap of the full pyramid) — the TPU answer to the reference's 4-process
    pool over the |refs| x |train| pair list (ANTs_group_registration.py:272).
    All pairs share the given spacings (group tasks by shape+spacing).
    Returns (matrices [B,3,4] numpy, losses [B])."""
    cfg = _hashable_cfg(cfg or AffineConfig(), fixed_stack.shape[1:])
    mats, losses = _affine_core_batch_jit(
        jnp.asarray(fixed_stack, jnp.float32),
        jnp.asarray(moving_stack, jnp.float32),
        jnp.asarray(fixed_spacing, jnp.float32),
        jnp.asarray(moving_spacing, jnp.float32),
        cfg,
    )
    return np.asarray(mats), np.asarray(losses)


def apply_affine(
    moving, matrix, fixed_shape, fixed_spacing, moving_spacing, order=1
):
    """Resample any volume (image order=1 / label order=0) through a saved
    affine — the antsApplyTransforms role (ANTs_group_registration.py:121-135)."""
    return resample_moving(
        jnp.asarray(moving, jnp.float32),
        jnp.asarray(matrix, jnp.float32),
        tuple(fixed_shape),
        tuple(fixed_spacing),
        tuple(moving_spacing),
        order=order,
    )


def invert_affine(matrix) -> np.ndarray:
    m = np.eye(4)
    m[:3, :] = np.asarray(matrix)
    inv = np.linalg.inv(m)
    return inv[:3, :]
