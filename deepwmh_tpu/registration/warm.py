"""SVF warm start: seed each pair's deformable stage from the composition
of already-registered pairs (docs/ROADMAP.md item "SVF warm start").

In all-pairs group registration (S healthy references x T subjects,
deepwmh/external_tools/ANTs_group_registration.py:220-273 semantics) every
target t is registered S times from scratch. With an anchor source s0, the
pairs (s0, t) and the S-1 auxiliary pairs (s_i, s0) together determine a
composed estimate of every remaining pair (s_i, t):

  T_{i,t}(x) = T_{i,0}( T_{0,t}(x) )

and the SVF optimizer only has to refine that estimate instead of solving
from zero — a shortened schedule (warm_schedule) at full quality
(tests/test_warm_start.py gates the non-circular label-overlap benchmark
for the warm path; docs/PERF.md "SVF warm start" carries the measured
study: label-overlap Dice EQUAL to cold, 0.9303 vs 0.9313, but NO
end-to-end throughput win on a tunnel-attached chip — production pairs
are host/wire-bound, so the shortened device schedule saves little while
the anchor/aux rows add full-budget pairs; 0.77x at 3x3, 0.85-0.90x
projected at scale. Hence OPT-IN and outside the auto policy.)

The composed displacement is converted to an initial VELOCITY first-order
(exp(v) ~= v for smooth post-affine fields — the same approximation the
production exp gradient already relies on, svf.py
scaling_and_squaring_approx_grad), resized to the coarsest pyramid level
by _svf_core.

Conventions match registration/group.py artifacts: a pair's `matrix` maps
FIXED physical -> MOVING physical, its `warp` is a voxel-unit displacement
on the fixed grid applied BEFORE the affine (ops/warp.apply_affine_svf).
OPT-IN: GroupRegistration(warm_start=True) / --svf-warm-start; the default
cold path is bit-identical to before.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from deepwmh_tpu.ops.warp import identity_grid, sample_channels
from deepwmh_tpu.registration.affine import _affine_core, resample_moving
from deepwmh_tpu.registration.svf import _svf_core, apply_affine_svf


def warm_schedule(cfg, frac: float = 0.4, floor: int = 20):
    """Shortened per-level iteration schedule for warm-started pairs.

    The warm init already carries the large-scale alignment the coarse
    levels exist to find; at frac=0.4 the measured study (docs/PERF.md
    "SVF warm start") finds label-overlap quality equal to the cold
    schedule (0.9303 vs 0.9313) — the speed side of that study is a
    negative result, see the module docstring."""
    return dataclasses.replace(
        cfg, iters=tuple(max(floor, int(round(i * frac))) for i in cfg.iters)
    )


def compose_pair_displacement(
    d0t, di0, mat0t, mati0, mat_it, sp_t, sp_s0, t_shape
):
    """Displacement (voxel units, t grid, pre-affine convention) of the
    COMPOSED map T_{i,0} o T_{0,t} expressed against the pair's own affine
    mat_it — i.e. the d such that  mat_it o (x + d(x))  lands where the
    composition lands.

      x (t vox) --d0t,mat0t--> y (s0 vox) --di0,mati0--> r (s_i phys)
      d(x) = mat_it^{-1}(r) / sp_t - x

    One fused gather chain; jit-traceable.
    """
    t_shape = tuple(int(s) for s in t_shape)
    grid = identity_grid(t_shape)  # [3, Dt, Ht, Wt]
    sp_t = jnp.asarray(sp_t, jnp.float32).reshape(3, 1)
    sp_s0 = jnp.asarray(sp_s0, jnp.float32).reshape(3, 1)
    A0t, b0t = mat0t[:, :3], mat0t[:, 3]
    Ai0, bi0 = mati0[:, :3], mati0[:, 3]
    Ait, bit = mat_it[:, :3], mat_it[:, 3]

    x = (grid + d0t).reshape(3, -1)  # t vox, warped
    p = x * sp_t  # t phys
    y_phys = A0t @ p + b0t[:, None]  # s0 phys
    y = y_phys / sp_s0  # s0 vox
    y = y.reshape((3,) + t_shape)
    z = y + sample_channels(di0, y)  # s0 vox, warped
    q = z.reshape(3, -1) * sp_s0  # s0 phys
    r = Ai0 @ q + bi0[:, None]  # s_i phys
    # express against mat_it: x'' = Ait^{-1} (r - bit) / sp_t
    x2 = jnp.linalg.solve(Ait, r - bit[:, None]) / sp_t
    return x2.reshape((3,) + t_shape) - grid


def _warm_pair_core(
    fixed, moving, fsp, msp, d0t, di0, mat0t, mati0, sp_s0, acfg, scfg
):
    """One WARM pair end-to-end on device: fresh affine pyramid (cheap and
    independent — a composed-affine init could inherit an anchor failure),
    composed displacement -> first-order velocity seed -> shortened SVF,
    final fused [affine, warp] resample. Same output tuple layout as
    group._pair_core."""
    fixed = fixed.astype(jnp.float32)
    moving = moving.astype(jnp.float32)
    mat, aff_loss = _affine_core(fixed, moving, fsp, msp, acfg)
    moving_on_fixed = resample_moving(moving, mat, fixed.shape, fsp, msp, order=1)
    v0 = compose_pair_displacement(
        d0t.astype(jnp.float32), di0.astype(jnp.float32),
        mat0t, mati0, mat, fsp, sp_s0, fixed.shape,
    )
    # outside the head the anchor/aux/pair affines disagree freely (zero
    # image gradient -> nothing pinned them); clip the seed to the
    # large-deformation scale so a wild background vector can't start the
    # optimizer in an unrecoverable fold
    v0 = jnp.clip(v0, -24.0, 24.0)
    disp, svf_loss = _svf_core(fixed, moving_on_fixed, scfg, v0=v0)
    warped = apply_affine_svf(moving, mat, disp, fixed.shape, fsp, msp, order=1)
    return mat, aff_loss, disp.astype(jnp.float16), svf_loss, warped.astype(
        jnp.float16
    )


@functools.partial(jax.jit, static_argnames=("acfg", "scfg"))
def warm_pair_core_jit(
    fixed, moving, fsp, msp, d0t, di0, mat0t, mati0, sp_s0, acfg, scfg
):
    return _warm_pair_core(
        fixed, moving, fsp, msp, d0t, di0, mat0t, mati0, sp_s0, acfg, scfg
    )
