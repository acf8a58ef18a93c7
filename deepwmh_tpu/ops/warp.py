"""Spatial resampling / warping ops.

TPU-native replacement for ANTs `antsApplyTransforms`
(reference: deepwmh/external_tools/ANTs_group_registration.py:121-135,
deepwmh/main/train.py:56-60): trilinear / nearest resampling of a volume
through affine transforms and dense displacement fields, expressed as
map_coordinates gathers that XLA fuses with surrounding math. Also powers
the on-device rotation/scaling training augmentations and the registration
module's transform composition.

Conventions: volumes are [D,H,W]; coordinates are voxel-space; an affine is
a 3x4 matrix mapping OUTPUT voxel coords -> INPUT voxel coords
(pull-back/resampling convention). Displacement fields are [3,D,H,W] voxel
offsets added to the identity grid.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def identity_grid(shape):
    """[3, D, H, W] voxel coordinate grid."""
    ranges = [jnp.arange(s, dtype=jnp.float32) for s in shape]
    grids = jnp.meshgrid(*ranges, indexing="ij")
    return jnp.stack(grids)


def sample_volume(vol, coords, order: int = 1, cval: float = 0.0):
    """Sample `vol` [D,H,W] at `coords` [3, ...]; order 0=nearest 1=trilinear,
    constant extrapolation with `cval`."""
    return map_coordinates(
        vol.astype(jnp.float32),
        [coords[0], coords[1], coords[2]],
        order=order,
        mode="constant",
        cval=cval,
    )


def sample_channels(vols, coords, cval: float = 0.0):
    """Trilinearly sample C volumes [C,D,H,W] at SHARED coords [3, ...].

    Floor indices and trilinear weights are computed once and each of the 8
    corners is a single take() on the flattened [C, D*H*W] layout — ~8
    gathers total for all channels instead of 8 per channel per call. This
    is the hot sampler inside velocity-field scaling-and-squaring (3-channel
    fields resampled 2^K times per optimizer step)."""
    vols = vols.astype(jnp.float32)
    c = vols.shape[0]
    d, h, w = vols.shape[1:]
    out_shape = coords.shape[1:]
    cf = coords.reshape(3, -1)
    i0 = jnp.floor(cf).astype(jnp.int32)
    f = cf - i0.astype(jnp.float32)

    flat = vols.reshape(c, -1)
    sizes = (d, h, w)
    out = jnp.zeros((c, cf.shape[1]), jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                off = (dz, dy, dx)
                idx = [i0[i] + off[i] for i in range(3)]
                valid = (
                    (idx[0] >= 0) & (idx[0] < d)
                    & (idx[1] >= 0) & (idx[1] < h)
                    & (idx[2] >= 0) & (idx[2] < w)
                )
                ic = [jnp.clip(idx[i], 0, sizes[i] - 1) for i in range(3)]
                lin = (ic[0] * h + ic[1]) * w + ic[2]
                wgt = (
                    (f[0] if dz else 1.0 - f[0])
                    * (f[1] if dy else 1.0 - f[1])
                    * (f[2] if dx else 1.0 - f[2])
                )
                vals = jnp.where(valid[None, :], flat[:, lin], cval)
                out = out + wgt[None, :] * vals
    return out.reshape((c,) + tuple(out_shape))


def affine_warp(vol, matrix, out_shape=None, order: int = 1, cval: float = 0.0, center=None):
    """Resample `vol` through a 3x4 (or 4x4) affine.

    For output voxel o: input coord = A @ o + t. If `center` is given the
    transform is applied about that point (rotation/scaling augmentations):
    input = A @ (o - c) + c + t.
    """
    matrix = jnp.asarray(matrix, jnp.float32)
    if matrix.shape == (4, 4):
        matrix = matrix[:3, :]
    A, t = matrix[:, :3], matrix[:, 3]
    shape = out_shape or vol.shape
    grid = identity_grid(shape).reshape(3, -1)  # [3, N]
    if center is not None:
        c = jnp.asarray(center, jnp.float32).reshape(3, 1)
        coords = A @ (grid - c) + c.reshape(3, 1) + t[:, None]
    else:
        coords = A @ grid + t[:, None]
    coords = coords.reshape((3,) + tuple(shape))
    return sample_volume(vol, coords, order=order, cval=cval)


def displacement_warp(vol, disp, order: int = 1, cval: float = 0.0):
    """Resample through a dense displacement field `disp` [3,D,H,W] (voxel
    offsets): out(o) = vol(o + disp(o))."""
    grid = identity_grid(disp.shape[1:])
    return sample_volume(vol, grid + disp, order=order, cval=cval)


def compose_affine_then_disp(matrix, disp):
    """Pull-back composition used when resampling through [affine, warp] like
    antsApplyTransforms: the output voxel coord is first displaced by the
    warp, then mapped through the affine. Returns coords [3,D,H,W] such that
    sample_volume(vol, coords) applies both transforms in one gather."""
    grid = identity_grid(disp.shape[1:])
    warped = grid + disp
    matrix = jnp.asarray(matrix, jnp.float32)
    if matrix.shape == (4, 4):
        matrix = matrix[:3, :]
    A, t = matrix[:, :3], matrix[:, 3]
    flat = warped.reshape(3, -1)
    out = A @ flat + t[:, None]
    return out.reshape(warped.shape)


def compose_disp(disp_outer, disp_inner):
    """Compose two displacement fields: result(o) = d_inner(o) +
    d_outer(o + d_inner(o)) so warping once by the result equals warping by
    inner then outer."""
    grid = identity_grid(disp_inner.shape[1:])
    coords = grid + disp_inner
    moved = sample_channels(disp_outer, coords)
    return disp_inner + moved


def rotation_matrix(angles):
    """3D rotation matrix from per-axis angles (radians), R = Rx @ Ry @ Rz."""
    ax, ay, az = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rx @ Ry @ Rz
