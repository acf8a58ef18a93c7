"""Pallas TPU kernels for hot volume ops.

median3x3x3: tiles the volume over a z-grid, reads three overlapping padded
slabs per program (separate BlockSpecs with shifted index maps), forms the
27 in-plane shifts inside VMEM and reduces them with an odd-even
compare-exchange network (Pallas TPU has no sort lowering).

MEASURED VERDICT (v5e, 64x128x128 f32): the XLA window-stack median runs in
~0.1 ms steady-state — the volumes in this pipeline are small enough that
HBM traffic is a non-issue and XLA's fused sort wins; the Pallas version
pays per-program dispatch overhead plus a ~4.5-minute Mosaic compile of the
351-op unrolled network. Production paths therefore use the lax
implementation (`median3` dispatches to it); this kernel is kept as a
correct, tested reference for when volumes grow past VMEM-relevant sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _median27(windows):
    """Median of 27 same-shaped arrays via an odd-even transposition sorting
    network — Pallas TPU has no sort lowering, but min/max compare-exchanges
    are native VPU ops. 27 passes guarantee full sorting; element 13 is the
    median."""
    w = list(windows)
    n = len(w)
    for pass_idx in range(n):
        start = pass_idx % 2
        for i in range(start, n - 1, 2):
            lo = jnp.minimum(w[i], w[i + 1])
            hi = jnp.maximum(w[i], w[i + 1])
            w[i], w[i + 1] = lo, hi
    return w[n // 2]


def _median3_kernel(zm1_ref, z0_ref, zp1_ref, out_ref):
    """Each program: one z-slice. Inputs are padded [1, H+2, W+2] slabs for
    z-1, z, z+1 (zero padding already applied by the caller)."""
    H = out_ref.shape[1]
    W = out_ref.shape[2]
    windows = []
    for ref in (zm1_ref, z0_ref, zp1_ref):
        slab = ref[0]
        for dy in range(3):
            for dx in range(3):
                windows.append(slab[dy : dy + H, dx : dx + W])
    med = _median27(windows)
    out_ref[0] = med.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def median3_pallas(vol, interpret: bool = False):
    """3x3x3 median with constant-0 boundary on [D,H,W] float32."""
    vol = vol.astype(jnp.float32)
    D, H, W = vol.shape
    padded = jnp.pad(vol, ((1, 1), (1, 1), (1, 1)))

    def slab_spec(dz):
        return pl.BlockSpec(
            (1, H + 2, W + 2),
            index_map=lambda z: (z + dz, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        _median3_kernel,
        out_shape=jax.ShapeDtypeStruct((D, H, W), jnp.float32),
        grid=(D,),
        in_specs=[slab_spec(0), slab_spec(1), slab_spec(2)],
        out_specs=pl.BlockSpec(
            (1, H, W), index_map=lambda z: (z, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padded, padded, padded)


def median3(vol):
    """3x3x3 median. Dispatches to the lax window-stack implementation —
    measured faster than the Pallas kernel at pipeline volume sizes (see
    module docstring)."""
    from deepwmh_tpu.ops.filters import median_filter

    return median_filter(vol, 3)


# --------------------------------------------------------------------- #
# Fused instance-norm statistics
#
# The inference sweep's instance-norm statistics are XLA convert_reduce
# fusions reading the full-resolution bf16 activation (0.53 GB at bench
# shape) at ~120 GB/s — ~16 ms/flip, the cheapest slice of the measured
# ~25% non-conv sweep overhead (docs/PERF.md). This kernel computes the
# SAME two moments in one bf16-rate pass: the [*, C] activation is viewed
# as [M/fold, fold*C=128] (a free row-major reshape — C=32 fills only a
# quarter of the 128-lane VPU/tile width; folding four consecutive voxels
# into the lane dimension uses all of it), blocks of rows are reduced to
# f32 (sum, sum-of-squares) partials on the VPU, and the sequential TPU
# grid accumulates them into one resident output block. The host folds
# the `fold` interleaved channel copies and forms mean/var exactly like
# flax's GroupNorm(group_size=1) fast-variance path: var = E[x^2]-E[x]^2.
# --------------------------------------------------------------------- #


def _inorm_stats_kernel(x_ref, out_ref, *, m4: int, block_rows: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    blk = x_ref[0].astype(jnp.float32)  # [block_rows, 128]
    # final block may overrun M/fold: garbage rows are zeroed, count uses
    # the true element count host-side
    rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0) + i * block_rows
    blk = jnp.where(rows < m4, blk, 0.0)
    out_ref[0, 0, :] += jnp.sum(blk, axis=0)
    out_ref[0, 1, :] += jnp.sum(blk * blk, axis=0)


def instance_norm_stats_pallas(x, block_rows: int = 2048,
                               interpret: bool = False):
    """Per-(sample, channel) mean/variance of a channels-last activation.

    x: [N, ...spatial..., C] with 128 % C == 0 and prod(spatial) % fold
    == 0 (fold = 128//C) — the shapes the U-Net's full-resolution stages
    produce. Returns (mean, var) f32 [N, C], numerically the statistics
    flax.linen.GroupNorm(group_size=1) computes (fast-variance form).
    Raises ValueError for shapes outside the contract (callers fall back
    to the XLA reduction)."""
    N = x.shape[0]
    C = x.shape[-1]
    spatial = 1
    for s in x.shape[1:-1]:
        spatial *= int(s)
    if C > 128 or 128 % C:
        raise ValueError("C must divide 128, got %d" % C)
    fold = 128 // C
    if spatial % fold:
        raise ValueError("prod(spatial)=%d not divisible by fold=%d"
                         % (spatial, fold))
    m4 = spatial // fold
    x4 = x.reshape(N, m4, 128)

    grid = (N, pl.cdiv(m4, block_rows))
    out = pl.pallas_call(
        functools.partial(_inorm_stats_kernel, m4=m4, block_rows=block_rows),
        out_shape=jax.ShapeDtypeStruct((N, 8, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_rows, 128),
                index_map=lambda n, i: (n, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128),
            index_map=lambda n, i: (n, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x4)

    s = out[:, 0, :].reshape(N, fold, C).sum(axis=1)
    s2 = out[:, 1, :].reshape(N, fold, C).sum(axis=1)
    inv_n = 1.0 / float(spatial)
    mean = s * inv_n
    var = s2 * inv_n - mean * mean
    return mean, var
