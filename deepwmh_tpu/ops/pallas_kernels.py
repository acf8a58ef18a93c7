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
