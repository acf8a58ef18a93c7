"""Halo-sharded whole-volume ops over a device mesh.

SURVEY.md §5's "long-context" equivalent for this framework: when a volume
exceeds one chip's HBM (or when minimum latency matters), whole-volume ops
run spatially sharded — the volume is split along its leading axis across
the mesh, each device processes its slab, and window ops exchange `halo`
boundary rows with neighbors over ICI via `jax.lax.ppermute` inside
`shard_map`.

Exactness: the single-device ops in ops/filters.py use zero ('constant',
cval=0) window padding. `ppermute` fills slots with no source (the first /
last device's outer halo) with ZEROS — precisely that boundary condition —
so sharded results are bit-identical to the unsharded ops. Volumes whose
leading axis doesn't divide the mesh are zero-padded and cropped; global
statistics carry an explicit validity weight so padding never contaminates
moments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def _pad_rows(x, multiple):
    pad = (-x.shape[0]) % multiple
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x, pad


def halo_pad_local(x_local, halo, axis_name, n_shards):
    """Extend a local slab with `halo` rows from each neighbor over ICI.
    Devices at the volume boundary receive zeros (ppermute's no-source
    fill), matching the zero window padding of the single-device ops."""
    if halo <= 0:
        return x_local
    assert halo <= x_local.shape[0], (
        "halo %d exceeds the local shard depth %d — use fewer shards for "
        "this volume" % (halo, x_local.shape[0])
    )
    top = x_local[:halo]
    bot = x_local[-halo:]
    fwd = [(i, i + 1) for i in range(n_shards - 1)]  # my bottom -> next's top
    bwd = [(i + 1, i) for i in range(n_shards - 1)]  # my top -> prev's bottom
    from_prev = jax.lax.ppermute(bot, axis_name, fwd)
    from_next = jax.lax.ppermute(top, axis_name, bwd)
    return jnp.concatenate([from_prev, x_local, from_next], axis=0)


class HaloShardedOps:
    """Whole-volume ops sharded along the leading axis of a [D,H,W] volume.

    map_overlap(fn, halo) is the general primitive: fn runs on each
    halo-extended local slab and the halos are cropped from its output.
    The named ops wrap ops/filters.py kernels through it.
    """

    def __init__(self, mesh: Mesh, axis_name: str = None):
        self.mesh = mesh
        self.axis = axis_name or mesh.axis_names[0]
        self.n = int(mesh.shape[self.axis])
        self._compiled = {}

    # -- core primitive ---------------------------------------------------

    def _sharded(self, x):
        return jax.device_put(
            x, NamedSharding(self.mesh, P(self.axis))
        )

    def map_overlap(self, fn, x, halo: int, cache_key=None):
        """Apply fn([D'+2*halo, H, W]) -> same shape, sharded over the
        mesh; returns the assembled [D, H, W] result.

        cache_key: hashable identity of fn for program reuse. A raw
        callable (or a fresh functools.partial, which hashes by object
        identity) would NEVER hit the cache while still being stored —
        unbounded compile accumulation — so without a key the program is
        built fresh and NOT cached."""
        x = jnp.asarray(x, jnp.float32)
        d0 = x.shape[0]
        x, _pad = _pad_rows(x, self.n)
        key = None if cache_key is None else (
            "map_overlap", cache_key, halo, x.shape
        )
        prog = self._compiled.get(key) if key is not None else None
        if prog is None:
            axis, n = self.axis, self.n

            def local(xl):
                xx = halo_pad_local(xl, halo, axis, n)
                y = fn(xx)
                return y[halo : y.shape[0] - halo] if halo else y

            prog = jax.jit(
                jax.shard_map(
                    local, mesh=self.mesh, in_specs=P(axis), out_specs=P(axis)
                )
            )
            if key is not None:
                self._compiled[key] = prog
        out = prog(self._sharded(x))
        return out[:d0]

    # -- window filters (exact parity with ops/filters.py) -----------------

    def median_filter(self, x, kernel_size):
        from deepwmh_tpu.ops.filters import _norm_ksize, median_filter

        ks = _norm_ksize(kernel_size, np.ndim(x))
        return self.map_overlap(
            functools.partial(median_filter, kernel_size=tuple(ks)),
            x, halo=max(ks[0] // 2, 1), cache_key=("median_filter", tuple(ks)),
        )

    def mean_filter(self, x, kernel_size):
        from deepwmh_tpu.ops.filters import _norm_ksize, mean_filter

        ks = _norm_ksize(kernel_size, np.ndim(x))
        return self.map_overlap(
            functools.partial(mean_filter, kernel_size=tuple(ks)),
            x, halo=max(ks[0] // 2, 1), cache_key=("mean_filter", tuple(ks)),
        )

    def min_filter(self, x, kernel_size):
        from deepwmh_tpu.ops.filters import _norm_ksize, min_filter

        ks = _norm_ksize(kernel_size, np.ndim(x))
        return self.map_overlap(
            functools.partial(min_filter, kernel_size=tuple(ks)),
            x, halo=max(ks[0] // 2, 1), cache_key=("min_filter", tuple(ks)),
        )

    def max_filter(self, x, kernel_size):
        from deepwmh_tpu.ops.filters import _norm_ksize, max_filter

        ks = _norm_ksize(kernel_size, np.ndim(x))
        return self.map_overlap(
            functools.partial(max_filter, kernel_size=tuple(ks)),
            x, halo=max(ks[0] // 2, 1), cache_key=("max_filter", tuple(ks)),
        )

    # -- global statistics (psum over ICI) ---------------------------------

    def z_score(self, x, mask=None):
        """Global masked z-score: per-shard partial sums merged with psum,
        matching ops.stats.z_score on the full volume."""
        x = jnp.asarray(x, jnp.float32)
        d0 = x.shape[0]
        xp, pad = _pad_rows(x, self.n)
        valid = jnp.ones_like(x)
        if mask is not None:
            valid = valid * (jnp.asarray(mask, jnp.float32) > 0.5)
        validp, _ = _pad_rows(valid, self.n)  # padded rows weigh 0

        key = ("z_score", xp.shape)
        if key not in self._compiled:
            axis = self.axis

            from deepwmh_tpu.ops.stats import EPS_STD

            def local(xl, wl):
                # identical formula to ops.stats.z_score (count clamp 1.0,
                # population std, EPS_STD floor), with psum-merged moments
                s = jax.lax.psum(jnp.sum(xl * wl), axis)
                n = jnp.maximum(jax.lax.psum(jnp.sum(wl), axis), 1.0)
                mu = s / n
                var = jax.lax.psum(jnp.sum(wl * (xl - mu) ** 2), axis) / n
                std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)), EPS_STD)
                return (xl - mu) / std

            self._compiled[key] = jax.jit(
                jax.shard_map(
                    local, mesh=self.mesh,
                    in_specs=(P(axis), P(axis)), out_specs=P(axis),
                )
            )
        out = self._compiled[key](self._sharded(xp), self._sharded(validp))
        return out[:d0]
