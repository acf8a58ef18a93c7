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

    def _window_filter(self, fn_name: str, x, kernel_size):
        """Shared halo rule for all four rank/box filters: one kernel-half
        halo along the sharded axis, the local op applied verbatim."""
        from deepwmh_tpu.ops import filters

        ks = filters._norm_ksize(kernel_size, np.ndim(x))
        fn = getattr(filters, fn_name)
        return self.map_overlap(
            functools.partial(fn, kernel_size=tuple(ks)),
            x, halo=max(ks[0] // 2, 1), cache_key=(fn_name, tuple(ks)),
        )

    def median_filter(self, x, kernel_size):
        return self._window_filter("median_filter", x, kernel_size)

    def mean_filter(self, x, kernel_size):
        return self._window_filter("mean_filter", x, kernel_size)

    def min_filter(self, x, kernel_size):
        return self._window_filter("min_filter", x, kernel_size)

    def max_filter(self, x, kernel_size):
        return self._window_filter("max_filter", x, kernel_size)

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

    # -- mean_std_grid (the SURVEY §5 50 mm alignment grid) -----------------

    def mean_std_grid(self, data, patch_size, mask=None, order: int = 1):
        """Sharded ops.grid.mean_std_grid: per-shard cell statistics, the
        (tiny) global patch grid assembled with all_gather over ICI, and
        each device interpolating ONLY its own output rows with
        global-coordinate gathers — so the full-resolution [D,H,W] arrays
        never materialize on one device. Matches the single-device op to
        float-reassociation tolerance.

        Design note: the patch grid at 50 mm cells is ~10^3 elements for a
        10^7-voxel volume — gathering it costs nothing, and replicating the
        grid math keeps every device's interpolation EXACTLY the global
        formula (a per-shard endpoint-aligned resize would drift by up to a
        cell at the far end)."""
        import math

        from deepwmh_tpu.ops.grid import (
            _linear_resize_axis,
            _nearest_resize_axis,
            _shift_add,
        )

        data = jnp.asarray(data, jnp.float32)
        shape = data.shape
        p = [2 * int(math.ceil(s / 2)) for s in patch_size]
        step = [pi // 2 for pi in p]
        padded = [pi * int(math.ceil(sh / pi)) for pi, sh in zip(p, shape)]
        G = [padded[i] // step[i] for i in range(3)]

        n = self.n
        cps = int(math.ceil(G[0] / n))  # cells per shard along axis 0
        rows_per_shard = cps * step[0]
        total_rows = n * rows_per_shard

        pad_width = [(0, total_rows - shape[0]),
                     (0, padded[1] - shape[1]),
                     (0, padded[2] - shape[2])]
        dpad = jnp.pad(data, pad_width)
        if mask is not None:
            mpad = jnp.pad((jnp.asarray(mask) > 0.5).astype(jnp.float32),
                           pad_width)
        else:
            mpad = jnp.ones_like(dpad)

        key = ("mean_std_grid", dpad.shape, tuple(p), mask is None, order,
               shape)
        if key not in self._compiled:
            axis = self.axis
            G0, G1, G2 = G
            s0, s1, s2 = step
            has_mask = mask is not None

            def local(xl, ml):
                # per-shard cell sums [cps, G1, G2]
                view = (xl * ml).reshape(cps, s0, G1, s1, G2, s2)
                mview = ml.reshape(cps, s0, G1, s1, G2, s2)
                c_sum = view.sum(axis=(1, 3, 5))
                c_sq = jnp.square(view).sum(axis=(1, 3, 5))
                c_cnt = mview.sum(axis=(1, 3, 5))
                # the global grid is tiny: gather it everywhere
                gath = lambda a: jax.lax.all_gather(a, axis).reshape(
                    n * cps, G1, G2
                )[:G0]
                psum, psq, pcnt = gath(c_sum), gath(c_sq), gath(c_cnt)
                if not has_mask:
                    # padded tail rows (beyond the single-device padded
                    # extent) belong to dummy cells already sliced off;
                    # within the grid the count is the full patch volume
                    pcnt = jnp.full((G0, G1, G2), float(s0 * s1 * s2),
                                    jnp.float32)
                for ax in range(3):
                    psum = _shift_add(psum, ax)
                    psq = _shift_add(psq, ax)
                    pcnt = _shift_add(pcnt, ax)
                cnt_safe = jnp.maximum(pcnt, 1.0)
                mu = psum / cnt_safe
                var = psq / cnt_safe - jnp.square(mu)
                sigma = jnp.sqrt(jnp.maximum(var, 0.0))
                if has_mask:
                    empty = pcnt < 0.5
                    mu = jnp.where(empty, 0.0, mu)
                    sigma = jnp.where(empty, 1e-5, sigma)
                else:
                    sigma = jnp.maximum(sigma, 1e-5)

                def upsample(grid):
                    out = jnp.pad(grid, [(1, 1)] * 3)
                    # H/W axes: the exact single-device resize + crop
                    for ax, (Ga, sa, sh) in enumerate(
                        [(G1, s1, shape[1]), (G2, s2, shape[2])], start=1
                    ):
                        n_out = (Ga + 2) * sa
                        if order == 0:
                            out = _nearest_resize_axis(out, ax, n_out)
                        else:
                            out = _linear_resize_axis(out, ax, n_out)
                        off = sa // 2
                        out = jax.lax.slice_in_dim(out, off, off + Ga * sa,
                                                   axis=ax)
                        out = jax.lax.slice_in_dim(out, 0, sh, axis=ax)
                    # D axis: global-coordinate interpolation of THIS
                    # shard's output rows (upsampled index u = r + s0//2)
                    n_in = G0 + 2
                    n_up = (G0 + 2) * s0
                    me = jax.lax.axis_index(axis)
                    r = me * rows_per_shard + jnp.arange(
                        rows_per_shard, dtype=jnp.float32
                    )
                    u = r + (s0 // 2)
                    x = u * ((n_in - 1) / max(n_up - 1, 1))
                    if order == 0:
                        idx = jnp.clip(
                            jnp.floor(x + 0.5).astype(jnp.int32), 0, n_in - 1
                        )
                        return jnp.take(out, idx, axis=0)
                    lo = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n_in - 2)
                    w = (x - lo.astype(jnp.float32))[:, None, None]
                    return (jnp.take(out, lo, axis=0) * (1 - w)
                            + jnp.take(out, lo + 1, axis=0) * w)

                return upsample(mu), upsample(sigma)

            self._compiled[key] = jax.jit(
                jax.shard_map(
                    local, mesh=self.mesh,
                    in_specs=(P(axis), P(axis)),
                    out_specs=(P(axis), P(axis)),
                )
            )
        mu, sigma = self._compiled[key](self._sharded(dpad), self._sharded(mpad))
        return mu[: shape[0]], sigma[: shape[0]]

    # -- N4 bias correction (the SURVEY §5 big program) ---------------------

    def n4_bias_correction(self, data, mask=None, shrink: int = 2,
                           levels: int = 3, iters_per_level: int = 50,
                           base_control: int = 1, return_bias: bool = False):
        """Slab-sharded ops.n4.n4_bias_correction for volumes above one
        chip's HBM: every full-resolution array lives sharded along axis 0;
        only the (tiny) histogram and B-spline control lattice are global —
        the histogram is psum-merged over ICI, the control-cell sums are
        psum-merged, and each device evaluates the smooth field / final
        upsample ONLY for its own rows with global-coordinate gathers.

        The knot geometry and upsample endpoint alignment follow the
        single-device padded extents, so results match the single-device
        op to float tolerance (tests assert <1e-3 relative); the one
        remaining semantic difference is that the histogram subsample
        (every 4th voxel) is taken per shard instead of globally."""
        import math

        from deepwmh_tpu.ops.n4 import (
            NBINS,
            _cubic_bspline_weights,
            _sharpen,
        )

        data = jnp.asarray(data, jnp.float32)
        shape = data.shape
        if mask is None:
            mask_full = (data > 0).astype(jnp.float32)
        else:
            mask_full = (jnp.asarray(mask) > 0.5).astype(jnp.float32)

        n = self.n
        # per-shard rows divisible by shrink so the shrink view is local
        unit = n * shrink
        total_rows = int(math.ceil(shape[0] / unit) * unit)
        pad_width = [(0, total_rows - shape[0]), (0, (-shape[1]) % shrink),
                     (0, (-shape[2]) % shrink)]
        dpad = jnp.pad(data, pad_width)
        mpad = jnp.pad(mask_full, pad_width)
        Dp, Hp, Wp = dpad.shape
        Ds, Hs, Ws = Dp // shrink, Hp // shrink, Wp // shrink
        rows_small = Ds // n
        # knot/cell geometry follows the SINGLE-DEVICE padded depth, so the
        # shard-alignment padding does not move the control lattice: beyond
        # Dp_ref every voxel is mask-0 padding and never contributes
        Dp_ref = shape[0] + (-shape[0]) % shrink
        Ds_ref = Dp_ref // shrink

        key = ("n4", dpad.shape, shrink, levels, iters_per_level,
               base_control, shape)
        if key not in self._compiled:
            axis = self.axis

            def ctrl_field_local(residual, msk, n_c, me):
                """One level's smooth-field update for the LOCAL small slab:
                psum-merged masked cell averages + cubic B-spline evaluated
                at this shard's global rows. n_c: (n_c0, n_c1, n_c2)."""
                csize = [int(math.ceil(s / c))
                         for s, c in zip((Ds_ref, Hs, Ws), n_c)]
                # pad H/W to cell multiples (local axes are global here)
                ph = csize[1] * n_c[1] - Hs
                pw = csize[2] * n_c[2] - Ws
                r = jnp.pad(residual * msk, ((0, 0), (0, ph), (0, pw)))
                m = jnp.pad(msk, ((0, 0), (0, ph), (0, pw)))
                # reduce H/W into cells
                rv = r.reshape(rows_small, n_c[1], csize[1], n_c[2], csize[2])
                mv = m.reshape(rows_small, n_c[1], csize[1], n_c[2], csize[2])
                r_hw = rv.sum(axis=(2, 4))   # [rows_small, n_c1, n_c2]
                m_hw = mv.sum(axis=(2, 4))
                # scatter local rows into global D cells via one-hot matmul
                grow = me * rows_small + jnp.arange(rows_small)
                cell_of_row = jnp.minimum(grow // csize[0], n_c[0] - 1)
                onehot = (
                    cell_of_row[None, :]
                    == jnp.arange(n_c[0], dtype=jnp.int32)[:, None]
                ).astype(jnp.float32)  # [n_c0, rows_small]
                s_part = jnp.einsum("cr,rab->cab", onehot, r_hw)
                c_part = jnp.einsum("cr,rab->cab", onehot, m_hw)
                s_all = jax.lax.psum(s_part, axis)
                c_all = jax.lax.psum(c_part, axis)
                ctrl = s_all / jnp.maximum(c_all, 1.0)  # [n_c0, n_c1, n_c2]
                # B-spline evaluation: H/W with the exact single-device
                # code; D with global coordinates for this shard's rows
                from deepwmh_tpu.ops.n4 import _bspline_upsample_axis

                out = ctrl
                out = _bspline_upsample_axis(out, 1, Hs)[..., :Hs, :]
                out = _bspline_upsample_axis(out, 2, Ws)
                n_c0 = n_c[0]
                if n_c0 == 1:
                    return jnp.broadcast_to(out[0], (rows_small, Hs, Ws))
                x = (me * rows_small + jnp.arange(rows_small, dtype=jnp.float32)
                     ) * ((n_c0 - 1) / max(Ds_ref - 1, 1))
                k = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n_c0 - 2)
                t = x - k.astype(jnp.float32)
                w0, w1, w2, w3 = _cubic_bspline_weights(t)
                acc = 0.0
                for w, d in zip((w0, w1, w2, w3), (-1, 0, 1, 2)):
                    idx = jnp.clip(k + d, 0, n_c0 - 1)
                    acc = acc + w[:, None, None] * jnp.take(out, idx, axis=0)
                return acc

            def lerp_rows_local(small, n_out_rows, me):
                """Linear upsample of the local small slab's D axis to this
                shard's full-res rows, with global endpoint alignment. The
                interpolation support spills one row past either slab edge
                (the global scale is slightly below 1/shrink), so both
                neighbors contribute one halo row; boundary shards receive
                ppermute's zero fill there, which the index clamp keeps
                unread."""
                prv = jax.lax.ppermute(
                    small[-1:], axis, [(i, i + 1) for i in range(n - 1)]
                )
                nxt = jax.lax.ppermute(
                    small[:1], axis, [(i + 1, i) for i in range(n - 1)]
                )
                ext = jnp.concatenate([prv, small, nxt], axis=0)
                r = me * n_out_rows + jnp.arange(n_out_rows, dtype=jnp.float32)
                # endpoint alignment matches the single-device op exactly:
                # it resizes the small field straight to the ORIGINAL depth
                # (rows beyond shape[0] are shard padding, cropped later;
                # their extrapolated values are harmless)
                x = r * ((Ds_ref - 1) / max(shape[0] - 1, 1))
                lo = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Ds_ref - 2)
                w = x - lo.astype(jnp.float32)
                loc = jnp.clip(lo - me * rows_small + 1, 0, rows_small)
                a = jnp.take(ext, loc, axis=0)
                b = jnp.take(ext, loc + 1, axis=0)
                return a * (1 - w[:, None, None]) + b * w[:, None, None]

            def local(xl, ml):
                me = jax.lax.axis_index(axis)
                # local shrink
                s = shrink
                small = xl.reshape(
                    rows_small, s, Hs, s, Ws, s
                ).mean(axis=(1, 3, 5))
                msm = ml.reshape(
                    rows_small, s, Hs, s, Ws, s
                ).mean(axis=(1, 3, 5))
                msm = (msm > 0.5).astype(jnp.float32)
                v0 = jnp.log(jnp.maximum(small, 1e-6)) * msm

                def sharpen_sharded(v, msk):
                    return _sharpen(
                        v, msk,
                        psum_axis=axis,
                    )

                log_bias = jnp.zeros_like(v0)
                for level in range(levels):
                    n_c = tuple(
                        min(base_control * (2 ** level) + 1, sdim)
                        for sdim in (Ds_ref, Hs, Ws)
                    )

                    def body(_, lb, n_c=n_c):
                        v = v0 - lb
                        e = sharpen_sharded(v, msm)
                        residual = (v - e) * msm
                        delta = ctrl_field_local(residual, msm, n_c, me)
                        return lb + delta

                    log_bias = jax.lax.fori_loop(0, iters_per_level, body,
                                                 log_bias)

                # upsample to full res rows (H/W globally local)
                from deepwmh_tpu.ops.grid import _linear_resize_axis

                lb = lerp_rows_local(log_bias, xl.shape[0], me)
                # H/W likewise resize to the ORIGINAL extents (matching the
                # single-device endpoint alignment), then edge-pad to the
                # shrink-padded slab shape; padded columns are mask-0 and
                # cropped, so their bias values never matter
                lb = _linear_resize_axis(lb, 1, shape[1])
                lb = _linear_resize_axis(lb, 2, shape[2])
                lb = jnp.pad(
                    lb,
                    ((0, 0), (0, Hp - shape[1]), (0, Wp - shape[2])),
                    mode="edge",
                )
                # unit geometric mean inside the mask (global psum)
                num = jax.lax.psum(jnp.sum(lb * ml), axis)
                den = jnp.maximum(jax.lax.psum(jnp.sum(ml), axis), 1.0)
                bias = jnp.exp(lb - num / den)
                corrected = xl / jnp.maximum(bias, 1e-6)
                return corrected, bias

            self._compiled[key] = jax.jit(
                jax.shard_map(
                    local, mesh=self.mesh,
                    in_specs=(P(axis), P(axis)),
                    out_specs=(P(axis), P(axis)),
                )
            )
        corrected, bias = self._compiled[key](
            self._sharded(dpad), self._sharded(mpad)
        )
        corrected = corrected[: shape[0], : shape[1], : shape[2]]
        if return_bias:
            return corrected, bias[: shape[0], : shape[1], : shape[2]]
        return corrected
