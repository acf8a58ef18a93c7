"""Mesh-sharded inference.

SURVEY.md §2.2's TPU answer to the reference's single-GPU inference, in
the same two modes as the single-chip predictor:

- **Full-volume** (default when the padded volume fits HBM): the mirror
  TTA flips are split across the 'dp' mesh axis — each device runs
  whole-volume forwards for its flip subset on the replicated volume and
  the softmax accumulators merge with one psum over ICI. 8-flip TTA on 8
  chips is one forward's latency.
- **Patch sweep** (above FULLVOL_MAX_VOXELS or mode='patch'): the
  patch-position list is split across the mesh (volume and weights
  replicated), every device sweeps its shard of patches with the shared
  accumulate_patches scan, and the partial Gaussian accumulators are
  psum-merged.

Near-linear scaling in the number of chips either way — useful when a
single volume must return in minimum latency (the driver's dryrun
exercises both paths on a virtual mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from deepwmh_tpu.unet.infer import (
    ALL_FLIPS,
    NO_FLIPS,
    CaseProgramMixin,
    accumulate_patches,
    flip_forward,
    fullvol_shape,
    gaussian_importance_map,
    use_fullvol,
)
from deepwmh_tpu.unet.preprocess import pad_to, padded_shape


def build_fullvol_tta_sharded(apply_fn, num_classes, flips, mesh):
    """Build the flip-sharded whole-volume TTA program: each device runs
    batch-1 forwards for its flip subset (padding slots skip the forward
    entirely via lax.cond), one psum merges the softmax sums. Returns
    (fn(params, volume), tab, wts) — cache fn per shape to avoid
    recompiling; volume must be padded to the network stride; the result
    is f32 [D,H,W,C]."""
    axis = mesh.axis_names[0]
    n = int(mesh.shape[axis])
    C = num_classes
    nf = len(flips)
    fpd = -(-nf // n)  # flips per device (block assignment, padded)
    total = n * fpd
    tab = np.zeros((total, 3), np.bool_)
    wts = np.zeros((total,), np.float32)
    for i, f in enumerate(flips):
        tab[i] = f
        wts[i] = 1.0

    def shard_fn(params, vol, tab_l, w_l):
        shape = vol.shape + (C,)

        def body(i, acc):
            def fwd(_):
                # the same per-flip forward as the single-chip fullvol_tta
                return flip_forward(params, vol, apply_fn, C, tab_l[i])

            def skip(_):
                z = jnp.zeros(shape, jnp.float32)
                return jax.lax.pcast(z, (axis,), to="varying")

            return acc + jax.lax.cond(w_l[i] > 0, fwd, skip, None)

        acc = jnp.zeros(shape, jnp.float32)
        acc = jax.lax.pcast(acc, (axis,), to="varying")
        acc = jax.lax.fori_loop(0, fpd, body, acc)
        return jax.lax.psum(acc, axis) / nf

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=P(),
        )
    )
    return fn, jnp.asarray(tab), jnp.asarray(wts)


def _positions_for_mesh(image_size, patch_size, n_devices, step_fraction=0.5):
    from deepwmh_tpu.unet.infer import patch_positions

    return patch_positions(
        image_size, patch_size, step_fraction, bucket_multiple=n_devices
    )


class ShardedSlidingWindowPredictor(CaseProgramMixin):
    """Drop-in sharded variant of SlidingWindowPredictor (same `mode`
    semantics: 'auto' runs flip-sharded whole-volume inference when the
    padded volume fits HBM, patch-sharded sweeps otherwise). predict_case/
    predict_case_full come from CaseProgramMixin — only the sweep differs.
    """

    def __init__(self, model, params, plan, mesh, tta: bool = False, step_fraction=0.5,
                 mode: str = "auto"):
        if int(plan.num_classes) != 2:
            raise ValueError(
                "case inference is binary (background+lesion); plan has "
                "num_classes=%d" % plan.num_classes)
        self.model = model
        self.params = params
        self.plan = plan
        self.mesh = mesh
        self.tta = tta
        self.step_fraction = step_fraction
        self.mode = mode
        self.patch_size = tuple(int(p) for p in plan.patch_size)
        self.gauss = gaussian_importance_map(self.patch_size)
        from deepwmh_tpu.utils.misc import BoundedCache

        self._apply = lambda p, x: model.apply({"params": p}, x)
        self._compiled = BoundedCache(maxsize=8)   # predict_volume sweeps
        self._case_cache = BoundedCache(maxsize=8)  # fused case programs

    def _use_fullvol(self, res_shape) -> bool:
        return use_fullvol(self.mode, res_shape, self.plan)

    def predict_case_full_batch(self, datas, spacing, apply_n4: bool = False):
        """Data-parallel burst: predict_case_full for a batch of
        same-geometry volumes with ONE CASE PER DEVICE — the single-chip
        fused case program vmapped over the batch, batch axis sharded
        across the mesh. Returns the same 5-tuple with a leading batch
        axis (original batch size; mesh padding is dropped).

        This is where serving burst batching actually pays. Measured on
        one chip (docs/PERF.md, serving burst study), vmapping whole-case
        programs WITHIN a device is a 0.5-0.75x throughput LOSS at every
        realistic shape, with or without TTA: the fused case program was
        never dispatch-bound (it is already one program), and vmap
        de-optimizes its loop/scan stages (N4's fori_loops, the
        connected-component scans). Across a mesh the batch axis maps to
        devices instead — each device runs the UNBATCHED program schedule
        on its own case, the same routing rule as pipeline/analysis.py's
        batched NLL. B is padded up to a multiple of the mesh size by
        replicating the last volume."""
        from jax.sharding import NamedSharding

        from deepwmh_tpu.unet.infer import _build_full_case_fn

        datas = jnp.asarray(datas, jnp.float32)
        assert datas.ndim == 4, "expect [B,D,H,W]"
        B = int(datas.shape[0])
        n = int(self.mesh.devices.size)
        Bp = -(-B // n) * n
        if Bp != B:
            pad = jnp.broadcast_to(datas[-1:], (Bp - B,) + datas.shape[1:])
            datas = jnp.concatenate([datas, pad], axis=0)
        spacing_r = tuple(round(float(s), 4) for s in spacing)
        key = ("dpburst", datas.shape, spacing_r, apply_n4)
        if key not in self._case_cache:
            from deepwmh_tpu.unet.infer import SlidingWindowPredictor

            inner = SlidingWindowPredictor(
                self.model, self.params, self.plan, tta=self.tta,
                step_fraction=self.step_fraction, mode=self.mode,
            )
            case_fn = inner._build_case_fn(datas.shape[1:], spacing_r, False)
            full_fn = _build_full_case_fn(case_fn, spacing_r, apply_n4)
            axis = self.mesh.axis_names[0]
            self._case_cache[key] = jax.jit(
                jax.vmap(full_fn, in_axes=(None, 0)),
                in_shardings=(
                    NamedSharding(self.mesh, P()),
                    NamedSharding(self.mesh, P(axis)),
                ),
                out_shardings=NamedSharding(self.mesh, P(axis)),
            )
        outs = self._case_cache[key](self.params, datas)
        return tuple(o[:B] for o in outs)

    def _build(self):
        # shapes are carried by the jitted call's arguments; the cache key
        # in predict_volume is what distinguishes compilations
        flips = ALL_FLIPS if self.tta else NO_FLIPS
        C = int(self.plan.num_classes)
        patch_size = self.patch_size
        apply_fn = self._apply
        gauss = self.gauss
        axis = self.mesh.axis_names[0]

        def shard_fn(params, vol, pos, pos_w):
            acc, wt = accumulate_patches(
                params, vol, pos, pos_w, gauss, apply_fn, patch_size, C, flips,
                varying_axis=axis,
            )
            acc = jax.lax.psum(acc, axis)
            wt = jax.lax.psum(wt, axis)
            return acc / jnp.maximum(wt, 1e-8)[..., None]

        fn = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=P(),
        )
        return jax.jit(fn)

    def predict_volume(self, volume):
        vol = jnp.asarray(volume, jnp.float32)
        orig = vol.shape
        flips = ALL_FLIPS if self.tta else NO_FLIPS
        if self._use_fullvol(orig):
            target = fullvol_shape(orig, self.plan)
            vol = pad_to(vol, target)
            key = ("fullvol", target, len(flips))
            if key not in self._compiled:
                self._compiled[key] = build_fullvol_tta_sharded(
                    self._apply, int(self.plan.num_classes), flips, self.mesh
                )
            fn, tab, wts = self._compiled[key]
            probs = fn(self.params, vol, tab, wts)
            return probs[: orig[0], : orig[1], : orig[2]]
        target = padded_shape(orig, self.patch_size)
        vol = pad_to(vol, target)
        n_dev = self.mesh.devices.size
        pos, pos_w = _positions_for_mesh(
            target, self.patch_size, n_dev, self.step_fraction
        )
        key = (target, int(pos.shape[0]))
        if key not in self._compiled:
            self._compiled[key] = self._build()
        probs = self._compiled[key](self.params, vol, pos, pos_w)
        return probs[: orig[0], : orig[1], : orig[2]]

    def _make_run_sweep(self, res_shape):
        """Mesh sweep builder for CaseProgramMixin: flip-sharded whole-
        volume TTA when the resampled volume fits HBM, patch-sharded
        Gaussian sweeps otherwise. The rest of the case program (N4,
        resample, threshold, postprocessing) runs replicated — it is a few
        percent of the program; sharding it would buy nothing and cost
        collectives."""
        plan = self.plan
        patch_size = self.patch_size
        flips = ALL_FLIPS if self.tta else NO_FLIPS
        C = int(plan.num_classes)
        if self._use_fullvol(res_shape):
            target = fullvol_shape(res_shape, plan)
            sweep, tab, wts = build_fullvol_tta_sharded(
                self._apply, C, flips, self.mesh
            )

            def run_sweep(params, vol):
                return sweep(params, vol, tab, wts)

        else:
            target = padded_shape(res_shape, patch_size)
            pos, pos_w = _positions_for_mesh(
                target, patch_size, self.mesh.devices.size, self.step_fraction
            )
            sharded = self._build()

            def run_sweep(params, vol):
                return sharded(params, vol, pos, pos_w)

        return run_sweep, target
