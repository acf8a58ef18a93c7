"""Mesh-sharded sliding-window inference.

SURVEY.md §2.2's TPU answer to the reference's single-GPU inference: the
patch-position list is split across the 'dp' mesh axis (volume and weights
replicated), every device sweeps its shard of patches with the shared
accumulate_patches scan, and the partial Gaussian accumulators are merged
with one psum over ICI. Near-linear scaling in the number of chips for the
sliding-window sweep — useful when a single volume must return in minimum
latency (the driver's dryrun exercises this path on a virtual mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deepwmh_tpu.unet.infer import (
    ALL_FLIPS,
    NO_FLIPS,
    accumulate_patches,
    gaussian_importance_map,
)
from deepwmh_tpu.unet.preprocess import pad_to, padded_shape


def _positions_for_mesh(image_size, patch_size, n_devices, step_fraction=0.5):
    from deepwmh_tpu.unet.infer import patch_positions

    return patch_positions(
        image_size, patch_size, step_fraction, bucket_multiple=n_devices
    )


class ShardedSlidingWindowPredictor:
    """Drop-in sharded variant of SlidingWindowPredictor."""

    def __init__(self, model, params, plan, mesh, tta: bool = False, step_fraction=0.5):
        self.model = model
        self.params = params
        self.plan = plan
        self.mesh = mesh
        self.tta = tta
        self.step_fraction = step_fraction
        self.patch_size = tuple(int(p) for p in plan.patch_size)
        self.gauss = gaussian_importance_map(self.patch_size)
        from deepwmh_tpu.utils.misc import BoundedCache

        self._apply = lambda p, x: model.apply({"params": p}, x)
        self._compiled = BoundedCache(maxsize=8)

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
